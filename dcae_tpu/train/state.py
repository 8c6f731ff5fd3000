"""Train state and the dual-optimizer (main + aux/quantiles) setup.

Reference recipe (/root/reference/train.py:120-179,452): Adam over all
non-quantile parameters with global-norm clipping 1.0, a second Adam over the
entropy bottleneck's `quantiles`, and MultiStepLR (x0.1 at --lr_epoch).
Here both parameter groups update from ONE value_and_grad of
(rd_loss + aux_loss): the groups' gradients are provably disjoint (quantiles
receive no RD gradient — the STE median term cancels — and aux stops
gradients to everything else), so one fused backward equals the reference's
two, at half the graph cost.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Sequence, Tuple

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    rng: jax.Array


def param_labels(params) -> Any:
    """'aux' for quantile params, 'main' for everything else."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: "aux"
        if "quantiles" in jax.tree_util.keystr(path) else "main",
        params)


def multistep_lr(base_lr: float, milestones_steps: Sequence[int],
                 gamma: float = 0.1) -> optax.Schedule:
    """MultiStepLR: multiply by gamma at each milestone (in steps)."""
    boundaries = {int(m): gamma for m in milestones_steps}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def make_optimizer(learning_rate, aux_learning_rate: float = 1e-3,
                   clip_max_norm: float = 1.0,
                   trainable_keys: Sequence[str] | None = None
                   ) -> optax.GradientTransformation:
    """Dual optimizer; optionally freeze all top-level subtrees NOT in
    trainable_keys (the reference's encoder-only fine-tuning freezes
    everything but g_a/h_a to close the split-deployment drift gap,
    ref train_fine_tune.py:552-570).

    The aux Adam's learning rate is an inject_hyperparams state leaf so the
    host-side ExponentialTargetScheduler can retune it between epochs
    without rebuilding the optimizer (ref train_5.py:3029-3067)."""
    main = optax.chain(
        optax.clip_by_global_norm(clip_max_norm) if clip_max_norm > 0
        else optax.identity(),
        optax.adam(learning_rate),
    )
    aux = optax.inject_hyperparams(optax.adam)(
        learning_rate=aux_learning_rate)

    if trainable_keys is None:
        return optax.multi_transform({"main": main, "aux": aux},
                                     param_labels)

    keep = set(trainable_keys)

    def labels(params):
        def label(path, _):
            top = path[0].key if hasattr(path[0], "key") else str(path[0])
            if top not in keep:
                return "frozen"
            if "quantiles" in jax.tree_util.keystr(path):
                return "aux"
            return "main"

        return jax.tree_util.tree_map_with_path(label, params)

    return optax.multi_transform(
        {"main": main, "aux": aux, "frozen": optax.set_to_zero()}, labels)


def create_train_state(params, tx: optax.GradientTransformation,
                       rng: jax.Array) -> TrainState:
    import jax.numpy as jnp
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params), rng=rng)


# ---------------------------------------------------------------------------
# adaptive aux-LR scheduling (ref train_5.py ExponentialTargetScheduler,
# /root/reference/train_5.py:3029-3067)
# ---------------------------------------------------------------------------


def _map_inject_lr(state, fn: Callable):
    """Recursively rewrite every InjectHyperparamsState learning_rate leaf
    in an optax state pytree (there is exactly one: the aux Adam's)."""
    # duck-typed: optax renamed InjectHyperparamsState ->
    # InjectStatefulHyperparamsState; both carry a hyperparams dict
    if (isinstance(state, tuple) and hasattr(state, "_fields")
            and "hyperparams" in getattr(state, "_fields", ())):
        hp = dict(state.hyperparams)
        if "learning_rate" in hp:
            hp["learning_rate"] = fn(hp["learning_rate"])
        return state._replace(hyperparams=hp)
    if isinstance(state, tuple) and hasattr(state, "_fields"):  # NamedTuple
        return type(state)(*[_map_inject_lr(v, fn) for v in state])
    if isinstance(state, (list, tuple)):
        return type(state)(_map_inject_lr(v, fn) for v in state)
    if isinstance(state, dict):
        return {k: _map_inject_lr(v, fn) for k, v in state.items()}
    return state


def set_aux_lr(opt_state, lr: float):
    """Return opt_state with the aux Adam's learning rate set to lr."""
    import jax.numpy as jnp
    return _map_inject_lr(opt_state,
                          lambda old: jnp.asarray(lr, jnp.float32))


def get_aux_lr(opt_state) -> float:
    found = []
    _map_inject_lr(opt_state, lambda old: found.append(old) or old)
    return float(found[0]) if found else float("nan")


class ExponentialTargetScheduler:
    """Adaptive aux-LR schedule: drive the quantile (aux) loss along an
    exponential trajectory from start_loss to target_loss over total_epochs,
    boosting the LR when behind schedule. Numeric behavior matches the
    reference (train_5.py:3029-3067): multiplier bands x(50..1000) on the
    main LR, safety cap 0.1. Host-side; apply the result with set_aux_lr."""

    def __init__(self, start_loss: float, target_loss: float = 10.0,
                 total_epochs: int = 100):
        self.start_loss = float(start_loss)
        self.target_loss = float(target_loss)
        self.total_epochs = int(total_epochs)
        self.decay_rate = ((self.target_loss / self.start_loss)
                           ** (1.0 / self.total_epochs))

    def step(self, current_aux_loss: float, main_lr: float,
             epoch: int) -> Tuple[float, float]:
        expected = self.start_loss * (self.decay_rate ** epoch)
        if current_aux_loss > expected * 1.5:
            boost = (current_aux_loss / expected) * 2
            multiplier = min(1000.0, 200.0 * boost)
        elif current_aux_loss > expected:
            boost = current_aux_loss / expected
            multiplier = min(500.0, 100.0 * boost)
        else:
            multiplier = max(50.0, 200.0 * (current_aux_loss
                                            / self.target_loss))
        new_lr = min(main_lr * multiplier, 0.1)
        return new_lr, multiplier
