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
    ref train_fine_tune.py:552-570)."""
    main = optax.chain(
        optax.clip_by_global_norm(clip_max_norm) if clip_max_norm > 0
        else optax.identity(),
        optax.adam(learning_rate),
    )
    aux = optax.adam(aux_learning_rate)

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
