"""The jitted RD training step."""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from dcae_tpu.models.dcae import DCAE
from dcae_tpu.train.losses import rate_distortion_loss
from dcae_tpu.train.state import TrainState


def make_train_step(model: DCAE, tx: optax.GradientTransformation,
                    lmbda: float, metric: str = "mse",
                    precision_reg: float = 0.0,
                    precision_noise: float = 1e-6
                    ) -> Callable[[TrainState, jax.Array],
                                  Tuple[TrainState, Dict]]:
    """One fused RD + aux step (see train.state module docstring).

    precision_reg > 0 adds the reference's cross-device precision penalty
    (ref train_5.py:3320-3337): two extra decoder passes on the quantized
    latent, one perturbed by N(0, precision_noise^2) "transfer noise"; the
    MSE between their outputs, scaled by precision_reg (reference weight
    0.001), penalizes decoder sensitivity to tiny latent drift."""

    def train_step(state: TrainState, batch: jax.Array):
        rng, noise_rng, drift_rng, prec_rng = jax.random.split(state.rng, 4)

        def loss_fn(params):
            out = model.apply(
                {"params": params}, batch, training=True,
                rngs={"noise": noise_rng, "drift": drift_rng})
            rd = rate_distortion_loss(out, batch, lmbda, metric)
            aux = model.apply({"params": params}, method=DCAE.aux_loss)
            loss = rd["loss"] + aux
            if precision_reg > 0:
                y_hat = out["para"]["y_hat"]
                z_hat = out["para"]["z_hat"]
                noise = jax.random.normal(
                    prec_rng, y_hat.shape, y_hat.dtype) * precision_noise
                x_a = model.apply({"params": params}, y_hat, z_hat,
                                  method=DCAE.decode_from_quantized)
                x_b = model.apply({"params": params}, y_hat + noise, z_hat,
                                  method=DCAE.decode_from_quantized)
                rd["precision_loss"] = jnp.mean((x_a - x_b) ** 2)
                loss = loss + precision_reg * rd["precision_loss"]
            return loss, (rd, aux)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (rd, aux)), grads = grad_fn(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, rng=rng)
        metrics = {k: v for k, v in rd.items()}
        metrics["aux_loss"] = aux
        return new_state, metrics

    return train_step


def make_eval_step(model: DCAE, lmbda: float, metric: str = "mse"):
    def eval_step(params, batch: jax.Array) -> Dict:
        out = model.apply({"params": params}, batch, training=False)
        rd = rate_distortion_loss(out, batch, lmbda, metric)
        mse = jnp.mean((out["x_hat"] - batch) ** 2)
        rd["psnr"] = -10.0 * jnp.log10(mse)
        return rd

    return eval_step
