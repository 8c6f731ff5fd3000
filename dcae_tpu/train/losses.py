"""Training losses.

Rate-distortion objective parity with the reference
(/root/reference/train.py:68-93): lambda * 255^2 * MSE + bpp for MSE models,
lambda * (1 - MS-SSIM) + bpp for MS-SSIM models; plus the transforms-only
reconstruction losses of train_g_a_g_s.py:48-80 (mse/l1/ms-ssim/mixed).
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

from dcae_tpu.utils.metrics import ms_ssim


def rate_distortion_loss(output: Dict, target: jax.Array, lmbda: float,
                         metric: str = "mse") -> Dict[str, jax.Array]:
    """output: the model forward dict; target: NHWC image in [0,1]."""
    B, H, W, _ = target.shape
    num_pixels = B * H * W
    bpp = sum(jnp.sum(jnp.log(l))
              for l in jax.tree.leaves(output["likelihoods"]))
    bpp = bpp / (-math.log(2) * num_pixels)

    x_hat = output["x_hat"]
    if metric == "mse":
        mse = jnp.mean((x_hat - target) ** 2)
        distortion = 255 ** 2 * mse
        out = {"mse_loss": mse}
    elif metric == "ms-ssim":
        ms = ms_ssim(jnp.clip(x_hat, 0, 1), target, data_range=1.0)
        distortion = 1.0 - ms
        out = {"ms_ssim_loss": distortion}
    elif metric == "l1":
        l1 = jnp.mean(jnp.abs(x_hat - target))
        distortion = 255 * l1
        out = {"l1_loss": l1}
    else:
        raise ValueError(f"unknown metric {metric!r}")

    out["bpp_loss"] = bpp
    out["loss"] = lmbda * distortion + bpp
    return out


def reconstruction_loss(x_hat: jax.Array, target: jax.Array,
                        loss_type: str = "mse") -> jax.Array:
    """Transforms-only pretraining loss (SimpleAutoencoder), incl. the
    reference's 'mixed' = 0.84*(1-msssim) + 0.16*mse."""
    if loss_type == "mse":
        return jnp.mean((x_hat - target) ** 2)
    if loss_type == "l1":
        return jnp.mean(jnp.abs(x_hat - target))
    if loss_type == "ms-ssim":
        return 1.0 - ms_ssim(jnp.clip(x_hat, 0, 1), target)
    if loss_type == "mixed":
        ms = 1.0 - ms_ssim(jnp.clip(x_hat, 0, 1), target)
        return 0.84 * ms + 0.16 * jnp.mean((x_hat - target) ** 2)
    raise ValueError(f"unknown loss type {loss_type!r}")
