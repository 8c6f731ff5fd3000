"""Image-quality metrics (PSNR, MS-SSIM) and rate accounting in JAX.

Measurement protocol parity (BASELINE.md): PSNR = -10 log10(MSE);
MS-SSIM reported as -10 log10(1 - msssim); bpp from likelihoods is
sum(-log2 p)/num_pixels; real bpp is 8*len(strings)/num_pixels of the
unpadded image.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def psnr(a: jax.Array, b: jax.Array, data_range: float = 1.0) -> jax.Array:
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)
    return -10.0 * jnp.log10(mse / (data_range ** 2))


def msssim_db(value) -> float:
    """-10 log10(1 - ms_ssim), the reference's reporting transform."""
    return -10.0 * math.log10(max(1.0 - float(value), 1e-12))


def likelihood_bpp(likelihoods, num_pixels: int) -> jax.Array:
    """sum over all likelihood tensors of -log2 p / num_pixels."""
    total = sum(jnp.sum(jnp.log(l)) for l in jax.tree.leaves(likelihoods))
    return total / (-math.log(2) * num_pixels)


def real_bpp(strings, num_pixels: int) -> float:
    return sum(len(s) * 8 for grp in strings for s in grp) / num_pixels


# ---------------------------------------------------------------- MS-SSIM --

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _fspecial_gauss_1d(size: int, sigma: float) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _gaussian_blur(x: jax.Array, win: jax.Array) -> jax.Array:
    """Separable valid-padding Gaussian filter, NHWC, per channel."""
    C = x.shape[-1]
    size = win.shape[0]
    k_h = jnp.tile(win.reshape(size, 1, 1, 1), (1, 1, 1, C))
    k_w = jnp.tile(win.reshape(1, size, 1, 1), (1, 1, 1, C))
    dn = ("NHWC", "HWIO", "NHWC")
    x = jax.lax.conv_general_dilated(x, k_h, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     feature_group_count=C)
    x = jax.lax.conv_general_dilated(x, k_w, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     feature_group_count=C)
    return x


def _ssim_cs(x: jax.Array, y: jax.Array, win: jax.Array,
             data_range: float = 1.0):
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_x = _gaussian_blur(x, win)
    mu_y = _gaussian_blur(y, win)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_xx = _gaussian_blur(x * x, win) - mu_xx
    sigma_yy = _gaussian_blur(y * y, win) - mu_yy
    sigma_xy = _gaussian_blur(x * y, win) - mu_xy

    cs = (2 * sigma_xy + c2) / (sigma_xx + sigma_yy + c2)
    ssim = ((2 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs
    return ssim.mean(axis=(1, 2, 3)), cs.mean(axis=(1, 2, 3))


def ssim(x: jax.Array, y: jax.Array, data_range: float = 1.0,
         win_size: int = 11, win_sigma: float = 1.5) -> jax.Array:
    win = jnp.asarray(_fspecial_gauss_1d(win_size, win_sigma))
    s, _ = _ssim_cs(x, y, win, data_range)
    return s.mean()


def ms_ssim(x: jax.Array, y: jax.Array, data_range: float = 1.0,
            win_size: int = 11, win_sigma: float = 1.5,
            weights=_MSSSIM_WEIGHTS) -> jax.Array:
    """Multi-scale SSIM (5 scales, standard weights), NHWC in [0, range].

    Requires min(H, W) > (win_size-1) * 2**(levels-1), i.e. > 160 for the
    defaults — same constraint as the reference's metric library.
    """
    win = jnp.asarray(_fspecial_gauss_1d(win_size, win_sigma))
    weights = jnp.asarray(weights, jnp.float32)
    levels = weights.shape[0]

    mcs = []
    s = None
    for i in range(levels):
        s, cs = _ssim_cs(x, y, win, data_range)
        if i < levels - 1:
            mcs.append(jnp.maximum(cs, 0.0))
            pad_h = x.shape[1] % 2
            pad_w = x.shape[2] % 2
            x = x[:, : x.shape[1] - pad_h, : x.shape[2] - pad_w, :]
            y = y[:, : y.shape[1] - pad_h, : y.shape[2] - pad_w, :]
            x = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID") / 4.0
            y = jax.lax.reduce_window(
                y, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID") / 4.0

    s = jnp.maximum(s, 0.0)
    stack = jnp.stack(mcs + [s])  # (levels, B)
    return jnp.prod(stack ** weights[:, None], axis=0).mean()


class AverageMeter:
    """Running average (reference train.py:95-108 uses one everywhere)."""

    def __init__(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)
