"""Gaussian conditional entropy model (scale-indexed).

The conditional p(y|mu,sigma) used for the latent y: likelihood of the
quantized value under a unit-width integration of N(mu, sigma^2), with sigma
lower-bounded at 0.11 and a 64-entry log-spaced scale table for CDF indexing
(behavioral contract from /root/reference/models/dcae.py:28-30,54-55,839-857
and the build_indexes/quantize call sites at :718-743,891-896).

Pure functions — there are no learned parameters; the integer coding tables
are built on host by dcae_tpu.entropy.tables.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from dcae_tpu.entropy import ops

SCALES_MIN = 0.11
SCALES_MAX = 256.0
SCALES_LEVELS = 64


def get_scale_table(minimum: float = SCALES_MIN, maximum: float = SCALES_MAX,
                    levels: int = SCALES_LEVELS) -> np.ndarray:
    """64 log-spaced scales in [0.11, 256]."""
    return np.exp(np.linspace(math.log(minimum), math.log(maximum), levels,
                              dtype=np.float64)).astype(np.float32)


def likelihood(inputs: jax.Array, scales: jax.Array,
               means: jax.Array | None = None,
               scale_bound: float = SCALES_MIN,
               likelihood_bound: float = 1e-9) -> jax.Array:
    """P(round(y) == v) under N(means, scales^2) with unit-bin integration."""
    values = inputs if means is None else inputs - means
    scales = ops.lower_bound(scales, scale_bound)
    values = jnp.abs(values)
    upper = ops.standardized_cumulative((0.5 - values) / scales)
    lower = ops.standardized_cumulative((-0.5 - values) / scales)
    like = upper - lower
    if likelihood_bound > 0:
        like = ops.lower_bound(like, likelihood_bound)
    return like


def apply(inputs: jax.Array, scales: jax.Array,
          means: jax.Array | None = None, *, training: bool = False,
          rng: jax.Array | None = None,
          scale_bound: float = SCALES_MIN):
    """(values, likelihoods) — noise quantization during training, round
    (dequantize mode) otherwise; matches the conditional's forward."""
    if training:
        if rng is None:
            raise ValueError("training=True requires an rng")
        values = ops.noise_quantize(inputs, rng)
    else:
        values = ops.dequantize(ops.quantize_symbols(inputs, means), means)
    return values, likelihood(values, scales, means, scale_bound)


def build_indexes(scales: jax.Array, scale_table: jax.Array,
                  scale_bound: float = SCALES_MIN) -> jax.Array:
    """Index of the smallest table scale >= each sigma.

    Equivalent to the reference's subtraction loop over the table
    (count of table entries strictly below sigma), expressed as a single
    vectorized searchsorted for the TPU/host boundary.
    """
    scales = jnp.maximum(scales, scale_bound)
    table = jnp.asarray(scale_table)
    # count of table entries strictly below sigma == searchsorted(side
    # "left"), but as a 64-way broadcast compare+sum: searchsorted lowers
    # to a gather-chain binary search on TPU that measured 55% of the whole
    # encode program's device time (docs/PERF.md round 2); this form is
    # pure VPU compares and fuses with the producing conv.
    lt = table[:-1][(None,) * scales.ndim] < scales[..., None]
    return jnp.sum(lt.astype(jnp.int32), axis=-1)
