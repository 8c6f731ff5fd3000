"""Differentiable quantization/bounding primitives for entropy models.

These reproduce the training-time semantics the reference gets from its
entropy-model dependency (straight-through rounding at
/root/reference/models/dcae.py:57-58, likelihood lower-bounding, additive
uniform noise), as pure JAX functions that trace cleanly under jit/grad.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def ste_round(x: jax.Array) -> jax.Array:
    """Straight-through round: forward round(x), identity gradient."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def lower_bound(x: jax.Array, bound: float) -> jax.Array:
    """max(x, bound) whose gradient passes through whenever x >= bound OR the
    gradient pushes x upward (the standard entropy-model LowerBound)."""
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), x


def _lower_bound_bwd(bound, x, g):
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, jnp.zeros_like(g)),)


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


def noise_quantize(x: jax.Array, rng: jax.Array) -> jax.Array:
    """Additive U(-0.5, 0.5) noise — training-time quantization surrogate."""
    return x + jax.random.uniform(rng, x.shape, x.dtype, -0.5, 0.5)


def quantize_symbols(x: jax.Array, means: jax.Array | None = None) -> jax.Array:
    """Integer symbols for entropy coding: round(x - means)."""
    if means is not None:
        x = x - means
    return jnp.round(x).astype(jnp.int32)


def dequantize(symbols: jax.Array, means: jax.Array | None = None,
               dtype=jnp.float32) -> jax.Array:
    out = symbols.astype(dtype)
    if means is not None:
        out = out + means.astype(dtype)
    return out


def standardized_cumulative(x: jax.Array) -> jax.Array:
    """Standard normal CDF via erfc for numerical precision in the tails."""
    const = -(2 ** -0.5)
    return 0.5 * jax.lax.erfc(const * x)
