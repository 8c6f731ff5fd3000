"""Factorized-prior entropy bottleneck (the learned prior over z).

A per-channel monotone CDF parameterized as a chain of 1-wide MLP "filters"
(softplus-positive matrices, tanh gating), with auxiliary `quantiles`
parameters that track the distribution's medians/tails. The aux optimizer
trains only the quantiles (reference behavior: the `.quantiles` parameter
group at /root/reference/train.py:120-151; model usage at
/root/reference/models/dcae.py:613,630-633).

The filter chain is a stack of tiny batched matmuls over channels — it maps
to a single fused XLA op on TPU. Integer coding tables are built on host by
dcae_tpu.entropy.tables from this module's parameters.
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dcae_tpu.entropy import ops


class EntropyBottleneck(nn.Module):
    channels: int
    filters: Tuple[int, ...] = (3, 3, 3, 3)
    init_scale: float = 10.0
    tail_mass: float = 1e-9
    likelihood_bound: float = 1e-9

    def setup(self):
        dims = (1,) + tuple(self.filters) + (1,)
        scale = self.init_scale ** (1.0 / (len(self.filters) + 1))
        C = self.channels

        matrices, biases, factors = [], [], []
        for i in range(len(self.filters) + 1):
            init_val = math.log(math.expm1(1.0 / scale / dims[i + 1]))
            matrices.append(self.param(
                f"matrix_{i}",
                lambda key, shape, v=init_val: jnp.full(shape, v, jnp.float32),
                (C, dims[i + 1], dims[i])))
            biases.append(self.param(
                f"bias_{i}",
                lambda key, shape: jax.random.uniform(
                    key, shape, jnp.float32, -0.5, 0.5),
                (C, dims[i + 1], 1)))
            if i < len(self.filters):
                factors.append(self.param(
                    f"factor_{i}", nn.initializers.zeros,
                    (C, dims[i + 1], 1)))
        self._matrices = matrices
        self._biases = biases
        self._factors = factors

        def quantiles_init(key, shape):
            init = jnp.array([-self.init_scale, 0.0, self.init_scale],
                             jnp.float32)
            return jnp.tile(init.reshape(1, 1, 3), (shape[0], 1, 1))

        self.quantiles = self.param("quantiles", quantiles_init, (C, 1, 3))

    def _logits_cumulative(self, inputs: jax.Array,
                           stop_gradient: bool) -> jax.Array:
        """inputs: (C, 1, N) -> logits of the cumulative at those points."""
        logits = inputs
        for i in range(len(self.filters) + 1):
            matrix = self._matrices[i]
            bias = self._biases[i]
            if stop_gradient:
                matrix = jax.lax.stop_gradient(matrix)
                bias = jax.lax.stop_gradient(bias)
            logits = jnp.einsum(
                "cij,cjn->cin", jax.nn.softplus(matrix), logits) + bias
            if i < len(self.filters):
                factor = self._factors[i]
                if stop_gradient:
                    factor = jax.lax.stop_gradient(factor)
                logits = logits + jnp.tanh(factor) * jnp.tanh(logits)
        return logits

    def medians(self) -> jax.Array:
        """Per-channel median of the learned prior, shape (C,)."""
        return self.quantiles[:, 0, 1]

    def _likelihood(self, values_c1n: jax.Array) -> jax.Array:
        half = 0.5
        lower = self._logits_cumulative(values_c1n - half, stop_gradient=False)
        upper = self._logits_cumulative(values_c1n + half, stop_gradient=False)
        sign = -jax.lax.stop_gradient(jnp.sign(lower + upper))
        return jnp.abs(
            jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))

    def __call__(self, z: jax.Array, *, training: bool = False,
                 rng: jax.Array | None = None):
        """z: NHWC. Returns (values, likelihoods), both NHWC.

        Training uses additive-noise quantization for the likelihood; eval
        rounds around the channel medians.
        """
        B, H, W, C = z.shape
        assert C == self.channels, (C, self.channels)
        medians = self.medians().reshape(1, 1, 1, C)
        if training:
            if rng is None:
                rng = self.make_rng("noise")
            values = ops.noise_quantize(z, rng)
        else:
            values = ops.dequantize(
                ops.quantize_symbols(z, medians), medians)

        # channel-major layout for the per-channel filter chain
        v = jnp.transpose(values, (3, 0, 1, 2)).reshape(C, 1, B * H * W)
        like = self._likelihood(v)
        if self.likelihood_bound > 0:
            like = ops.lower_bound(like, self.likelihood_bound)
        like = jnp.transpose(like.reshape(C, B, H, W), (1, 2, 3, 0))
        return values, like

    def aux_loss(self) -> jax.Array:
        """Quantile-tracking loss; gradients flow only to `quantiles`."""
        logits = self._logits_cumulative(self.quantiles, stop_gradient=True)
        t = math.log(2.0 / self.tail_mass - 1.0)
        target = jnp.array([-t, 0.0, t], jnp.float32).reshape(1, 1, 3)
        return jnp.abs(logits - target).sum()
