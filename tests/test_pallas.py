"""Fused Pallas window-attention: numerics vs the einsum path (interpret
mode on the CPU backend)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcae_tpu.ops.blocks import WMSA
from dcae_tpu.ops.pallas.wmsa_v3 import fused_wmsa_v3


@pytest.mark.parametrize("shifted", [False, True])
def test_fused_wmsa_v3_matches_einsum(shifted, rng):
    """v3 (sublane head packing, fully VMEM-resident) vs the einsum path."""
    window, head_dim, C = 4, 8, 24  # 3 heads
    heads = C // head_dim
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 12, C)).astype(np.float32))
    m = WMSA(head_dim=head_dim, window_size=window, shifted=shifted)
    variables = m.init(jax.random.PRNGKey(0), x)
    want = np.asarray(m.apply(variables, x))
    p = variables["params"]
    got = fused_wmsa_v3(
        x, p["qkv_kernel"], p["qkv_bias"], p["proj_kernel"], p["proj_bias"],
        p["relative_position"], window=window, heads=heads, shifted=shifted,
        tile_w=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_fused_wmsa_v3_tile_padding(rng):
    """Window count not divisible by the tile must still be exact."""
    window, head_dim, C = 4, 8, 16
    x = jnp.asarray(rng.normal(0, 1, (1, 4, 12, C)).astype(np.float32))
    m = WMSA(head_dim=head_dim, window_size=window, shifted=False)
    variables = m.init(jax.random.PRNGKey(1), x)
    want = np.asarray(m.apply(variables, x))
    p = variables["params"]
    got = fused_wmsa_v3(
        x, p["qkv_kernel"], p["qkv_bias"], p["proj_kernel"], p["proj_bias"],
        p["relative_position"], window=window, heads=C // head_dim,
        shifted=False, tile_w=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


@pytest.mark.parametrize("shifted", [False, True])
def test_fused_wmsa_v3_grad_matches_einsum(shifted, rng):
    """The custom VJP (training path) must match einsum gradients."""
    from dcae_tpu.ops.pallas.wmsa_v3 import wmsa_v3_trainable

    window, head_dim, C = 4, 8, 16
    heads = C // head_dim
    x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, C)).astype(np.float32))
    m = WMSA(head_dim=head_dim, window_size=window, shifted=shifted)
    variables = m.init(jax.random.PRNGKey(0), x)
    p = variables["params"]
    args = (x, p["qkv_kernel"], p["qkv_bias"], p["proj_kernel"],
            p["proj_bias"], p["relative_position"])

    def loss_ref(*a):
        return jnp.sum(jnp.sin(m.apply({"params": {
            "qkv_kernel": a[1], "qkv_bias": a[2], "proj_kernel": a[3],
            "proj_bias": a[4], "relative_position": a[5]}}, a[0])))

    def loss_fused(*a):
        return jnp.sum(jnp.sin(wmsa_v3_trainable(
            *a, window=window, heads=heads, shifted=shifted,
            interpret=True)))

    want = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    got = jax.grad(loss_fused, argnums=tuple(range(6)))(*args)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize("shifted", [False, True])
def test_fused_wmsa_v3_bf16_io(shifted, rng):
    """bf16 callers get bf16 MXU operands (f32 accumulation/softmax): the
    output must stay within bf16 matmul error of the f32 einsum path and
    come back in bf16. Runs interpret-only in CI; hardware lowering of
    the bf16 ops (pltpu.repeat on bf16, bf16 concatenate, tile-wide
    slicing) is covered by tools/bench_wmsa.py --dtype bf16 on TPU."""
    window, head_dim, C = 4, 8, 24
    heads = C // head_dim
    x32 = jnp.asarray(rng.normal(0, 1, (2, 8, 12, C)).astype(np.float32))
    m = WMSA(head_dim=head_dim, window_size=window, shifted=shifted)
    variables = m.init(jax.random.PRNGKey(0), x32)
    want = np.asarray(m.apply(variables, x32))
    p = variables["params"]
    got = fused_wmsa_v3(
        x32.astype(jnp.bfloat16), p["qkv_kernel"], p["qkv_bias"],
        p["proj_kernel"], p["proj_bias"], p["relative_position"],
        window=window, heads=heads, shifted=shifted, tile_w=4,
        interpret=True)
    assert got.dtype == jnp.bfloat16
    scale = float(np.abs(want).max())
    err = float(np.abs(np.asarray(got, np.float32) - want).max())
    assert err <= 0.08 * scale, (err, scale)


@pytest.mark.parametrize("shifted", [False, True])
def test_fused_wmsa_block_v4_matches_module(shifted, rng):
    """v4 (LN + windowing + WMSA + proj + res-scale residual in one
    kernel) vs the unfused module composition — the attention half-block
    of ResScaleConvolutionGateBlock (round 5)."""
    from dcae_tpu.ops.blocks import LayerNorm, Scale
    from dcae_tpu.ops.pallas.wmsa_v4 import fused_wmsa_block_v4

    window, head_dim, C = 8, 8, 32  # 4 heads, window 8 (the v4 gate)
    heads = C // head_dim
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 24, C)).astype(np.float32))

    import flax.linen as nn

    class Half(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = LayerNorm(name="ln1")(x)
            h = WMSA(head_dim=head_dim, window_size=window,
                     shifted=shifted, name="msa")(h)
            return Scale(C, name="res_scale_1")(x) + h

    m = Half()
    variables = m.init(jax.random.PRNGKey(1), x)
    want = np.asarray(m.apply(variables, x))
    p = variables["params"]
    got = fused_wmsa_block_v4(
        x, p["ln1"]["ln"]["scale"], p["ln1"]["ln"]["bias"],
        p["res_scale_1"]["scale"], p["msa"]["qkv_kernel"],
        p["msa"]["qkv_bias"], p["msa"]["proj_kernel"],
        p["msa"]["proj_bias"], p["msa"]["relative_position"],
        window=window, heads=heads, shifted=shifted, interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)


@pytest.mark.parametrize("shifted", [False, True])
def test_fused_wmsa_block_v4_grad(shifted, rng):
    """wmsa_block_v4_trainable's einsum-recompute VJP matches autodiff
    through the unfused restatement."""
    from dcae_tpu.ops.pallas.wmsa_v4 import (_block_einsum_f32,
                                             wmsa_block_v4_trainable)

    window, head_dim, C = 8, 8, 16  # 2 heads
    heads = C // head_dim
    x = jnp.asarray(rng.normal(0, 1, (1, 8, 16, C)).astype(np.float32))
    args = [
        x,
        jnp.asarray(rng.normal(1, 0.1, C).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.1, C).astype(np.float32)),
        jnp.asarray(rng.normal(1, 0.1, C).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.05, (C, 3 * C)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.05, 3 * C).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.05, (C, C)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.05, C).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.1, (heads, 2 * window - 1,
                                        2 * window - 1)).astype(np.float32)),
    ]

    def loss_fused(*a):
        return jnp.sum(wmsa_block_v4_trainable(
            *a, window=window, heads=heads, shifted=shifted,
            interpret=True) ** 2)

    def loss_ref(*a):
        return jnp.sum(_block_einsum_f32(
            *a, window=window, heads=heads, shifted=shifted) ** 2)

    g_fused = jax.grad(loss_fused, argnums=tuple(range(9)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(9)))(*args)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-4, atol=2e-5)
