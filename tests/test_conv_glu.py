"""Fused ConvGLU Pallas kernel: numerics + gradients vs the module path
(interpret mode on the CPU backend)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcae_tpu.ops.blocks import ConvolutionalGLU
from dcae_tpu.ops.layers import LayerNorm
from dcae_tpu.ops.pallas.conv_glu import (conv_glu_trainable, fused_conv_glu,
                                          supported)
import flax.linen as nn


class _LnGlu(nn.Module):
    """LN -> ConvGLU, the exact subgraph the kernel replaces."""
    hidden: int

    @nn.compact
    def __call__(self, x):
        h = LayerNorm(name="ln2")(x)
        return ConvolutionalGLU(self.hidden, name="mlp")(h)


def _params(C, H=16, W=12, seed=0):
    m = _LnGlu(hidden=C * 4)
    x = jnp.asarray(np.random.default_rng(seed).normal(
        0, 1, (2, H, W, C)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    p = v["params"]
    lnp, mlp = p["ln2"]["ln"], p["mlp"]
    args = (lnp["scale"], lnp["bias"],
            mlp["fc1"]["dense"]["kernel"], mlp["fc1"]["dense"]["bias"],
            mlp["dwconv"]["dw"]["conv"]["kernel"].reshape(3, 3, -1),
            mlp["dwconv"]["dw"]["conv"]["bias"],
            mlp["fc2"]["dense"]["kernel"], mlp["fc2"]["dense"]["bias"])
    return m, v, x, args


@pytest.mark.parametrize("C,H,W", [(16, 16, 12), (24, 8, 20)])
def test_fused_conv_glu_matches_module(C, H, W):
    m, v, x, args = _params(C, H, W)
    want = np.asarray(m.apply(v, x))
    got = fused_conv_glu(x, *args, apply_ln=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=1e-5)


def test_fused_conv_glu_halo_rows_exact():
    """Row-tile boundaries (the DMA halo logic) must be seamless: compare
    tile_h=2 (many tiles incl. edges) against tile_h=8."""
    m, v, x, args = _params(16, H=16, W=12, seed=3)
    a = fused_conv_glu(x, *args, apply_ln=True, interpret=True, tile_h=2)
    b = fused_conv_glu(x, *args, apply_ln=True, interpret=True, tile_h=8)
    # different tile sizes are different compiled programs — 1-ulp drift is
    # allowed; seam/halo BUGS show up orders of magnitude larger. (Cross-
    # program bit-stability only matters for a FIXED shape, where tile_h is
    # deterministic and the compiled kernel identical.)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_fused_conv_glu_no_ln():
    m, v, x, args = _params(16)
    from dcae_tpu.ops.pallas.conv_glu import _conv_glu_ref_f32

    want = np.asarray(_conv_glu_ref_f32(x, *args, apply_ln=False))
    got = fused_conv_glu(x, *args, apply_ln=False, interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=1e-5)


def test_conv_glu_grad_matches_module():
    m, v, x, args = _params(16)

    def loss_mod(x, p):
        return jnp.sum(jnp.sin(m.apply({"params": p}, x)))

    def loss_fused(x, *a):
        return jnp.sum(jnp.sin(conv_glu_trainable(
            x, *a, apply_ln=True, interpret=True)))

    gx_w, gp_w = jax.grad(loss_mod, argnums=(0, 1))(x, v["params"])
    grads = jax.grad(loss_fused, argnums=tuple(range(9)))(x, *args)

    np.testing.assert_allclose(np.asarray(grads[0]), np.asarray(gx_w),
                               atol=3e-5, rtol=1e-4)
    lnp, mlp = gp_w["ln2"]["ln"], gp_w["mlp"]
    want = (lnp["scale"], lnp["bias"],
            mlp["fc1"]["dense"]["kernel"], mlp["fc1"]["dense"]["bias"],
            mlp["dwconv"]["dw"]["conv"]["kernel"].reshape(3, 3, -1),
            mlp["dwconv"]["dw"]["conv"]["bias"],
            mlp["fc2"]["dense"]["kernel"], mlp["fc2"]["dense"]["bias"])
    for g, w in zip(grads[1:], want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=3e-5, rtol=1e-4)


def test_block_pallas_path_matches_module_path(monkeypatch):
    """ResScaleConvolutionGateBlock pallas=True (both fused kernels forced
    to interpret mode on CPU) must match the module path — this exercises
    the self.variables param-wiring of the fused LN+GLU branch end-to-end,
    including the scan-free init/apply split."""
    import dcae_tpu.ops.pallas.conv_glu as cg
    import dcae_tpu.ops.pallas.wmsa_v3 as wv
    import dcae_tpu.ops.pallas.wmsa_v4 as wv4
    from dcae_tpu.ops.blocks import ResScaleConvolutionGateBlock

    orig_cg = cg.conv_glu_trainable
    orig_wv = wv.wmsa_v3_trainable
    orig_wv4 = wv4.wmsa_block_v4_trainable
    monkeypatch.setattr(
        cg, "conv_glu_trainable",
        lambda *a, **k: orig_cg(*a, **{**k, "interpret": True}))
    monkeypatch.setattr(
        wv, "wmsa_v3_trainable",
        lambda *a, **k: orig_wv(*a, **{**k, "interpret": True}))
    monkeypatch.setattr(
        wv4, "wmsa_block_v4_trainable",
        lambda *a, **k: orig_wv4(*a, **{**k, "interpret": True}))
    monkeypatch.delenv("DCAE_PALLAS", raising=False)

    C, H, W = 128, 16, 16  # C % 128 == 0 so supported() lets pallas run
    x = jnp.asarray(np.random.default_rng(5).normal(
        0, 1, (1, H, W, C)).astype(np.float32))
    blk = ResScaleConvolutionGateBlock(head_dim=8, window_size=8)
    v = blk.init(jax.random.PRNGKey(0), x)
    want = np.asarray(blk.apply(v, x))

    blk2 = ResScaleConvolutionGateBlock(head_dim=8, window_size=8,
                                        pallas=True)
    got = np.asarray(blk2.apply(v, x))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_dca_pallas_path_matches_module_path(monkeypatch):
    """DictionaryCrossAttention pallas=True (fused LN+GLU forced to
    interpret mode on CPU) must match the module path — exercises the
    self.variables param wiring of the DCA mlp fusion."""
    import dcae_tpu.ops.pallas.conv_glu as cg
    from dcae_tpu.ops.dictionary import DictionaryCrossAttention

    orig_cg = cg.conv_glu_trainable
    monkeypatch.setattr(
        cg, "conv_glu_trainable",
        lambda *a, **k: orig_cg(*a, **{**k, "interpret": True}))
    monkeypatch.delenv("DCAE_PALLAS", raising=False)

    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 48)).astype(np.float32))
    dt = jnp.asarray(rng.normal(0, 1, (16, 128)).astype(np.float32))
    kw = dict(output_dim=64, head_num=4, head_dim=32, mlp_rate=4)
    dca = DictionaryCrossAttention(**kw)  # d = 128: supported() admits it
    v = dca.init(jax.random.PRNGKey(0), q, dt)
    want = np.asarray(dca.apply(v, q, dt))

    got = np.asarray(DictionaryCrossAttention(**kw, pallas=True).apply(
        v, q, dt))
    assert not np.allclose(got, 0)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_fused_conv_glu_bf16_io():
    """bf16 callers get bf16 MXU operands (f32 accumulation, LN/conv/gate
    f32): output within bf16 matmul error of the f32 module path, in
    bf16."""
    m, v, x, args = _params(16)
    want = np.asarray(m.apply(v, x))
    got = fused_conv_glu(x.astype(jnp.bfloat16), *args, apply_ln=True,
                         interpret=True)
    assert got.dtype == jnp.bfloat16
    scale = float(np.abs(want).max())
    err = float(np.abs(np.asarray(got, np.float32) - want).max())
    assert err <= 0.08 * scale, (err, scale)
