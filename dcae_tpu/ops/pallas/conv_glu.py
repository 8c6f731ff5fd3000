"""Fused ConvolutionalGLU kernel: [LN ->] fc1 -> dwconv3x3 -> gelu*v -> fc2.

The GLU MLP (ref /root/reference/models/dcae.py:312-328) is the largest
non-attention HBM consumer in the transforms: its fc1 output is 4x the
block width (2h = 4C lanes), and XLA materializes it, the depthwise-conv
output, and the gate product to HBM — ~5 full-tensor passes per block at
stage-1 resolution. This kernel keeps everything after the input tile in
VMEM: one read of x, one write of the output, weights once.

Spatial handling: the 3x3 depthwise conv needs a 1-row halo, which standard
(non-overlapping) BlockSpecs can't express, so x stays in HBM
(memory_space=ANY) and each grid step DMAs its (tile_h + 2)-row window into
a VMEM scratch buffer, zero-filling the halo row at the image border (torch
Conv2d zero padding). The W axis is kept whole per tile; column halos are
static shifts with zero-column fill inside the kernel.

The optional fused LayerNorm (apply_ln) removes one more full read+write of
x (the block always computes GLU(LN x), ref models/dcae.py:351-356).

Training: conv_glu_trainable wraps the kernel in a custom VJP whose
backward differentiates the einsum/conv restatement (rematerialization —
no stored intermediates), the same scheme as wmsa_v3.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gelu_f32(x):
    """Exact-form GELU via an erf approximation Mosaic can lower (no
    erf/erfc primitive on TPU Pallas): Abramowitz-Stegun 7.1.26, max erf
    error 1.5e-7 — below f32 noise for this op's |x| range."""
    a = jnp.abs(x) * 0.7071067811865476
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
             - 0.284496736) * t + 0.254829592) * t
    erf_abs = 1.0 - poly * jnp.exp(-a * a)
    erf = jnp.sign(x) * erf_abs
    return 0.5 * x * (1.0 + erf)


def _kernel(x_hbm, w1g_ref, w1v_ref, b1g_ref, b1v_ref, dwk_ref, dwb_ref,
            w2_ref, b2_ref, lns_ref, lnb_ref, out_ref, xbuf, sem, *,
            tile_h: int, n_tiles: int, W: int, C: int, h: int,
            apply_ln: bool, bf16_math: bool):
    i = pl.program_id(0)
    b = i // n_tiles
    t = i % n_tiles
    r0 = t * tile_h

    # ---- gather the (tile_h + 2)-row window, zero-filled at the borders
    @pl.when(jnp.logical_and(t > 0, t < n_tiles - 1))
    def _():
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(r0 - 1, tile_h + 2)], xbuf, sem)
        cp.start()
        cp.wait()

    @pl.when(t == 0)
    def _():
        xbuf[0] = jnp.zeros((W, C), xbuf.dtype)
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(0, tile_h + 1)],
            xbuf.at[pl.ds(1, tile_h + 1)], sem)
        cp.start()
        cp.wait()

    @pl.when(t == n_tiles - 1)
    def _():
        xbuf[tile_h + 1] = jnp.zeros((W, C), xbuf.dtype)
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(r0 - 1, tile_h + 1)],
            xbuf.at[pl.ds(0, tile_h + 1)], sem)
        cp.start()
        cp.wait()

    n = (tile_h + 2) * W
    x = xbuf[:].astype(jnp.float32).reshape(n, C)
    if apply_ln:
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        x = (x - mu) * jax.lax.rsqrt(var + 1e-5)
        x = x * lns_ref[:] + lnb_ref[:]

    # fc1, pre-split weights (lane slicing at non-128 offsets is what the
    # split avoids). bf16 callers matmul with bf16 MXU operands + f32
    # accumulation (LN, conv, gate, and biases stay f32); f32 callers (the
    # entropy-side DCA GLU) keep full f32 passes.
    op_dtype = jnp.bfloat16 if bf16_math else jnp.float32
    xq = x.astype(op_dtype)
    g = jnp.dot(xq, w1g_ref[:], preferred_element_type=jnp.float32) \
        + b1g_ref[:]
    v = jnp.dot(xq, w1v_ref[:], preferred_element_type=jnp.float32) \
        + b1v_ref[:]
    g3 = g.reshape(tile_h + 2, W, h)
    # the conv's zero padding is zero in g-space: fc1 (and LN) map the
    # zero-filled halo rows to their biases, so mask them back to 0
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_h + 2, 1, 1), 0)
    valid = jnp.logical_and(
        jnp.logical_or(t > 0, row_ids > 0),
        jnp.logical_or(t < n_tiles - 1, row_ids < tile_h + 1))
    g3 = jnp.where(valid, g3, 0.0)

    # depthwise 3x3 (cross-correlation, zero-padded cols), central rows only
    acc = jnp.zeros((tile_h, W, h), jnp.float32)
    zcol = jnp.zeros((tile_h, 1, h), jnp.float32)
    for dy in range(3):
        rows = g3[dy:dy + tile_h]
        for dx in range(3):
            if dx == 0:
                s = jnp.concatenate([zcol, rows[:, :-1]], axis=1)
            elif dx == 2:
                s = jnp.concatenate([rows[:, 1:], zcol], axis=1)
            else:
                s = rows
            acc = acc + s * dwk_ref[dy * 3 + dx].reshape(1, 1, h)
    acc = acc + dwb_ref[:].reshape(1, 1, h)

    gate = _gelu_f32(acc)
    vc = v.reshape(tile_h + 2, W, h)[1:tile_h + 1]
    y = (gate * vc).reshape(tile_h * W, h).astype(op_dtype)
    out = jnp.dot(y, w2_ref[:], preferred_element_type=jnp.float32) \
        + b2_ref[:]
    out_ref[0] = out.reshape(tile_h, W, C).astype(out_ref.dtype)


_VMEM_BUDGET = 12 * 2 ** 20  # leave headroom in the 16 MB VMEM


def _vmem_bytes(t: int, W: int, C: int, h: int) -> int:
    # x tile + g + v (haloed rows) + acc/shift temps + gate/out (central)
    return 4 * ((t + 2) * W * (C + 2 * h) + t * W * (3 * h + C))


def _pick_tile_h(H: int, W: int = 0, C: int = 0, h: int = 0) -> int:
    for t in (8, 4, 2):
        if H % t == 0 and H // t >= 2:
            if W and _vmem_bytes(t, W, C, h) > _VMEM_BUDGET:
                continue
            return t
    return 0


@functools.partial(jax.jit, static_argnames=("apply_ln", "interpret",
                                             "tile_h"))
def fused_conv_glu(x, ln_scale, ln_bias, w1, b1, dwk, dwb, w2, b2, *,
                   apply_ln: bool = True, interpret: bool = False,
                   tile_h: int = 0):
    """x: (B, H, W, C) -> (B, H, W, C) in the input's dtype. bf16 callers
    get bf16 IO AND bf16 MXU matmul operands with f32 accumulation (LN,
    depthwise conv, GELU gate, and biases stay f32) — the arithmetic class
    their einsum path would use under dtype=bfloat16, at the MXU's native
    rate; f32 callers — the entropy-side DCA GLU — keep bit-identical
    full-f32 math.
    w1 (C, 2h) packed [gate | value]; dwk (3, 3, h) (HWC depthwise);
    w2 (h, C). ln_scale/ln_bias (C,) — ignored unless apply_ln."""
    B, H, W, C = x.shape
    h = w1.shape[1] // 2
    io_dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    if not tile_h:
        tile_h = _pick_tile_h(H, W, C, h)
    assert tile_h and H % tile_h == 0 and H // tile_h >= 2, (H, tile_h)
    n_tiles = H // tile_h

    f32 = jnp.float32
    bf16_math = io_dtype == jnp.bfloat16
    w_dtype = jnp.bfloat16 if bf16_math else f32
    w1 = w1.astype(w_dtype)
    w1g, w1v = w1[:, :h], w1[:, h:]
    b1 = b1.astype(f32)
    b1g, b1v = b1[:h].reshape(1, h), b1[h:].reshape(1, h)
    dwk2 = dwk.astype(f32).reshape(9, h)
    dwb = dwb.astype(f32).reshape(1, h)
    w2 = w2.astype(w_dtype)
    b2 = b2.astype(f32).reshape(1, C)
    lns = ln_scale.astype(f32).reshape(1, C)
    lnb = ln_bias.astype(f32).reshape(1, C)

    kernel = functools.partial(
        _kernel, tile_h=tile_h, n_tiles=n_tiles, W=W, C=C, h=h,
        apply_ln=apply_ln, bf16_math=bf16_math)
    const2 = lambda i: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(B * n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),          # x stays in HBM
            pl.BlockSpec((C, h), const2),                  # w1 gate
            pl.BlockSpec((C, h), const2),                  # w1 value
            pl.BlockSpec((1, h), const2),                  # b1 gate
            pl.BlockSpec((1, h), const2),                  # b1 value
            pl.BlockSpec((9, h), const2),                  # dw kernel
            pl.BlockSpec((1, h), const2),                  # dw bias
            pl.BlockSpec((h, C), const2),                  # w2
            pl.BlockSpec((1, C), const2),                  # b2
            pl.BlockSpec((1, C), const2),                  # ln scale
            pl.BlockSpec((1, C), const2),                  # ln bias
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, W, C),
            lambda i: (i // n_tiles, i % n_tiles, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), io_dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2, W, C), io_dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x.astype(io_dtype), w1g, w1v, b1g, b1v, dwk2, dwb, w2, b2, lns,
      lnb)
    return out


def _conv_glu_ref_f32(x, ln_scale, ln_bias, w1, b1, dwk, dwb, w2, b2, *,
                      apply_ln: bool):
    """Pure-f32 XLA restatement of the kernel's math (VJP + numerics
    oracle)."""
    B, H, W, C = x.shape
    h = w1.shape[1] // 2
    x = x.astype(jnp.float32)
    if apply_ln:
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        x = (x - mu) * jax.lax.rsqrt(var + 1e-5)
        x = x * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    a = jnp.dot(x, w1.astype(jnp.float32),
                preferred_element_type=jnp.float32) + b1.astype(jnp.float32)
    g, v = a[..., :h], a[..., h:]
    d = jax.lax.conv_general_dilated(
        g, dwk.astype(jnp.float32).reshape(3, 3, 1, h),
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=h,
        preferred_element_type=jnp.float32) + dwb.astype(jnp.float32)
    y = jax.nn.gelu(d, approximate=False) * v
    return jnp.dot(y, w2.astype(jnp.float32),
                   preferred_element_type=jnp.float32) + b2.astype(
                       jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _conv_glu_vjp(apply_ln, interpret, x, lns, lnb, w1, b1, dwk, dwb, w2,
                  b2):
    return fused_conv_glu(x, lns, lnb, w1, b1, dwk, dwb, w2, b2,
                          apply_ln=apply_ln, interpret=interpret)


def _conv_glu_fwd(apply_ln, interpret, *args):
    return _conv_glu_vjp(apply_ln, interpret, *args), args


def _conv_glu_bwd(apply_ln, interpret, res, g):
    fn = functools.partial(_conv_glu_ref_f32, apply_ln=apply_ln)
    _, vjp = jax.vjp(fn, *res)
    return vjp(g.astype(jnp.float32))


_conv_glu_vjp.defvjp(_conv_glu_fwd, _conv_glu_bwd)


def conv_glu_trainable(x, ln_scale, ln_bias, w1, b1, dwk, dwb, w2, b2, *,
                       apply_ln: bool = True, interpret: bool = False):
    """fused_conv_glu with gradients (fused forward, recompute backward).
    Dtype-preserving: bf16 activations cross the pallas_call boundary as
    bf16 and get bf16 MXU operands with f32 accumulation (mirrors
    fused_conv_glu); the f32 entropy-side DCA callers are bit-unchanged
    with full-f32 kernel math. Cotangents come back in the primal
    dtypes."""
    return _conv_glu_vjp(apply_ln, interpret, x, ln_scale, ln_bias, w1,
                         b1, dwk, dwb, w2, b2)


def supported(H: int, W: int, C: int, h: int) -> bool:
    """Real-hardware gate. Mosaic requires DMA row-slices of an HBM array to
    be lane-aligned: the channel dims must be multiples of the 128-lane tile
    (the flagship's stage-3 C=256/h=512 qualifies — 12 of its 15 Swin
    blocks; stage-1/2 at 96/144 channels stay on the XLA path)."""
    if C % 128 or h % 128:
        return False
    return _pick_tile_h(H, W, C, h) != 0
