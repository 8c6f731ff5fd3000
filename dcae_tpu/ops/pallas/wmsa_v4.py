"""Fused attention half-block v4: LN + windowing + WMSA + proj + residual.

v3 (wmsa_v3.py) fused qkv/attention/proj but left three full-tensor HBM
round trips around the opaque pallas_call: the LayerNorm materialization
(XLA cannot fuse producers into a custom call), the window-extraction
transpose (B, nh, w, nw, w, C) -> (B, nh, nw, w, w, C) on both sides, and
the residual-scale add. At stage-1 sizes (8 x 384 x 256 x 96) each pass
is ~151 MB bf16 — the round-4 xprof budget attributes ~14 ms/program to
exactly these layout ops.

v4 removes them structurally: the kernel grid walks ROW BLOCKS of the
(B*nh, w, W, C) VIEW of x — a pure reshape, no data movement — and each
grid step loads (w, TW*w, C) into VMEM, LayerNorms it, extracts its TW
windows locally (an in-VMEM view: (w, w, C) -> (P, C) is layout-contiguous),
runs the v3 block-diagonal attention math, and writes
    out = res_scale * x + attn(LN(x))
back to the same layout. The whole attention HALF-BLOCK
(ResScaleConvolutionGateBlock's first residual branch, ref
/root/reference/models/dcae.py:338-357) becomes ONE device op with no
layout traffic. Shifted windows keep the cheap jnp.roll outside (the
residual add commutes with the roll, so the kernel works entirely in the
rolled frame); window-type ids for the shifted masks are computed from
program ids in-kernel.

Math is identical to v3 (same block-diagonal head packing, same mask/
rel-pos bank, bf16 MXU operands with f32 accumulation for bf16 callers);
LN and softmax always run f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dcae_tpu.ops.pallas.wmsa_v3 import _head_mask, _mask_bank


def _kernel(x_ref, g_ref, b_ref, rs_ref, wq_ref, wk_ref, wv_ref, bq_ref,
            bk_ref, bv_ref, wp_ref, bp_ref, hm_ref, bm_ref, out_ref, *,
            tile_w: int, w: int, p: int, heads: int, scale: float,
            nh: int, n_col_tiles: int, shifted: bool, bf16_math: bool):
    """One grid step = tile_w windows from one (row-block, column-tile)."""
    op_dtype = jnp.bfloat16 if bf16_math else jnp.float32
    C = x_ref.shape[-1]
    hm = hm_ref[:]
    hm_op = hm.astype(op_dtype)

    x_raw = x_ref[0]                                  # (w, TW*w, C)
    x_all = x_raw.reshape(tile_w * p, C).astype(jnp.float32)
    # LayerNorm (f32, eps matches ops.layers.LayerNorm / torch 1e-5).
    # Token order within the block does not matter for LN (per-position),
    # so normalizing the (w, TW*w) raster view is exact.
    mu = jnp.mean(x_all, axis=-1, keepdims=True)
    xc = x_all - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + 1e-5)
    xn = (xn * g_ref[0] + b_ref[0]).astype(op_dtype)  # (TW*p raster, C)

    q_all = (jnp.dot(xn, wq_ref[:], preferred_element_type=jnp.float32)
             + bq_ref[0]).astype(op_dtype)
    k_all = (jnp.dot(xn, wk_ref[:], preferred_element_type=jnp.float32)
             + bk_ref[0]).astype(op_dtype)
    v_all = (jnp.dot(xn, wv_ref[:], preferred_element_type=jnp.float32)
             + bv_ref[0]).astype(op_dtype)
    # raster (w, TW*w, C) views for per-window extraction
    q_r = q_all.reshape(w, tile_w * w, C)
    k_r = k_all.reshape(w, tile_w * w, C)
    v_r = v_all.reshape(w, tile_w * w, C)

    # window-type id pieces for the shifted mask bank (0 interior,
    # 1 right edge, 2 bottom edge, 3 corner)
    rb = pl.program_id(0)                 # row block = b * nh + row
    ct = pl.program_id(1)                 # column tile
    is_bottom = (rb % nh) == (nh - 1)

    accs = []
    for t in range(tile_w):               # static unroll, as in v3
        # (w, w, C) -> (P, C): contiguous leading-dim collapse
        q = q_r[:, t * w:(t + 1) * w, :].reshape(p, C)
        k = k_r[:, t * w:(t + 1) * w, :].reshape(p, C)
        v = v_r[:, t * w:(t + 1) * w, :].reshape(p, C)
        qp = pltpu.repeat(q, heads, axis=0) * hm_op   # (H*P, C)
        s = jax.lax.dot_general(
            qp, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale       # (H*P, P)
        if shifted:
            is_right = (ct * tile_w + t) == (n_col_tiles * tile_w - 1)
            wid = is_bottom.astype(jnp.int32) * 2 \
                + is_right.astype(jnp.int32)
        else:
            wid = 0
        s = s + bm_ref[wid]               # rel-pos bias + SW mask
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(op_dtype)
        o = jnp.dot(probs, v,
                    preferred_element_type=jnp.float32) * hm   # (H*P, C)
        acc = o[0:p]
        for h in range(1, heads):
            acc = acc + o[h * p:(h + 1) * p]
        accs.append(acc.reshape(w, w, C))
    # windows back to raster columns: (w, TW*w, C)
    acc_r = jnp.concatenate(accs, axis=1).astype(op_dtype)
    res = (jnp.dot(acc_r.reshape(tile_w * p, C), wp_ref[:],
                   preferred_element_type=jnp.float32)
           + bp_ref[0]).reshape(w, tile_w * w, C)
    # fused residual: out = res_scale * x + attn(LN x)
    out = x_raw.astype(jnp.float32) * rs_ref[0] + res
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("window", "heads", "shifted",
                                             "interpret"))
def fused_wmsa_block_v4(x, ln_scale, ln_bias, rs_scale, wqkv, bqkv, wproj,
                        bproj, rel_table, *, window: int, heads: int,
                        shifted: bool, interpret: bool = False):
    """out = rs_scale * x + WMSA(LN(x)) — the attention half-block.
    x: (B, H, W, C); parameters as in ops.blocks (LayerNorm scale/bias,
    Scale res_scale_1, packed qkv, proj, rel-pos table)."""
    B, H, W, C = x.shape
    w = window
    head_dim = C // heads
    p = w * w
    io_dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    if shifted:
        x = jnp.roll(x, shift=(-(w // 2), -(w // 2)), axis=(1, 2))
    nh, nw = H // w, W // w
    # largest column tile (windows per grid step) that divides the row
    tile_w = next(t for t in (8, 4, 2, 1) if nw % t == 0)
    n_col_tiles = nw // tile_w

    xv = x.reshape(B * nh, w, W, C).astype(io_dtype)  # pure view, no copy

    bf16_math = io_dtype == jnp.bfloat16
    w_dtype = jnp.bfloat16 if bf16_math else jnp.float32
    wqkv = wqkv.astype(w_dtype)
    wproj = wproj.astype(w_dtype)
    wq, wk, wv = (wqkv[:, 0:C], wqkv[:, C:2 * C], wqkv[:, 2 * C:3 * C])
    bqkv = bqkv.astype(jnp.float32)
    bq, bk, bv = (bqkv[0:C].reshape(1, C), bqkv[C:2 * C].reshape(1, C),
                  bqkv[2 * C:3 * C].reshape(1, C))
    bproj = bproj.astype(jnp.float32).reshape(1, C)
    g = ln_scale.astype(jnp.float32).reshape(1, C)
    b = ln_bias.astype(jnp.float32).reshape(1, C)
    rs = rs_scale.astype(jnp.float32).reshape(1, C)

    coords = np.array([[i, j] for i in range(w) for j in range(w)])
    rel_idx = coords[:, None, :] - coords[None, :, :] + w - 1
    rel = rel_table.astype(jnp.float32)[:, rel_idx[:, :, 0],
                                        rel_idx[:, :, 1]]
    bias = rel.reshape(heads * p, p)
    bank = _mask_bank(p, w, shifted)
    bm = jnp.asarray(np.concatenate([bank] * heads, axis=1),
                     jnp.float32) + bias[None]        # (4, H*P, P)
    hm = jnp.asarray(_head_mask(heads, p, head_dim))

    row = lambda i, j: (i, 0, j, 0)   # noqa: E731
    c2 = lambda i, j: (0, 0)          # noqa: E731
    kernel = functools.partial(
        _kernel, tile_w=tile_w, w=w, p=p, heads=heads,
        scale=head_dim ** -0.5, nh=nh, n_col_tiles=n_col_tiles,
        shifted=shifted, bf16_math=bf16_math)
    out = pl.pallas_call(
        kernel,
        grid=(B * nh, n_col_tiles),
        in_specs=[
            pl.BlockSpec((1, w, tile_w * w, C), row),   # x
            pl.BlockSpec((1, C), c2),                   # ln scale
            pl.BlockSpec((1, C), c2),                   # ln bias
            pl.BlockSpec((1, C), c2),                   # res scale
            pl.BlockSpec((C, C), c2),                   # wq
            pl.BlockSpec((C, C), c2),                   # wk
            pl.BlockSpec((C, C), c2),                   # wv
            pl.BlockSpec((1, C), c2),                   # bq
            pl.BlockSpec((1, C), c2),                   # bk
            pl.BlockSpec((1, C), c2),                   # bv
            pl.BlockSpec((C, C), c2),                   # wproj
            pl.BlockSpec((1, C), c2),                   # bproj
            pl.BlockSpec((heads * p, C), c2),           # head mask
            pl.BlockSpec((4, heads * p, p),
                         lambda i, j: (0, 0, 0)),       # bias+mask bank
        ],
        out_specs=pl.BlockSpec((1, w, tile_w * w, C), row),
        out_shape=jax.ShapeDtypeStruct((B * nh, w, W, C), io_dtype),
        interpret=interpret,
    )(xv, g, b, rs, wq, wk, wv, bq, bk, bv, wproj, bproj, hm, bm)

    out = out.reshape(B, H, W, C)
    if shifted:
        out = jnp.roll(out, shift=(w // 2, w // 2), axis=(1, 2))
    return out


# ------------------------------------------------------------- training --
# Same pattern as v3: fused Pallas forward, einsum-recompute backward (one
# XLA program, no stored attention residuals).


def _block_einsum_f32(x, ln_scale, ln_bias, rs_scale, wqkv, bqkv, wproj,
                      bproj, rel_table, *, window: int, heads: int,
                      shifted: bool):
    from dcae_tpu.ops.pallas.wmsa_v3 import _wmsa_einsum_f32

    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = (xc * jax.lax.rsqrt(var + 1e-5)
          * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32))
    h = _wmsa_einsum_f32(xn, wqkv, bqkv, wproj, bproj, rel_table,
                         window=window, heads=heads, shifted=shifted)
    return xf * rs_scale.astype(jnp.float32) + h


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _v4_vjp(window, heads, shifted, interpret, x, ln_scale, ln_bias,
            rs_scale, wqkv, bqkv, wproj, bproj, rel_table):
    return fused_wmsa_block_v4(x, ln_scale, ln_bias, rs_scale, wqkv, bqkv,
                               wproj, bproj, rel_table, window=window,
                               heads=heads, shifted=shifted,
                               interpret=interpret)


def _v4_fwd(window, heads, shifted, interpret, *args):
    return _v4_vjp(window, heads, shifted, interpret, *args), args


def _v4_bwd(window, heads, shifted, interpret, res, gout):
    fn = functools.partial(_block_einsum_f32, window=window, heads=heads,
                           shifted=shifted)
    _, vjp = jax.vjp(fn, *res)
    return vjp(gout.astype(jnp.float32))


_v4_vjp.defvjp(_v4_fwd, _v4_bwd)


def wmsa_block_v4_trainable(x, ln_scale, ln_bias, rs_scale, wqkv, bqkv,
                            wproj, bproj, rel_table, *, window: int,
                            heads: int, shifted: bool,
                            interpret: bool = False):
    """fused_wmsa_block_v4 with gradients (einsum-recompute backward)."""
    return _v4_vjp(window, heads, shifted, interpret, x, ln_scale, ln_bias,
                   rs_scale, wqkv, bqkv, wproj, bproj, rel_table)
