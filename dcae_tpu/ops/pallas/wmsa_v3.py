"""Fused window attention v3: sublane head packing, fully VMEM-resident.

Round-1's v2 (wmsa_blockdiag) computed qkv in XLA and zero-padded head_dim
to the 128-lane tile — at stage-1 sizes that writes ~14 GB of padded q/k/v
to HBM, defeating the purpose. v3 keeps EVERYTHING in VMEM and avoids lane
padding entirely by packing heads along the SUBLANE axis:

  per window (P=w^2 tokens, C channels, H heads, D=C/H):
    q,k,v = x @ Wq/Wk/Wv                       (P, C) MXU matmuls
    Q'    = tile q H times on sublanes         (H*P, C)   [pltpu.repeat]
    Q'    = Q' * headmask                      zero all lanes not in head h
            for rows [h*P, (h+1)*P)
    s     = Q' @ k^T  * scale + relpos + mask  (H*P, P) — row h*P+t holds
            head-h scores because the masked contraction only sums head-h
            channels (block-diagonal attention, exact)
    probs = softmax over lanes (P <= 128)
    o     = (probs @ v) * headmask             (H*P, C)
    out   = sum_h o[h*P:(h+1)*P]               (P, C) 8-aligned sublane
                                               slices, VPU adds
    out   = out @ Wproj + bias

Every tensor is 2D with lanes = C (>= 96) or P (64): no shape casts Mosaic
rejects, no padding. The overcompute (full-C contraction per head block) is
HxD/D = H-fold on the two attention matmuls — the same arithmetic waste XLA
pays for K=D batched matmuls — but scores/probs never touch HBM and LN/qkv/
proj fuse into the same program. (Behavioral parity: ops.blocks.WMSA's
einsum path; ref /root/reference/models/dcae.py:225-298.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _window_type_ids(nh: int, nw: int, shifted: bool) -> np.ndarray:
    """0 = interior, 1 = right edge, 2 = bottom edge, 3 = corner."""
    if not shifted:
        return np.zeros((nh * nw,), np.int32)
    ids = np.zeros((nh, nw), np.int32)
    ids[:, -1] = 1
    ids[-1, :] = 2
    ids[-1, -1] = 3
    return ids.reshape(-1)


def _mask_bank(p_tokens: int, window: int, shifted: bool) -> np.ndarray:
    """(4, P, P) additive shifted-window masks for the 4 window types
    (interior / right edge / bottom edge / corner); the cyclic shift makes
    edge windows contain tokens from two image regions that must not attend
    to each other (ref /root/reference/models/dcae.py:266-283
    generate_mask)."""
    bank = np.zeros((4, p_tokens, p_tokens), np.float32)
    if not shifted:
        return bank
    w = window
    s = w - w // 2
    neg = np.float32(-1e30)

    def block(horizontal):
        m = np.zeros((w, w, w, w), bool)
        if horizontal:  # split along the second (col) axis
            m[:, :s, :, s:] = True
            m[:, s:, :, :s] = True
        else:           # split along the first (row) axis
            m[:s, :, s:, :] = True
            m[s:, :, :s, :] = True
        return m.reshape(p_tokens, p_tokens)

    right = block(horizontal=True)    # cols wrap
    bottom = block(horizontal=False)  # rows wrap
    bank[1][right] = neg
    bank[2][bottom] = neg
    bank[3][right | bottom] = neg
    return bank


def _kernel(ids_ref, xw_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref,
            wp_ref, bp_ref, hm_ref, bias_ref, mask_ref, out_ref, *,
            tile_w: int, p: int, heads: int, scale: float):
    hm = hm_ref[:]                                   # (H*P, C) head mask
    for t in range(tile_w):                          # static unroll
        # VMEM-local upcast (bf16 IO callers); kernel math stays f32
        x = xw_ref[t].astype(jnp.float32)            # (P, C)
        q = jnp.dot(x, wq_ref[:],
                    preferred_element_type=jnp.float32) + bq_ref[0]
        k = jnp.dot(x, wk_ref[:],
                    preferred_element_type=jnp.float32) + bk_ref[0]
        v = jnp.dot(x, wv_ref[:],
                    preferred_element_type=jnp.float32) + bv_ref[0]
        qp = pltpu.repeat(q, heads, axis=0) * hm     # (H*P, C)
        s = jax.lax.dot_general(
            qp, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # (H*P, P)
        wid = ids_ref[pl.program_id(0) * tile_w + t]
        s = s + bias_ref[:] + mask_ref[wid]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jnp.dot(probs, v,
                    preferred_element_type=jnp.float32) * hm  # (H*P, C)
        acc = o[0:p]
        for h in range(1, heads):
            acc = acc + o[h * p:(h + 1) * p]
        res = jnp.dot(acc, wp_ref[:],
                      preferred_element_type=jnp.float32) + bp_ref[0]
        out_ref[t] = res.astype(out_ref.dtype)


def _head_mask(heads: int, p: int, head_dim: int) -> np.ndarray:
    """(H*P, C) 0/1: row block h keeps only head h's channel lanes."""
    c = heads * head_dim
    m = np.zeros((heads * p, c), np.float32)
    for h in range(heads):
        m[h * p:(h + 1) * p, h * head_dim:(h + 1) * head_dim] = 1.0
    return m


@functools.partial(jax.jit, static_argnames=("window", "heads", "shifted",
                                             "tile_w", "interpret"))
def fused_wmsa_v3(x, wqkv, bqkv, wproj, bproj, rel_table, *, window: int,
                  heads: int, shifted: bool, tile_w: int = 8,
                  interpret: bool = False):
    """Drop-in replacement for WMSA's einsum path (post-LN input).
    x: (B, H, W, C); wqkv (C, 3C) packed [q|k|v]; rel_table (H, 2w-1, 2w-1).
    """
    B, H, W, C = x.shape
    w = window
    head_dim = C // heads
    p = w * w
    # kernel IO follows the input dtype: bf16 callers (the g_a/g_s
    # stages) halve the xw/out HBM materialization around the opaque
    # pallas_call (stage-1 at 384x256x96 is ~900 MB of traffic in f32);
    # f32 callers (the entropy-side hyper swin) keep bit-identical IO.
    # Math inside the kernel is f32 either way (preferred_element_type).
    io_dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    if shifted:
        x = jnp.roll(x, shift=(-(w // 2), -(w // 2)), axis=(1, 2))
    nh, nw = H // w, W // w
    xw = x.reshape(B, nh, w, nw, w, C).transpose(0, 1, 3, 2, 4, 5)
    xw = xw.reshape(B * nh * nw, p, C).astype(io_dtype)
    n_windows = B * nh * nw

    pad = (-n_windows) % tile_w
    if pad:
        xw = jnp.concatenate([xw, jnp.zeros((pad, p, C), io_dtype)])
    ids = np.tile(_window_type_ids(nh, nw, shifted), B)
    ids = np.concatenate([ids, np.zeros(pad, np.int32)])

    # kernel math is f32 whatever the stored weight dtype (weights are
    # tiny next to activations, so the cast is noise)
    wqkv = wqkv.astype(jnp.float32)
    bqkv = bqkv.astype(jnp.float32)
    wproj = wproj.astype(jnp.float32)
    bproj = bproj.astype(jnp.float32)
    rel_table = rel_table.astype(jnp.float32)
    # reference packs qkv output channels head-major: c = h*D + d
    wq, wk, wv = (wqkv[:, 0:C], wqkv[:, C:2 * C], wqkv[:, 2 * C:3 * C])
    bq, bk, bv = (bqkv[0:C].reshape(1, C), bqkv[C:2 * C].reshape(1, C),
                  bqkv[2 * C:3 * C].reshape(1, C))
    bproj = bproj.reshape(1, C)

    coords = np.array([[i, j] for i in range(w) for j in range(w)])
    rel_idx = coords[:, None, :] - coords[None, :, :] + w - 1
    rel = rel_table[:, rel_idx[:, :, 0], rel_idx[:, :, 1]]  # (H, P, P)
    bias = rel.reshape(heads * p, p)
    mask = np.zeros((4, heads * p, p), np.float32)
    bank = _mask_bank(p, w, shifted)                        # (4, P, P)
    mask[:] = np.concatenate([bank] * heads, axis=1)
    hm = _head_mask(heads, p, head_dim)

    grid = (xw.shape[0] // tile_w,)
    kernel = functools.partial(_kernel, tile_w=tile_w, p=p, heads=heads,
                               scale=head_dim ** -0.5)
    row = lambda i, ids: (i, 0, 0)  # noqa: E731
    const2 = lambda i, ids: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_w, p, C), row),         # xw
                pl.BlockSpec((C, C), const2),              # wq
                pl.BlockSpec((C, C), const2),              # wk
                pl.BlockSpec((C, C), const2),              # wv
                pl.BlockSpec((1, C), const2),              # bq
                pl.BlockSpec((1, C), const2),              # bk
                pl.BlockSpec((1, C), const2),              # bv
                pl.BlockSpec((C, C), const2),              # wproj
                pl.BlockSpec((1, C), const2),              # bproj
                pl.BlockSpec((heads * p, C), const2),      # head mask
                pl.BlockSpec((heads * p, p), const2),      # rel-pos bias
                pl.BlockSpec((4, heads * p, p),
                             lambda i, ids: (0, 0, 0)),    # SW mask bank
            ],
            out_specs=pl.BlockSpec((tile_w, p, C), row),
        ),
        out_shape=jax.ShapeDtypeStruct((xw.shape[0], p, C), io_dtype),
        interpret=interpret,
    )(jnp.asarray(ids), xw, wq, wk, wv, bq, bk, bv, wproj, bproj,
      jnp.asarray(hm), jnp.asarray(bias, jnp.float32), jnp.asarray(mask))

    out = out[:n_windows]
    out = out.reshape(B, nh, nw, w, w, C).transpose(0, 1, 3, 2, 4, 5)
    out = out.reshape(B, H, W, C)
    if shifted:
        out = jnp.roll(out, shift=(w // 2, w // 2), axis=(1, 2))
    return out


# ---------------------------------------------------------------- training --
# The kernel above has no Pallas backward; training uses a custom VJP whose
# forward IS the fused kernel (no residuals beyond the inputs) and whose
# backward differentiates a mathematically-identical einsum restatement.
# This is rematerialization by construction: the attention matrices are
# never stored to HBM on the forward pass (the einsum path's residual
# traffic is the cost being removed), and the backward recomputes them once
# inside one fused XLA program.


def _wmsa_einsum_f32(x, wqkv, bqkv, wproj, bproj, rel_table, *, window: int,
                     heads: int, shifted: bool):
    """Pure-f32 einsum restatement of the kernel's math (for the VJP)."""
    B, H, W, C = x.shape
    w = window
    head_dim = C // heads
    p = w * w
    x = x.astype(jnp.float32)
    if shifted:
        x = jnp.roll(x, shift=(-(w // 2), -(w // 2)), axis=(1, 2))
    nh, nw = H // w, W // w
    xw = x.reshape(B, nh, w, nw, w, C).transpose(0, 1, 3, 2, 4, 5)
    xw = xw.reshape(B, nh * nw, p, C)

    qkv = jnp.dot(xw, wqkv.astype(jnp.float32),
                  preferred_element_type=jnp.float32) \
        + bqkv.astype(jnp.float32)
    qkv = qkv.reshape(B, nh * nw, p, 3, heads, head_dim)
    q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
    sim = jnp.einsum("bnphd,bnqhd->bhnpq", q, k,
                     preferred_element_type=jnp.float32) * head_dim ** -0.5

    coords = np.array([[i, j] for i in range(w) for j in range(w)])
    rel_idx = coords[:, None, :] - coords[None, :, :] + w - 1
    rel = rel_table.astype(jnp.float32)[:, rel_idx[:, :, 0], rel_idx[:, :, 1]]
    sim = sim + rel[None, :, None, :, :]

    ids = _window_type_ids(nh, nw, shifted)              # (nh*nw,)
    bank = _mask_bank(p, w, shifted)                     # (4, P, P) additive
    sim = sim + jnp.asarray(bank[ids])[None, None]

    probs = jax.nn.softmax(sim, axis=-1)
    out = jnp.einsum("bhnpq,bnqhd->bnphd", probs, v,
                     preferred_element_type=jnp.float32)
    out = out.reshape(B, nh * nw, p, C)
    out = jnp.dot(out, wproj.astype(jnp.float32),
                  preferred_element_type=jnp.float32) \
        + bproj.astype(jnp.float32)
    out = out.reshape(B, nh, nw, w, w, C).transpose(0, 1, 3, 2, 4, 5)
    out = out.reshape(B, H, W, C)
    if shifted:
        out = jnp.roll(out, shift=(w // 2, w // 2), axis=(1, 2))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _wmsa_v3_vjp(window, heads, shifted, interpret, x, wqkv, bqkv, wproj,
                 bproj, rel_table):
    return fused_wmsa_v3(x, wqkv, bqkv, wproj, bproj, rel_table,
                         window=window, heads=heads, shifted=shifted,
                         interpret=interpret)


def _wmsa_v3_fwd(window, heads, shifted, interpret, x, wqkv, bqkv, wproj,
                 bproj, rel_table):
    out = _wmsa_v3_vjp(window, heads, shifted, interpret, x, wqkv, bqkv,
                       wproj, bproj, rel_table)
    return out, (x, wqkv, bqkv, wproj, bproj, rel_table)


def _wmsa_v3_bwd(window, heads, shifted, interpret, res, g):
    fn = functools.partial(_wmsa_einsum_f32, window=window, heads=heads,
                           shifted=shifted)
    _, vjp = jax.vjp(fn, *res)
    return vjp(g.astype(jnp.float32))


_wmsa_v3_vjp.defvjp(_wmsa_v3_fwd, _wmsa_v3_bwd)


def wmsa_v3_trainable(x, wqkv, bqkv, wproj, bproj, rel_table, *, window: int,
                      heads: int, shifted: bool, interpret: bool = False):
    """fused_wmsa_v3 with gradients: fused Pallas forward, einsum-recompute
    backward (one XLA program, no stored attention residuals).

    Dtype-preserving: bf16 activations stay bf16 across the pallas_call
    boundary (the kernel upcasts in VMEM and computes f32 — the blanket
    f32 promotion this wrapper used to do materialized 2x the bytes
    around the opaque call, ~600 MB/program at stage-1). The VJP remains
    consistent: the backward differentiates the f32 einsum restatement
    through each input's own dtype, so cotangents come back in the
    primal dtypes as custom_vjp requires."""
    return _wmsa_v3_vjp(window, heads, shifted, interpret, x, wqkv, bqkv,
                        wproj, bproj, rel_table)
