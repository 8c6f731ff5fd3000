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

MXU utilization (round-3 continuation): qkv and proj run once per TILE
((tile_w*P, C) row blocks — full 128-row MXU passes instead of 64-row
per-window calls), and bf16 callers matmul with bf16 operands + f32
accumulation (the MXU's native rate; f32 operand passes cost ~4x). f32
callers keep full f32 math. Same-window chained-program A/B at batch 8:
stage-1 10.3 ms / stage-2 5.5 / stage-3 3.5 per call.
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
            wp_ref, bp_ref, hm_ref, bm_ref, out_ref, *,
            tile_w: int, p: int, heads: int, scale: float, bf16_math: bool):
    """One grid step = tile_w windows.

    qkv and proj run tile-wide ((tile_w*P, C) matmuls — 8x the rows of the
    per-window formulation, so the MXU sees full 128-row passes); only the
    inherently per-window attention matmuls stay in the static unroll.
    bf16 callers (the g_a/g_s stages, whose einsum path would also matmul
    in bf16) keep bf16 MXU operands with f32 accumulation; f32 callers get
    bit-identical f32 math. Softmax and the head-sum are always f32.
    """
    op_dtype = jnp.bfloat16 if bf16_math else jnp.float32
    hm = hm_ref[:]                                   # (H*P, C) head mask f32
    hm_op = hm.astype(op_dtype)
    x_all = xw_ref[:].reshape(tile_w * p, -1)        # (T*P, C)
    if not bf16_math:
        x_all = x_all.astype(jnp.float32)
    q_all = (jnp.dot(x_all, wq_ref[:], preferred_element_type=jnp.float32)
             + bq_ref[0]).astype(op_dtype)
    k_all = (jnp.dot(x_all, wk_ref[:], preferred_element_type=jnp.float32)
             + bk_ref[0]).astype(op_dtype)
    v_all = (jnp.dot(x_all, wv_ref[:], preferred_element_type=jnp.float32)
             + bv_ref[0]).astype(op_dtype)
    accs = []
    for t in range(tile_w):                          # static unroll
        q = q_all[t * p:(t + 1) * p]                 # (P, C)
        k = k_all[t * p:(t + 1) * p]
        v = v_all[t * p:(t + 1) * p]
        qp = pltpu.repeat(q, heads, axis=0) * hm_op  # (H*P, C)
        s = jax.lax.dot_general(
            qp, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # (H*P, P)
        wid = ids_ref[pl.program_id(0) * tile_w + t]
        s = s + bm_ref[wid]                          # rel-pos bias + SW mask
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(op_dtype)
        o = jnp.dot(probs, v,
                    preferred_element_type=jnp.float32) * hm  # (H*P, C)
        acc = o[0:p]
        for h in range(1, heads):
            acc = acc + o[h * p:(h + 1) * p]
        accs.append(acc)
    acc_all = jnp.concatenate(accs, axis=0).astype(op_dtype)  # (T*P, C)
    res = jnp.dot(acc_all, wp_ref[:],
                  preferred_element_type=jnp.float32) + bp_ref[0]
    out_ref[:] = res.reshape(tile_w, p, -1).astype(out_ref.dtype)


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
    # bf16 callers also get bf16 MXU operands (f32 accumulation via
    # preferred_element_type); f32 callers keep full-f32 kernel math.
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

    # bf16 callers (g_a/g_s stages) get bf16 MXU operands with f32
    # accumulation — the same arithmetic class their einsum path would use
    # under dtype=bfloat16, at ~4x the MXU rate of f32 passes. f32 callers
    # keep full f32 math (bit-compatible with the pre-bf16 kernel). Biases
    # and softmax stay f32 either way.
    bf16_math = io_dtype == jnp.bfloat16
    w_dtype = jnp.bfloat16 if bf16_math else jnp.float32
    wqkv = wqkv.astype(w_dtype)
    bqkv = bqkv.astype(jnp.float32)
    wproj = wproj.astype(w_dtype)
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
    # rel-pos bias pre-folded into the 4 shifted-window mask banks: one
    # (H*P, P) add per window inside the kernel instead of two
    bank = _mask_bank(p, w, shifted)                        # (4, P, P)
    bm = jnp.asarray(np.concatenate([bank] * heads, axis=1),
                     jnp.float32) + bias[None]              # (4, H*P, P)
    hm = _head_mask(heads, p, head_dim)

    grid = (xw.shape[0] // tile_w,)
    kernel = functools.partial(_kernel, tile_w=tile_w, p=p, heads=heads,
                               scale=head_dim ** -0.5, bf16_math=bf16_math)
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
                pl.BlockSpec((4, heads * p, p),
                             lambda i, ids: (0, 0, 0)),    # bias+mask bank
            ],
            out_specs=pl.BlockSpec((tile_w, p, C), row),
        ),
        out_shape=jax.ShapeDtypeStruct((xw.shape[0], p, C), io_dtype),
        interpret=interpret,
    )(jnp.asarray(ids), xw, wq, wk, wv, bq, bk, bv, wproj, bproj,
      jnp.asarray(hm), bm)

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
    boundary AND matmul as bf16 MXU operands (f32 accumulation/softmax) —
    the same arithmetic class the einsum path uses under dtype=bfloat16.
    The VJP remains consistent: the backward differentiates the f32 einsum
    restatement through each input's own dtype, so cotangents come back in
    the primal dtypes as custom_vjp requires (f32-recompute backwards over
    reduced-precision forwards is the standard mixed-precision pairing)."""
    return _wmsa_v3_vjp(window, heads, shifted, interpret, x, wqkv, bqkv,
                        wproj, bproj, rel_table)
