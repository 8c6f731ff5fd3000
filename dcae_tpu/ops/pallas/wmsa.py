"""Fused Pallas window-attention kernel (experimental, TPU).

Fuses LayerNorm -> qkv projection -> per-window multi-head attention
(relative-position bias + optional shifted-window mask) -> output projection
into one VMEM-resident program per tile of windows: the (48x32x256) stage
activations never round-trip to HBM between those ops (they are ~1.5 MB per
image — far under the ~16 MB VMEM budget).

The attention matrices are small (P=64 tokens, head_dim 32), so the win is
memory locality, not MXU utilization. Used by ops.blocks.WMSA when
DCAE_PALLAS=1; numerics are validated against the reference einsum path in
tests/test_pallas.py (interpret mode on CPU).

STATUS: numerically verified in interpret mode; the current Mosaic compiler
rejects the (T*P, 3C) -> (T, P, 3, H, D) qkv reshape ("unsupported shape
cast" — head_dim 32 < the 128-lane tile). The round-2 revision keeps every
in-kernel tensor 2D with lane dims >= 128 (block-diagonal head packing:
score all heads in one (H*P, H*P) matmul with -inf off-head blocks, which
the softmax then zeroes exactly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(ids_ref, x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref,
            bproj_ref, rel_ref, mask_ref, out_ref, *, tile_w: int, p: int,
            heads: int, head_dim: int, apply_ln: bool):
    c = heads * head_dim
    x = x_ref[:]                                   # (T, P, C)

    if apply_ln:  # LayerNorm over C (torch eps)
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        xn = (x - mu) * jax.lax.rsqrt(var + 1e-5)
        xn = xn * lns_ref[:] + lnb_ref[:]
    else:
        xn = x

    # qkv projection (MXU): (T*P, C) @ (C, 3C)
    qkv = jnp.dot(xn.reshape(tile_w * p, c), wqkv_ref[:],
                  preferred_element_type=jnp.float32) + bqkv_ref[:]
    qkv = qkv.reshape(tile_w, p, 3, heads, head_dim)
    scale = head_dim ** -0.5

    outs = []
    for t in range(tile_w):  # static unroll over the window tile
        q = qkv[t, :, 0].reshape(p, heads, head_dim)
        k = qkv[t, :, 1].reshape(p, heads, head_dim)
        v = qkv[t, :, 2].reshape(p, heads, head_dim)
        # (H, P, P) scores
        sim = jax.lax.dot_general(
            q.transpose(1, 0, 2), k.transpose(1, 0, 2),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        sim = sim + rel_ref[:]
        wid = ids_ref[pl.program_id(0) * tile_w + t]
        sim = sim + mask_ref[wid]                  # (H,P,P)+(P,P) additive
        probs = jax.nn.softmax(sim, axis=-1)
        o = jax.lax.dot_general(
            probs, v.transpose(1, 0, 2),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)    # (H, P, D)
        outs.append(o.transpose(1, 0, 2).reshape(p, c))
    acc = jnp.stack(outs)  # (T, P, C) — static stack, no scatter
    out = jnp.dot(acc.reshape(tile_w * p, c), wproj_ref[:],
                  preferred_element_type=jnp.float32) + bproj_ref[:]
    out_ref[:] = out.reshape(tile_w, p, c)


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
    """(4, P, P) additive masks for the 4 window types."""
    bank = np.zeros((4, p_tokens, p_tokens), np.float32)
    if not shifted:
        return bank
    w = window
    s = w - w // 2
    neg = np.float32(-1e30)

    def block(rows_hi, cols_hi, horizontal):
        m = np.zeros((w, w, w, w), bool)
        if horizontal:  # split along the second (col) axis
            m[:, :s, :, s:] = True
            m[:, s:, :, :s] = True
        else:           # split along the first (row) axis
            m[:s, :, s:, :] = True
            m[s:, :, :s, :] = True
        return m.reshape(p_tokens, p_tokens)

    right = block(None, None, horizontal=True)    # cols wrap
    bottom = block(None, None, horizontal=False)  # rows wrap
    bank[1][right] = neg
    bank[2][bottom] = neg
    bank[3][right | bottom] = neg
    return bank


@functools.partial(jax.jit, static_argnames=("window", "heads", "shifted",
                                             "tile_w", "interpret",
                                             "apply_ln"))
def fused_wmsa(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, rel_table,
               *, window: int, heads: int, shifted: bool,
               tile_w: int = 8, interpret: bool = False,
               apply_ln: bool = False):
    """x: (B, H, W, C) -> (B, H, W, C). Weight layouts: wqkv (C, 3C),
    wproj (C, C), rel_table (heads, 2w-1, 2w-1). apply_ln fuses a leading
    LayerNorm (pass its scale/bias; otherwise they are ignored)."""
    B, H, W, C = x.shape
    w = window
    head_dim = C // heads
    p_tokens = w * w

    if shifted:
        x = jnp.roll(x, shift=(-(w // 2), -(w // 2)), axis=(1, 2))
    nh, nw = H // w, W // w
    xw = x.reshape(B, nh, w, nw, w, C).transpose(0, 1, 3, 2, 4, 5)
    xw = xw.reshape(B * nh * nw, p_tokens, C)
    n_windows = B * nh * nw

    # pad the window count to the tile
    pad = (-n_windows) % tile_w
    if pad:
        xw = jnp.concatenate(
            [xw, jnp.zeros((pad, p_tokens, C), x.dtype)], axis=0)

    ids = np.tile(_window_type_ids(nh, nw, shifted), B)
    ids = np.concatenate([ids, np.zeros(pad, np.int32)])
    mask = jnp.asarray(_mask_bank(p_tokens, w, shifted))

    # relative-position bias gathered outside the kernel (static indices)
    coords = np.array([[i, j] for i in range(w) for j in range(w)])
    rel_idx = coords[:, None, :] - coords[None, :, :] + w - 1
    rel = rel_table[:, rel_idx[:, :, 0], rel_idx[:, :, 1]]  # (h, P, P)

    grid = (xw.shape[0] // tile_w,)
    kernel = functools.partial(_kernel, tile_w=tile_w, p=p_tokens,
                               heads=heads, head_dim=head_dim,
                               apply_ln=apply_ln)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_w, p_tokens, C),
                             lambda i, ids: (i, 0, 0)),
                pl.BlockSpec((C,), lambda i, ids: (0,)),
                pl.BlockSpec((C,), lambda i, ids: (0,)),
                pl.BlockSpec((C, 3 * C), lambda i, ids: (0, 0)),
                pl.BlockSpec((3 * C,), lambda i, ids: (0,)),
                pl.BlockSpec((C, C), lambda i, ids: (0, 0)),
                pl.BlockSpec((C,), lambda i, ids: (0,)),
                pl.BlockSpec((heads, p_tokens, p_tokens),
                             lambda i, ids: (0, 0, 0)),
                pl.BlockSpec((4, p_tokens, p_tokens),
                             lambda i, ids: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((tile_w, p_tokens, C),
                                   lambda i, ids: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct(xw.shape, jnp.float32),
        interpret=interpret,
    )(jnp.asarray(ids), xw.astype(jnp.float32), ln_scale, ln_bias, wqkv,
      bqkv, wproj, bproj, rel.astype(jnp.float32), mask)

    out = out[:n_windows].astype(x.dtype)
    out = out.reshape(B, nh, nw, w, w, C).transpose(0, 1, 3, 2, 4, 5)
    out = out.reshape(B, H, W, C)
    if shifted:
        out = jnp.roll(out, shift=(w // 2, w // 2), axis=(1, 2))
    return out
