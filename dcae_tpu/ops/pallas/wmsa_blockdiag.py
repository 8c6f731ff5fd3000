"""Mosaic-compilable fused window attention: block-diagonal head packing.

All in-kernel tensors are 2D with MXU/VPU-aligned shapes:

  * qkv/proj projections and head rearrangement run in XLA (reshapes are
    free there); the kernel receives q/k/v as (NW, H*P, 128) with head_dim
    zero-padded from D to 128 lanes (zero columns contribute nothing to the
    contractions).
  * per window, ONE (H*P, H*P) score matmul computes every head at once;
    off-head blocks get -inf additive bias so the row softmax zeroes them
    exactly — a block-diagonal attention identical to per-head softmax.
  * probs @ v is another aligned (H*P, H*P) @ (H*P, 128) MXU matmul.

The overcompute (off-head blocks, padded lanes) trades ~8-32x redundant MXU
flops for perfect tiling and zero HBM round trips for scores/probs; at
H*P=512 this is still microseconds per window.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dcae_tpu.ops.pallas.wmsa import _mask_bank, _window_type_ids

LANE = 128


def _kernel(ids_ref, q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref, *,
            tile_w: int, hp: int, scale: float):
    for t in range(tile_w):  # static unroll
        q = q_ref[t]                                    # (HP, LANE)
        k = k_ref[t]
        v = v_ref[t]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (HP, HP)
        s = s + bias_ref[:]
        wid = ids_ref[pl.program_id(0) * tile_w + t]
        s = s + mask_ref[wid]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)
        out_ref[t] = jnp.dot(probs, v,
                             preferred_element_type=jnp.float32)


def _blockdiag_bias(rel: jnp.ndarray, heads: int, p_tokens: int):
    """(H*P, H*P): rel-pos bias on diagonal head blocks, -1e30 elsewhere."""
    hp = heads * p_tokens
    neg = jnp.full((hp, hp), -1e30, jnp.float32)
    eye = jnp.kron(jnp.eye(heads, dtype=jnp.float32),
                   jnp.ones((p_tokens, p_tokens), jnp.float32))
    rel_block = jax.scipy.linalg.block_diag(
        *[rel[h] for h in range(heads)])
    return jnp.where(eye > 0, rel_block, neg)


def _blockdiag_mask_bank(window: int, heads: int, shifted: bool):
    """(4, H*P, H*P): SW masks replicated on the diagonal head blocks."""
    p_tokens = window * window
    bank = _mask_bank(p_tokens, window, shifted)  # (4, P, P) additive
    out = np.zeros((4, heads * p_tokens, heads * p_tokens), np.float32)
    for i in range(4):
        for h in range(heads):
            a = h * p_tokens
            out[i, a:a + p_tokens, a:a + p_tokens] = bank[i]
    return out


@functools.partial(jax.jit, static_argnames=("window", "heads", "shifted",
                                             "tile_w", "interpret"))
def fused_wmsa_blockdiag(x, wqkv, bqkv, wproj, bproj, rel_table, *,
                         window: int, heads: int, shifted: bool,
                         tile_w: int = 4, interpret: bool = False):
    """Drop-in replacement for the WMSA inner computation (post-LN input).
    x: (B, H, W, C); weights wqkv (C, 3C), wproj (C, C);
    rel_table (heads, 2w-1, 2w-1)."""
    B, H, W, C = x.shape
    w = window
    head_dim = C // heads
    p_tokens = w * w
    hp = heads * p_tokens

    if shifted:
        x = jnp.roll(x, shift=(-(w // 2), -(w // 2)), axis=(1, 2))
    nh, nw = H // w, W // w
    xw = x.reshape(B, nh, w, nw, w, C).transpose(0, 1, 3, 2, 4, 5)
    xw = xw.reshape(B * nh * nw, p_tokens, C).astype(jnp.float32)
    n_windows = B * nh * nw

    # qkv in XLA; rearrange to head-major rows, pad head_dim to the lane
    qkv = jnp.dot(xw, wqkv, preferred_element_type=jnp.float32) + bqkv
    qkv = qkv.reshape(n_windows, p_tokens, 3, heads, head_dim)
    qkv = qkv.transpose(2, 0, 3, 1, 4)  # (3, NW, H, P, D)
    qkv = qkv.reshape(3, n_windows, hp, head_dim)
    qkv = jnp.pad(qkv, ((0, 0), (0, 0), (0, 0), (0, LANE - head_dim)))
    q, k, v = qkv[0], qkv[1], qkv[2]

    pad = (-n_windows) % tile_w
    if pad:
        zeros = jnp.zeros((pad, hp, LANE), jnp.float32)
        q = jnp.concatenate([q, zeros])
        k = jnp.concatenate([k, zeros])
        v = jnp.concatenate([v, zeros])

    ids = np.tile(_window_type_ids(nh, nw, shifted), B)
    ids = np.concatenate([ids, np.zeros(pad, np.int32)])

    coords = np.array([[i, j] for i in range(w) for j in range(w)])
    rel_idx = coords[:, None, :] - coords[None, :, :] + w - 1
    rel = rel_table[:, rel_idx[:, :, 0], rel_idx[:, :, 1]]
    bias = _blockdiag_bias(rel.astype(jnp.float32), heads, p_tokens)
    mask = jnp.asarray(_blockdiag_mask_bank(w, heads, shifted))

    grid = (q.shape[0] // tile_w,)
    kernel = functools.partial(_kernel, tile_w=tile_w, hp=hp,
                               scale=head_dim ** -0.5)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_w, hp, LANE), lambda i, ids: (i, 0, 0)),
                pl.BlockSpec((tile_w, hp, LANE), lambda i, ids: (i, 0, 0)),
                pl.BlockSpec((tile_w, hp, LANE), lambda i, ids: (i, 0, 0)),
                pl.BlockSpec((hp, hp), lambda i, ids: (0, 0)),
                pl.BlockSpec((4, hp, hp), lambda i, ids: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((tile_w, hp, LANE),
                                   lambda i, ids: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((q.shape[0], hp, LANE), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(ids), q, k, v, bias, mask)

    out = out[:n_windows, :, :head_dim]               # strip lane padding
    out = out.reshape(n_windows, heads, p_tokens, head_dim)
    out = out.transpose(0, 2, 1, 3).reshape(n_windows, p_tokens, C)
    out = jnp.dot(out, wproj, preferred_element_type=jnp.float32) + bproj

    out = out.reshape(B, nh, nw, w, w, C).transpose(0, 1, 3, 2, 4, 5)
    out = out.reshape(B, H, W, C)
    if shifted:
        out = jnp.roll(out, shift=(w // 2, w // 2), axis=(1, 2))
    return out
