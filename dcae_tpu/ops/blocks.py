"""NN block library (L1): residual bottlenecks, window attention, gated MLPs.

Behavioral parity targets (shapes/topology) cite the canonical copies in
/root/reference/models/dcae.py; the implementations are NHWC JAX designed for
XLA fusion on TPU: window partitioning is pure reshape/transpose (layout
changes XLA folds into the attention einsums), shifted-window masks and
relative-position gather indices are numpy constants baked at trace time, and
all matmuls carry float32 accumulation on the MXU.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dcae_tpu.ops import layers
from dcae_tpu.ops.layers import Conv, Deconv, Dense, LayerNorm, gelu

Dtype = Any


def pallas_interpret() -> bool:
    """Run the fused kernels in pallas interpret mode (CPU tests only):
    lets the module-level param wiring be validated without TPU hardware."""
    return os.environ.get("DCAE_PALLAS_INTERPRET") == "1"


class ResidualBottleneckBlock(nn.Module):
    """1x1 -> relu -> 3x3 -> relu -> 1x1 with skip; mid = min(in,out)//2.
    (ref models/dcae.py:152-188)"""
    out_ch: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        mid = min(in_ch, self.out_ch) // 2
        identity = x
        if in_ch != self.out_ch:
            identity = Conv(self.out_ch, 1, dtype=self.dtype, name="skip")(x)
        h = Conv(mid, 1, dtype=self.dtype, name="conv1")(x)
        h = jax.nn.relu(h)
        h = Conv(mid, 3, dtype=self.dtype, name="conv2")(h)
        h = jax.nn.relu(h)
        h = Conv(self.out_ch, 1, dtype=self.dtype, name="conv3")(h)
        return h + identity


class ResidualBottleneckBlockWithStride(nn.Module):
    """conv(k5,s2) then 3 bottlenecks — the downsample unit.
    (ref models/dcae.py:190-205)"""
    out_ch: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = Conv(self.out_ch, 5, stride=2, dtype=self.dtype, name="down")(x)
        for i in range(3):
            h = ResidualBottleneckBlock(self.out_ch, dtype=self.dtype,
                                        name=f"res{i + 1}")(h)
        return h


class ResidualBottleneckBlockWithUpsample(nn.Module):
    """3 bottlenecks then deconv(k5,s2) — the upsample unit.
    (ref models/dcae.py:207-222)"""
    out_ch: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        h = x
        for i in range(3):
            h = ResidualBottleneckBlock(in_ch, dtype=self.dtype,
                                        name=f"res{i + 1}")(h)
        return Deconv(self.out_ch, 5, 2, dtype=self.dtype, name="up")(h)


def _relative_position_index(window: int) -> np.ndarray:
    """(P, P, 2) lookup into the (2w-1, 2w-1) relative-position table."""
    coords = np.array([[i, j] for i in range(window) for j in range(window)])
    rel = coords[:, None, :] - coords[None, :, :] + window - 1
    return rel


def _shifted_window_mask(nh: int, nw: int, window: int) -> np.ndarray:
    """Boolean (nh*nw, P, P) mask for SW-MSA with cyclic shift window//2:
    True = forbidden. (ref models/dcae.py:246-263)"""
    p = window
    shift = window // 2
    s = p - shift
    mask = np.zeros((nh, nw, p, p, p, p), dtype=bool)
    mask[-1, :, :s, :, s:, :] = True
    mask[-1, :, s:, :, :s, :] = True
    mask[:, -1, :, :s, :, s:] = True
    mask[:, -1, :, s:, :, :s] = True
    return mask.transpose(0, 1, 2, 3, 4, 5).reshape(nh, nw, p * p, p * p
                                                    ).reshape(nh * nw, p * p,
                                                              p * p)


class WMSA(nn.Module):
    """Swin window multi-head self-attention ('W' or shifted 'SW').
    (ref models/dcae.py:225-298)

    x: (B, H, W, C) with H, W divisible by window_size. Two compute paths
    over the same parameters: the default XLA einsum path, and a fused
    Pallas kernel (qkv + attention + proj resident in VMEM) enabled with
    DCAE_PALLAS=1 on TPU backends.
    """
    head_dim: int
    window_size: int
    shifted: bool = False
    dtype: Optional[Dtype] = None
    pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        import os

        w = self.window_size
        B, H, W, C = x.shape
        assert H % w == 0 and W % w == 0, (H, W, w)
        heads = C // self.head_dim
        scale = self.head_dim ** -0.5

        rel_table = self.param("relative_position", layers.trunc_normal(0.02),
                               (heads, 2 * w - 1, 2 * w - 1))
        qkv_kernel = self.param("qkv_kernel",
                                layers.fan_in_uniform(C), (C, 3 * C))
        qkv_bias = self.param("qkv_bias", layers.fan_in_uniform(C), (3 * C,))
        proj_kernel = self.param("proj_kernel",
                                 layers.fan_in_uniform(C), (C, C))
        proj_bias = self.param("proj_bias", layers.fan_in_uniform(C), (C,))

        # v3 fused kernel (sublane head packing, fully VMEM-resident):
        # wins where activation traffic dominates (high-res stages) and ties
        # elsewhere — enabled for all window-8 stages. Trainable: the custom
        # VJP runs the fused kernel forward and an einsum-recompute backward
        # (no stored attention residuals). The codec turns it on via
        # cfg.pallas_attention. DCAE_PALLAS env: "0" force-disables, "1"
        # force-enables (benchmarks).
        env = os.environ.get("DCAE_PALLAS")
        use_pallas = (self.pallas if env is None else env == "1") and w == 8
        if use_pallas:
            from dcae_tpu.ops.pallas.wmsa_v3 import wmsa_v3_trainable

            return wmsa_v3_trainable(
                x, qkv_kernel, qkv_bias, proj_kernel, proj_bias, rel_table,
                window=w, heads=heads, shifted=self.shifted,
                interpret=pallas_interpret()).astype(x.dtype)

        if self.shifted:
            x = jnp.roll(x, shift=(-(w // 2), -(w // 2)), axis=(1, 2))

        nh, nw = H // w, W // w
        xw = x.reshape(B, nh, w, nw, w, C).transpose(0, 1, 3, 2, 4, 5)
        xw = xw.reshape(B, nh * nw, w * w, C)

        dt = self.dtype or x.dtype
        qkv = (jnp.dot(xw.astype(dt), qkv_kernel.astype(dt),
                       preferred_element_type=jnp.float32).astype(dt)
               + qkv_bias.astype(dt))
        qkv = qkv.reshape(B, nh * nw, w * w, 3, heads, self.head_dim)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]

        sim = jnp.einsum("bnphd,bnqhd->bhnpq", q, k,
                         preferred_element_type=jnp.float32) * scale

        rel_idx = _relative_position_index(w)
        rel_emb = rel_table[:, rel_idx[:, :, 0], rel_idx[:, :, 1]]
        sim = sim + rel_emb[None, :, None, :, :]

        if self.shifted:
            mask = jnp.asarray(_shifted_window_mask(nh, nw, w))
            sim = jnp.where(mask[None, None], -jnp.inf, sim)

        probs = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnpq,bnqhd->bnphd", probs, v,
                         preferred_element_type=jnp.float32)
        out = out.astype(x.dtype).reshape(B, nh * nw, w * w, C)
        # reference packs heads head-major: channel = h*head_dim + d
        out = (jnp.dot(out.astype(dt), proj_kernel.astype(dt),
                       preferred_element_type=jnp.float32).astype(dt)
               + proj_bias.astype(dt)).astype(x.dtype)

        out = out.reshape(B, nh, nw, w, w, C).transpose(0, 1, 3, 2, 4, 5)
        out = out.reshape(B, H, W, C)
        if self.shifted:
            out = jnp.roll(out, shift=(w // 2, w // 2), axis=(1, 2))
        return out


class DWConv(nn.Module):
    """3x3 depthwise conv in NHWC. (ref models/dcae.py:300-310)"""
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim = x.shape[-1]
        return Conv(dim, 3, groups=dim, dtype=self.dtype, name="dw")(x)


class ConvolutionalGLU(nn.Module):
    """Gated MLP: fc1 -> split(x, v) -> gelu(DWConv(x)) * v -> fc2.
    hidden = hidden_features // 2. (ref models/dcae.py:312-328)"""
    hidden_features: int
    out_features: Optional[int] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out_dim = self.out_features or x.shape[-1]
        hidden = self.hidden_features // 2
        h = Dense(2 * hidden, dtype=self.dtype, name="fc1")(x)
        g, v = jnp.split(h, 2, axis=-1)
        g = gelu(DWConv(dtype=self.dtype, name="dwconv")(g)) * v
        return Dense(out_dim, dtype=self.dtype, name="fc2")(g)


class Scale(nn.Module):
    """Learnable per-channel residual scale, init 1. (ref :330-336)"""
    dim: int
    init_value: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        s = self.param(
            "scale",
            lambda key, shape: jnp.full(shape, self.init_value, jnp.float32),
            (self.dim,))
        return x * s.astype(x.dtype)


class ResScaleConvolutionGateBlock(nn.Module):
    """Transformer block: x = rs1(x) + WMSA(LN x); x = rs2(x) + GLU(LN x).
    (ref models/dcae.py:338-357; drop_path is 0 in every reference config)"""
    head_dim: int
    window_size: int
    shifted: bool = False
    dtype: Optional[Dtype] = None
    pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim = x.shape[-1]
        # v4 fused attention HALF-BLOCK (LN1 + windowing + WMSA + proj +
        # res-scale residual in ONE kernel, ops/pallas/wmsa_v4.py): removes
        # the LN materialization, the window transpose on both sides, and
        # the residual pass that v3 left as HBM round trips around the
        # opaque pallas_call. Param tree unchanged (modules declared below
        # for init; variables read at apply). DCAE_PALLAS_V4=0 falls back
        # to v3 (LN in XLA + fused attention).
        env = os.environ.get("DCAE_PALLAS")
        pallas_on = self.pallas if env is None else env == "1"
        use_v4 = (pallas_on and self.window_size == 8
                  and not self.is_initializing()
                  and os.environ.get("DCAE_PALLAS_V4", "1") == "1")
        if use_v4:
            from dcae_tpu.ops.pallas.wmsa_v4 import wmsa_block_v4_trainable

            p = self.variables["params"]
            lnp = p["ln1"]["ln"]
            msa = p["msa"]
            heads = dim // self.head_dim
            x = wmsa_block_v4_trainable(
                x, lnp["scale"], lnp["bias"], p["res_scale_1"]["scale"],
                msa["qkv_kernel"], msa["qkv_bias"], msa["proj_kernel"],
                msa["proj_bias"], msa["relative_position"],
                window=self.window_size, heads=heads, shifted=self.shifted,
                interpret=pallas_interpret()).astype(x.dtype)
        else:
            h = LayerNorm(dtype=self.dtype, name="ln1")(x)
            h = WMSA(self.head_dim, self.window_size, self.shifted,
                     dtype=self.dtype, pallas=self.pallas, name="msa")(h)
            x = Scale(dim, name="res_scale_1")(x) + h

        # fused LN2+GLU Pallas kernel (VMEM-resident fc1/dwconv/gate/fc2 —
        # the GLU's 2h-wide intermediates are the largest non-attention HBM
        # traffic). Params are declared by the module path during init and
        # read through self.variables at apply time, so the parameter tree
        # (and every existing checkpoint) is unchanged.
        from dcae_tpu.ops.pallas.conv_glu import conv_glu_trainable, supported

        env = os.environ.get("DCAE_PALLAS")
        use_pallas = (self.pallas if env is None else env == "1") \
            and not self.is_initializing() \
            and supported(x.shape[1], x.shape[2], dim, dim * 2)
        if use_pallas:
            p = self.variables["params"]
            lnp, mlp = p["ln2"]["ln"], p["mlp"]
            dwk = mlp["dwconv"]["dw"]["conv"]["kernel"]
            h = conv_glu_trainable(
                x, lnp["scale"], lnp["bias"],
                mlp["fc1"]["dense"]["kernel"], mlp["fc1"]["dense"]["bias"],
                dwk.reshape(3, 3, -1), mlp["dwconv"]["dw"]["conv"]["bias"],
                mlp["fc2"]["dense"]["kernel"], mlp["fc2"]["dense"]["bias"],
                apply_ln=True, interpret=pallas_interpret()).astype(x.dtype)
        else:
            h = LayerNorm(dtype=self.dtype, name="ln2")(x)
            h = ConvolutionalGLU(dim * 4, dtype=self.dtype, name="mlp")(h)
        return Scale(dim, name="res_scale_2")(x) + h


class SwinPair(nn.Module):
    """One (W, SW) block pair — the scan body of deep Swin stages."""
    head_dim: int
    window_size: int
    dtype: Optional[Dtype] = None
    pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, _):
        x = ResScaleConvolutionGateBlock(
            self.head_dim, self.window_size, shifted=False, dtype=self.dtype,
            pallas=self.pallas, name="w")(x)
        x = ResScaleConvolutionGateBlock(
            self.head_dim, self.window_size, shifted=True, dtype=self.dtype,
            pallas=self.pallas, name="sw")(x)
        return x, None


class SwinStack(nn.Module):
    """block_num alternating W/SW blocks + trailing 3x3 conv, residual.
    (ref SwinBlockWithConvMulti, models/dcae.py:359-383)

    Deep stages (block_num >= 4, even) run as a lax.scan over (W, SW) pairs
    with stacked per-pair params — one compiled body instead of 12 traced
    blocks (the reference's 12-deep stage is the compile-time hot spot).

    Inputs smaller than the window are center-padded up to a window multiple
    and cropped back (the reference pads but never crops — a latent quirk
    its configs never hit; we keep shapes invariant instead).
    """
    head_dim: int
    window_size: int
    block_num: int
    dtype: Optional[Dtype] = None
    pallas: bool = False
    unroll: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        w = self.window_size
        pad_h = (-H) % w
        pad_w = (-W) % w
        t = x
        if pad_h or pad_w:
            t = jnp.pad(t, ((0, 0), (pad_h // 2, pad_h - pad_h // 2),
                            (pad_w // 2, pad_w - pad_w // 2), (0, 0)))
        if self.block_num >= 4 and self.block_num % 2 == 0:
            scan = nn.scan(SwinPair,
                           variable_axes={"params": 0},
                           split_rngs={"params": True},
                           length=self.block_num // 2,
                           unroll=self.block_num // 2 if self.unroll else 1)
            t, _ = scan(self.head_dim, w, dtype=self.dtype,
                        pallas=self.pallas, name="pairs")(t, None)
        else:
            for i in range(self.block_num):
                t = ResScaleConvolutionGateBlock(
                    self.head_dim, w, shifted=(i % 2 == 1), dtype=self.dtype,
                    pallas=self.pallas, name=f"block{i}")(t)
        if pad_h or pad_w:
            t = t[:, pad_h // 2: pad_h // 2 + H,
                  pad_w // 2: pad_w // 2 + W, :]
        t = Conv(C, 3, dtype=self.dtype, name="conv")(t)
        return t + x
