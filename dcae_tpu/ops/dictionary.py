"""Dictionary-based cross-attention entropy-model blocks (the paper's core).

A learnable dictionary (128 x 640) is queried per channel-AR slice by
multi-head cross-attention: Q comes from the slice's context feature map,
K from the LayerNormed dictionary, V is the (normed) dictionary itself, with
a learnable per-head temperature. Preceded by a multi-scale aggregation
(dense depthwise convs + CBAM-style spatial gate) and followed by a gated
conv MLP. (ref /root/reference/models/dcae.py:386-509)

NHWC; the dictionary attention is a pair of (HW x n) matmuls per head — MXU
work batched over heads, no data-dependent shapes.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from dcae_tpu.ops.blocks import ConvolutionalGLU, Scale, pallas_interpret
from dcae_tpu.ops.layers import Conv, Dense, LayerNorm, gelu

Dtype = Any


class SpatialAttentionModule(nn.Module):
    """sigmoid(conv7x7(cat(mean_c, max_c))) spatial gate. (ref :386-397)"""
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        h = jnp.concatenate([avg, mx], axis=-1)
        h = Conv(1, 7, use_bias=False, dtype=self.dtype, name="conv")(h)
        return jax.nn.sigmoid(h)


class ConvWithDW(nn.Module):
    """1x1 -> gelu -> dw3x3 -> gelu -> 1x1. (ref :399-414)"""
    out_dim: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = Conv(self.out_dim, 1, dtype=self.dtype, name="in_trans")(x)
        h = gelu(h)
        h = Conv(self.out_dim, 3, groups=self.out_dim, dtype=self.dtype,
                 name="dw_conv")(h)
        h = gelu(h)
        return Conv(self.out_dim, 1, dtype=self.dtype, name="out_trans")(h)


class DenseBlock(nn.Module):
    """3 gelu+ConvWithDW layers with dense concatenation, 1x1 projection.
    (ref :416-433)"""
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim = x.shape[-1]
        outputs = [x]
        for i in range(3):
            h = gelu(outputs[-1])
            h = ConvWithDW(dim, dtype=self.dtype, name=f"layer{i}")(h)
            outputs.append(h)
        cat = jnp.concatenate(outputs, axis=-1)
        return Conv(dim, 1, dtype=self.dtype, name="proj")(cat)


class MultiScaleAggregation(nn.Module):
    """1x1 -> DenseBlock -> x spatial attention. (ref :435-448)"""
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim = x.shape[-1]
        s = Conv(dim, 1, dtype=self.dtype, name="s")(x)
        s_out = DenseBlock(dtype=self.dtype, name="dense")(s)
        gate = SpatialAttentionModule(dtype=self.dtype, name="spatial")(s_out)
        return s_out * gate


class DictionaryCrossAttention(nn.Module):
    """MutiScaleDictionaryCrossAttentionGLU. (ref :450-509)

    query: (B, H, W, C_query) slice context; dt: (n, dict_dim) dictionary.
    Returns (B, H, W, output_dim).
    """
    output_dim: int
    head_num: int = 20
    head_dim: int = 32
    mlp_rate: int = 4
    qkv_bias: bool = True
    dtype: Optional[Dtype] = None
    pallas: bool = False

    @nn.compact
    def __call__(self, query: jax.Array, dt: jax.Array) -> jax.Array:
        d = self.head_num * self.head_dim
        B, H, W, _ = query.shape

        x = Dense(d, use_bias=self.qkv_bias, dtype=self.dtype,
                  name="x_trans")(query)
        h = LayerNorm(dtype=self.dtype, name="ln_scale")(x)
        h = MultiScaleAggregation(dtype=self.dtype, name="msa")(h)
        x = h + Scale(d, name="res_scale_1")(x)

        shortcut = x
        q = LayerNorm(dtype=self.dtype, name="lnx")(x)
        q = Dense(d, use_bias=self.qkv_bias, dtype=self.dtype,
                  name="q_trans")(q)
        # head-major channel split: channel = head*head_dim + c
        q = q.reshape(B, H * W, self.head_num, self.head_dim)

        dt_n = LayerNorm(dtype=self.dtype, name="dict_ln")(dt)
        k = Dense(d, use_bias=self.qkv_bias, dtype=self.dtype,
                  name="k")(dt_n)
        k = k.reshape(-1, self.head_num, self.head_dim)
        v = dt_n.reshape(-1, self.head_num, self.head_dim)

        temp = self.param(
            "scale", lambda key, shape: jnp.ones(shape, jnp.float32),
            (self.head_num, 1, 1))

        sim = jnp.einsum("bpec,nec->bepn", q, k,
                         preferred_element_type=jnp.float32)
        sim = sim * temp[None].astype(sim.dtype)
        probs = jax.nn.softmax(sim, axis=-1).astype(q.dtype)
        out = jnp.einsum("bepn,nec->bpec", probs, v,
                         preferred_element_type=jnp.float32)
        out = out.astype(q.dtype).reshape(B, H, W, d)

        out = Dense(d, use_bias=self.qkv_bias, dtype=self.dtype,
                    name="linear")(out) + Scale(d, name="res_scale_2")(
                        shortcut)

        # fused LN+GLU Pallas kernel (same fusion as the Swin blocks',
        # ops/blocks.py). Bit-safety note: the entropy side must reproduce
        # mu/sigma bitwise across the encoder and decoder *programs*; a
        # pallas_call is an opaque custom call XLA cannot re-fuse, so with
        # identical shapes both programs run the identical kernel — unlike
        # bf16 XLA fusion, this path is cross-program deterministic (and
        # self_check gates the codec regardless).
        from dcae_tpu.ops.pallas.conv_glu import conv_glu_trainable, supported

        env = os.environ.get("DCAE_PALLAS")
        use_pallas = (self.pallas if env is None else env == "1") \
            and os.environ.get("DCAE_DCA_PALLAS") != "0" \
            and not self.is_initializing() \
            and supported(H, W, d, self.mlp_rate * d // 2)
        if use_pallas:
            p = self.variables["params"]
            lnp, mlp = p["ln_mlp"]["ln"], p["mlp"]
            dwk = mlp["dwconv"]["dw"]["conv"]["kernel"]
            h = conv_glu_trainable(
                out, lnp["scale"], lnp["bias"],
                mlp["fc1"]["dense"]["kernel"], mlp["fc1"]["dense"]["bias"],
                dwk.reshape(3, 3, -1), mlp["dwconv"]["dw"]["conv"]["bias"],
                mlp["fc2"]["dense"]["kernel"], mlp["fc2"]["dense"]["bias"],
                apply_ln=True,
                interpret=pallas_interpret()).astype(out.dtype)
        else:
            h = LayerNorm(dtype=self.dtype, name="ln_mlp")(out)
            h = ConvolutionalGLU(self.mlp_rate * d, dtype=self.dtype,
                                 name="mlp")(h)
        out = h + Scale(d, name="res_scale_3")(out)
        return Dense(self.output_dim, dtype=self.dtype,
                     name="output_trans")(out)
