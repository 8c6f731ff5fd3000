"""Analysis/synthesis/hyper transforms of the DCAE codec.

Topology parity with /root/reference/models/dcae.py:541-611 (g_a/g_s mirror
stacks of residual-bottleneck resampling units interleaved with window-
attention stages; 3-conv GELU context nets per slice), expressed as NHWC
Flax modules.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax

from dcae_tpu.config import DCAEConfig
from dcae_tpu.ops.blocks import (
    ResidualBottleneckBlockWithStride,
    ResidualBottleneckBlockWithUpsample,
    SwinStack,
)
from dcae_tpu.ops.layers import Conv, Deconv, gelu

Dtype = Any


class GAnalysis(nn.Module):
    """g_a: image -> latent y (x16 downsample). (ref :541-555)"""
    cfg: DCAEConfig
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        f = cfg.feature_dim
        h = ResidualBottleneckBlockWithStride(f[0], dtype=self.dtype,
                                              name="down0")(x)
        h = SwinStack(cfg.head_dim[0], cfg.window_size, cfg.block_num[0],
                      dtype=self.dtype, pallas=cfg.pallas_attention, unroll=cfg.unroll_scan,
                      name="swin1")(h)
        h = ResidualBottleneckBlockWithStride(f[1], dtype=self.dtype,
                                              name="down1")(h)
        h = SwinStack(cfg.head_dim[1], cfg.window_size, cfg.block_num[1],
                      dtype=self.dtype, pallas=cfg.pallas_attention, unroll=cfg.unroll_scan,
                      name="swin2")(h)
        h = ResidualBottleneckBlockWithStride(f[2], dtype=self.dtype,
                                              name="down2")(h)
        h = SwinStack(cfg.head_dim[2], cfg.window_size, cfg.block_num[2],
                      dtype=self.dtype, pallas=cfg.pallas_attention, unroll=cfg.unroll_scan,
                      name="swin3")(h)
        return Conv(cfg.M, 5, stride=2, dtype=self.dtype, name="down3")(h)


class GSynthesis(nn.Module):
    """g_s: latent y_hat -> image (x16 upsample), mirror of g_a.
    (ref :548-558)"""
    cfg: DCAEConfig
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, y: jax.Array) -> jax.Array:
        cfg = self.cfg
        f = cfg.feature_dim
        h = Deconv(f[2], 5, 2, dtype=self.dtype, name="up0")(y)
        h = SwinStack(cfg.head_dim[3], cfg.window_size, cfg.block_num[2],
                      dtype=self.dtype, pallas=cfg.pallas_attention, unroll=cfg.unroll_scan,
                      name="swin1")(h)
        h = ResidualBottleneckBlockWithUpsample(f[1], dtype=self.dtype,
                                                name="up1")(h)
        h = SwinStack(cfg.head_dim[4], cfg.window_size, cfg.block_num[1],
                      dtype=self.dtype, pallas=cfg.pallas_attention, unroll=cfg.unroll_scan,
                      name="swin2")(h)
        h = ResidualBottleneckBlockWithUpsample(f[0], dtype=self.dtype,
                                                name="up2")(h)
        h = SwinStack(cfg.head_dim[5], cfg.window_size, cfg.block_num[0],
                      dtype=self.dtype, pallas=cfg.pallas_attention, unroll=cfg.unroll_scan,
                      name="swin3")(h)
        return ResidualBottleneckBlockWithUpsample(
            cfg.out_channels, dtype=self.dtype, name="up3")(h)


class HyperAnalysis(nn.Module):
    """h_a: y -> z (x4 further downsample). (ref :560-566)"""
    cfg: DCAEConfig
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, y: jax.Array) -> jax.Array:
        cfg = self.cfg
        h = ResidualBottleneckBlockWithStride(cfg.N, dtype=self.dtype,
                                              name="down0")(y)
        h = SwinStack(cfg.hyper_head_dim, cfg.hyper_window_size, 1,
                      dtype=self.dtype, name="swin")(h)
        return Conv(cfg.eb_channels, 3, stride=2, dtype=self.dtype,
                    name="down1")(h)


class HyperSynthesis(nn.Module):
    """h_z_s1/h_z_s2 head: z_hat -> latent prior map (x4 upsample).
    (ref :568-582)"""
    cfg: DCAEConfig
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, z_hat: jax.Array) -> jax.Array:
        cfg = self.cfg
        h = Deconv(cfg.N, 3, 2, dtype=self.dtype, name="up0")(z_hat)
        h = SwinStack(cfg.hyper_head_dim, cfg.hyper_window_size, 1,
                      dtype=self.dtype, name="swin")(h)
        return ResidualBottleneckBlockWithUpsample(
            cfg.M, dtype=self.dtype, name="up1")(h)


class SliceNet(nn.Module):
    """3-conv GELU context net (cc_mean / cc_scale / lrp). (ref :584-611)"""
    cfg: DCAEConfig
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, support: jax.Array) -> jax.Array:
        cfg = self.cfg
        h1, h2 = cfg.cc_hidden
        h = Conv(h1, 3, dtype=self.dtype, name="conv0")(support)
        h = gelu(h)
        h = Conv(h2, 3, dtype=self.dtype, name="conv1")(h)
        h = gelu(h)
        return Conv(cfg.slice_dim, 3, dtype=self.dtype, name="conv2")(h)
