"""Primitive layers: NHWC conv/deconv with reference-compatible geometry.

Everything runs in NHWC (TPU-native layout). Convolutions use explicit
symmetric padding k//2 to match the reference geometry (torch
Conv2d(padding=k//2), /root/reference/models/dcae.py:31-52) rather than XLA
'SAME', whose tap alignment differs for stride-2. Transposed convs use the
input-dilation formulation with padding (k-1-p, k-1-p + (s-1)) which is the
exact equivalent of torch ConvTranspose2d(padding=k//2,
output_padding=stride-1): out = in * stride.

Initializers reproduce torch defaults (kaiming-uniform a=sqrt(5), i.e.
U(-1/sqrt(fan_in), 1/sqrt(fan_in))) so training dynamics are comparable.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def fan_in_uniform(fan_in: int) -> Callable:
    """U(-1/sqrt(fan_in), +1/sqrt(fan_in)) — torch's conv/linear default."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def trunc_normal(std: float = 0.02) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)

    return init


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU, matching torch nn.GELU's default."""
    return jax.nn.gelu(x, approximate=False)


class Conv(nn.Module):
    """NHWC conv, torch-style geometry: padding=k//2 both sides."""
    features: int
    kernel_size: int = 5
    stride: int = 1
    groups: int = 1
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size
        p = k // 2
        in_ch = x.shape[-1]
        fan_in = (in_ch // self.groups) * k * k
        return nn.Conv(
            features=self.features,
            kernel_size=(k, k),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=fan_in_uniform(fan_in),
            bias_init=fan_in_uniform(fan_in),
            dtype=self.dtype,
            name="conv",
        )(x)


class Deconv(nn.Module):
    """NHWC transposed conv ≡ torch ConvTranspose2d(k, s, padding=k//2,
    output_padding=s-1): upsamples exactly by s."""
    features: int
    kernel_size: int = 5
    stride: int = 2
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k, s = self.kernel_size, self.stride
        p = k // 2
        in_ch = x.shape[-1]
        # torch ConvTranspose2d default init counts fan_in over the *output*
        # channel axis of its (in, out, k, k) weight.
        fan_in = self.features * k * k
        kernel = self.param("kernel", fan_in_uniform(fan_in),
                            (k, k, in_ch, self.features))
        dtype = self.dtype or x.dtype
        pad = (k - 1 - p, k - 1 - p + (s - 1))
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), kernel.astype(dtype),
            window_strides=(1, 1),
            padding=(pad, pad),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", fan_in_uniform(fan_in),
                              (self.features,))
            y = y + bias.astype(dtype)
        return y


class Dense(nn.Module):
    """Linear with torch default init."""
    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        fan_in = x.shape[-1]
        return nn.Dense(
            features=self.features,
            use_bias=self.use_bias,
            kernel_init=fan_in_uniform(fan_in),
            bias_init=fan_in_uniform(fan_in),
            dtype=self.dtype,
            name="dense",
        )(x)


class LayerNorm(nn.Module):
    """LayerNorm over the trailing axis, torch eps (1e-5)."""
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln")(x)


def pad_spatial(x: jax.Array, multiple: int,
                mode: str = "constant") -> Tuple[jax.Array, Tuple[int, ...]]:
    """Center-pad NHWC H,W up to a multiple; returns (padded, (l,r,t,b))
    matching the reference eval protocol (/root/reference/eval_1.py:45-59)."""
    h, w = x.shape[1], x.shape[2]
    new_h = -(-h // multiple) * multiple
    new_w = -(-w // multiple) * multiple
    t = (new_h - h) // 2
    b = new_h - h - t
    l = (new_w - w) // 2
    r = new_w - w - l
    padded = jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode=mode)
    return padded, (l, r, t, b)


def crop_spatial(x: jax.Array, padding: Sequence[int]) -> jax.Array:
    l, r, t, b = padding
    return x[:, t: x.shape[1] - b, l: x.shape[2] - r, :]
