"""NN block library (L1)."""

from dcae_tpu.ops import blocks, dictionary, layers
from dcae_tpu.ops.blocks import (
    ConvolutionalGLU,
    ResidualBottleneckBlock,
    ResidualBottleneckBlockWithStride,
    ResidualBottleneckBlockWithUpsample,
    ResScaleConvolutionGateBlock,
    Scale,
    SwinStack,
    WMSA,
)
from dcae_tpu.ops.dictionary import DictionaryCrossAttention, MultiScaleAggregation
from dcae_tpu.ops.layers import Conv, Deconv, Dense, LayerNorm, crop_spatial, pad_spatial

__all__ = [
    "blocks", "dictionary", "layers",
    "Conv", "Deconv", "Dense", "LayerNorm", "pad_spatial", "crop_spatial",
    "ResidualBottleneckBlock", "ResidualBottleneckBlockWithStride",
    "ResidualBottleneckBlockWithUpsample", "WMSA", "ConvolutionalGLU",
    "Scale", "ResScaleConvolutionGateBlock", "SwinStack",
    "DictionaryCrossAttention", "MultiScaleAggregation",
]
