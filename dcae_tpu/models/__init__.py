"""Model layer (L2)."""

from dcae_tpu.models.codec import DCAECodec
from dcae_tpu.models.dcae import DCAE
from dcae_tpu.models.transforms import (
    GAnalysis,
    GSynthesis,
    HyperAnalysis,
    HyperSynthesis,
    SliceNet,
)

__all__ = [
    "DCAE", "DCAECodec",
    "GAnalysis", "GSynthesis", "HyperAnalysis", "HyperSynthesis", "SliceNet",
]
