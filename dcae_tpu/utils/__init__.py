"""Diagnostics, metrics, checkpointing, conversion (L8)."""

from dcae_tpu.utils import checkpoint, convert, metrics

__all__ = ["checkpoint", "convert", "metrics"]
