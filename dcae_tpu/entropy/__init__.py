"""Entropy-model layer: likelihoods on TPU, integer tables + rANS on host."""

from dcae_tpu.entropy import gaussian, ops, rans, tables
from dcae_tpu.entropy.bottleneck import EntropyBottleneck
from dcae_tpu.entropy.tables import CdfTable, CodecTables

__all__ = [
    "gaussian", "ops", "rans", "tables",
    "EntropyBottleneck", "CdfTable", "CodecTables",
]
