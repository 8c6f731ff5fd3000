"""Split-codec deployment: encoder-only and decoder-only halves.

The reference fork maintains duplicated CompressModel/DecompressModel classes
with a ParameterSync machine copying shared weights between them every few
steps (/root/reference/models/dcae_5.py:1967-2113, dcae_7.py:443-771,
train_5.py:3299-3302). Here there is ONE parameter tree and one jitted
program per codec stage, so the halves cannot drift apart — weight "tying"
and "sync" are identities by construction. What remains of the reference's
machinery, preserved for deployment parity:

  * partition helpers: which subtrees an encoder vs decoder machine needs
    (ship half the 119M params to each side);
  * ParameterSync.save/load_shared_parameters — shared-subtree checkpoint
    shipping (API parity, SURVEY.md §8);
  * SplitCompressor / SplitDecompressor — thin role-restricted wrappers over
    the codec driver holding only their half of the tree; entropy tables are
    baked once and shipped with the encoder half (the "master tables win"
    rule of rpc/eval_rpc.py:331-375 is then automatic).

Drift robustness (DriftSimulator) is cfg.drift_noise on the joint model; the
bitstream interface between halves is integer, so decoded outputs cannot
diverge across devices at all.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
from flax import serialization

from dcae_tpu.config import DCAEConfig
from dcae_tpu.entropy.tables import CodecTables
from dcae_tpu.models.codec import DCAECodec

COMPRESS_ONLY = ("g_a", "h_a")
DECOMPRESS_ONLY = ("g_s",)


def shared_param_keys(params: Dict) -> Tuple[str, ...]:
    """Top-level parameter names common to both halves (hyper-decoders,
    dictionary + cross-attention, context nets, entropy models)."""
    reserved = set(COMPRESS_ONLY) | set(DECOMPRESS_ONLY)
    return tuple(k for k in params if k not in reserved)


def compress_params(params: Dict) -> Dict:
    """Subtree an encoder machine needs."""
    keep = set(COMPRESS_ONLY) | set(shared_param_keys(params))
    return {k: v for k, v in params.items() if k in keep}


def decompress_params(params: Dict) -> Dict:
    """Subtree a decoder machine needs."""
    keep = set(DECOMPRESS_ONLY) | set(shared_param_keys(params))
    return {k: v for k, v in params.items() if k in keep}


class ParameterSync:
    """Shared-subtree shipping (API parity with the reference's
    ParameterSync; the in-process 'sync' direction methods are identities
    here because there is one tree)."""

    @staticmethod
    def extract_shared(params: Dict) -> Dict:
        return {k: params[k] for k in shared_param_keys(params)}

    @staticmethod
    def inject_shared(params: Dict, shared: Dict) -> Dict:
        out = dict(params)
        out.update(shared)
        return out

    @staticmethod
    def save_shared_parameters(params: Dict, path: str) -> None:
        import jax
        payload = serialization.msgpack_serialize(
            serialization.to_state_dict(
                jax.device_get(ParameterSync.extract_shared(params))))
        with open(path, "wb") as f:
            f.write(payload)

    @staticmethod
    def load_shared_parameters(params: Dict, path: str) -> Dict:
        with open(path, "rb") as f:
            shared_sd = serialization.msgpack_restore(f.read())
        template = ParameterSync.extract_shared(params)
        shared = serialization.from_state_dict(template, shared_sd)
        return ParameterSync.inject_shared(params, shared)


class SplitCompressor:
    """Encoder half: holds g_a/h_a + shared params and baked tables."""

    def __init__(self, cfg: DCAEConfig, params: Dict,
                 tables: Optional[CodecTables] = None, device=None):
        self._codec = DCAECodec(cfg, params=compress_params(params),
                                tables=tables, device=device)
        if tables is None:
            self._codec.update(force=True)

    @property
    def tables(self) -> CodecTables:
        return self._codec.tables

    def compress(self, x) -> dict:
        return self._codec.compress(x)


class SplitDecompressor:
    """Decoder half: holds g_s + shared params; tables come from the
    encoder side (single source of truth)."""

    def __init__(self, cfg: DCAEConfig, params: Dict, tables: CodecTables,
                 device=None):
        self._codec = DCAECodec(cfg, params=decompress_params(params),
                                tables=tables, device=device)

    def decompress(self, strings, shape) -> dict:
        return self._codec.decompress(strings, shape)


def make_split_pair(cfg: DCAEConfig, params: Dict
                    ) -> Tuple[SplitCompressor, SplitDecompressor]:
    enc = SplitCompressor(cfg, params)
    dec = SplitDecompressor(cfg, params, enc.tables)
    return enc, dec
