"""Transforms-only autoencoder (no entropy model).

Parity with /root/reference/models/g_a_g_s.py: g_a/g_s pair for transform
pretraining and split CPU-edge/accelerator deployment experiments;
compress() returns the raw latent, decompress() reconstructs;
`from_dcae` imports transform weights from a full DCAE parameter tree.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from dcae_tpu.config import DCAEConfig
from dcae_tpu.models.transforms import GAnalysis, GSynthesis


class SimpleAutoencoder(nn.Module):
    cfg: DCAEConfig
    dtype: Optional[Any] = None

    def setup(self):
        self.g_a = GAnalysis(self.cfg, dtype=self.dtype)
        self.g_s = GSynthesis(self.cfg, dtype=self.dtype)

    def __call__(self, x: jax.Array) -> Dict[str, jax.Array]:
        y = self.g_a(x)
        x_hat = self.g_s(y)
        return {"x_hat": x_hat, "y": y}

    def compress(self, x: jax.Array) -> jax.Array:
        """Image -> raw latent (the split-AE deployment ships this,
        optionally cast to bf16/fp16 — ref eval_g_a_g_s_split.py:596-625)."""
        return self.g_a(x)

    def decompress(self, y: jax.Array) -> jax.Array:
        return jnp.clip(self.g_s(y), 0.0, 1.0)


def params_from_dcae(dcae_params: Dict, strict: bool = False) -> Dict:
    """Extract g_a/g_s subtrees from a full DCAE tree
    (ref g_a_g_s.py load_from_dcae's shape-tolerant import)."""
    out = {}
    for k in ("g_a", "g_s"):
        if k in dcae_params:
            out[k] = dcae_params[k]
        elif strict:
            raise KeyError(k)
    return out


def compression_ratio(cfg: DCAEConfig) -> float:
    """Raw float32 latent vs uint8 pixels (ref g_a_g_s.py:432-454):
    spatial /16^2, channels 3 -> M, dtype x4."""
    return (16 * 16 * cfg.in_channels) / (cfg.M * 4.0)
