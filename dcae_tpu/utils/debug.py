"""Diagnostics (L8): tensor dump/compare harness for cross-device drift
hunting.

Parity with the reference's hand harnesses (/root/reference/debug.py:162-313,
check.py): dump every intermediate of a codec run per device/tag, then diff
two dump sets tensor-by-tensor (max abs/rel error, first mismatch). The
reference used this to chase CPU-vs-GPU entropy desync; here it doubles as a
regression harness for fused-vs-staged encoder agreement and cross-backend
(CPU vs TPU) comparisons.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np


class TensorDump:
    """Append-only store of named arrays for one run/device tag."""

    def __init__(self, root: str, tag: str):
        self.dir = os.path.join(root, tag)
        os.makedirs(self.dir, exist_ok=True)
        self._order: List[str] = []

    def add(self, name: str, value) -> None:
        arr = np.asarray(value)
        np.save(os.path.join(self.dir, f"{name}.npy"), arr)
        self._order.append(name)

    def add_bytes(self, name: str, data: bytes) -> None:
        with open(os.path.join(self.dir, f"{name}.bin"), "wb") as f:
            f.write(data)
        self._order.append(name)

    def finish(self) -> None:
        with open(os.path.join(self.dir, "manifest.json"), "w") as f:
            json.dump(self._order, f)


def dump_codec_run(codec, x, root: str, tag: str) -> TensorDump:
    """Run the staged encoder, dumping every intermediate the reference's
    debug.py captured (y, z symbols, indexes, mu, strings)."""
    import jax
    import jax.numpy as jnp

    d = TensorDump(root, tag)
    x = jnp.asarray(x, jnp.float32)
    y, z_narrow, z_hat = codec._analyze(codec.params, x)
    z_sym = z_narrow["z_symbols"]
    d.add("y", y)
    d.add("z_symbols", z_sym)
    d.add("z_hat", z_hat)
    st = jnp.asarray(codec._scale_table)
    ls, lm, support, mu, idx = codec._start(codec.params, z_hat, st)
    d.add("latent_scales", ls)
    d.add("latent_means", lm)
    y_np = np.asarray(jax.device_get(y))
    sd = codec.cfg.slice_dim
    y_hat = jnp.zeros((y_np.shape[0], y_np.shape[1], y_np.shape[2], 0),
                      jnp.float32)
    symbols = None
    for i in range(codec.cfg.num_slices):
        if i > 0:
            y_hat, support, mu, idx = codec._step(
                i, codec.params, ls, lm, y_hat, support, mu,
                jnp.asarray(symbols, jnp.float32), st)
        mu_np = np.asarray(jax.device_get(mu))
        d.add(f"mu_{i}", mu_np)
        idx_np = np.asarray(jax.device_get(idx))
        from dcae_tpu.models.codec import maybe_unpack_idx6
        idx_np = maybe_unpack_idx6(idx_np, sd)
        d.add(f"indexes_{i}", idx_np)
        symbols = np.round(
            y_np[..., i * sd: (i + 1) * sd] - mu_np).astype(np.int32)
        d.add(f"symbols_{i}", symbols)
    enc = codec.compress(x)
    d.add_bytes("y_string", enc["strings"][0][0])
    d.add_bytes("z_string", enc["strings"][1][0])
    d.finish()
    return d


def compare_dumps(root: str, tag_a: str, tag_b: str,
                  atol: float = 0.0) -> Dict[str, dict]:
    """Diff two dump sets. Returns {name: {max_abs, max_rel, equal,
    first_mismatch}} for arrays and byte-equality for .bin payloads."""
    dir_a = os.path.join(root, tag_a)
    dir_b = os.path.join(root, tag_b)
    report: Dict[str, dict] = {}
    for fname in sorted(os.listdir(dir_a)):
        path_b = os.path.join(dir_b, fname)
        if not os.path.exists(path_b):
            report[fname] = {"missing_in": tag_b}
            continue
        if fname.endswith(".npy"):
            a = np.load(os.path.join(dir_a, fname))
            b = np.load(path_b)
            if a.shape != b.shape:
                report[fname] = {"shape_mismatch": [a.shape, b.shape]}
                continue
            diff = np.abs(a.astype(np.float64) - b.astype(np.float64))
            max_abs = float(diff.max()) if diff.size else 0.0
            denom = np.maximum(np.abs(a), 1e-12)
            max_rel = float((diff / denom).max()) if diff.size else 0.0
            entry = {"max_abs": max_abs, "max_rel": max_rel,
                     "equal": bool(max_abs <= atol)}
            if max_abs > atol and diff.size:
                idx = np.unravel_index(int(np.argmax(diff)), diff.shape)
                entry["first_mismatch"] = {
                    "index": [int(i) for i in idx],
                    "a": float(a[idx]), "b": float(b[idx])}
            report[fname] = entry
        elif fname.endswith(".bin"):
            with open(os.path.join(dir_a, fname), "rb") as f:
                da = f.read()
            with open(path_b, "rb") as f:
                db = f.read()
            report[fname] = {"equal": da == db,
                             "len": [len(da), len(db)]}
    return report


def print_report(report: Dict[str, dict]) -> bool:
    """Human-readable diff summary; returns True when everything matches."""
    ok = True
    for name, entry in report.items():
        if entry.get("equal"):
            print(f"  {name}: OK")
        else:
            ok = False
            print(f"  {name}: MISMATCH {entry}")
    return ok
