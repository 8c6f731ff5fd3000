"""Checkpoint save/load (msgpack pytrees) with the reference's policy.

Reference contract (/root/reference/train.py:283-291,458-511): checkpoint
holds {epoch, state_dict, loss, optimizer, aux_optimizer, lr_scheduler};
files kept: latest, every-5-epochs, best. Here the analogous pytree is
{epoch, params, opt_state, rng, loss}; both optimizers and the schedule live
inside the single optax state. Baked entropy tables are stored alongside
(<path>.tables.npz) so a checkpoint shipped to another machine decodes
bit-exactly without re-baking (the reference's export_checkpoint.py
workflow).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

from dcae_tpu.entropy.tables import CodecTables


def save_checkpoint(path: str, state, epoch: int, loss: float,
                    tables: Optional[CodecTables] = None,
                    extra: Optional[Dict] = None) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = {
        "epoch": epoch,
        "loss": float(loss),
        "state": serialization.to_state_dict(jax.device_get(state)),
        "extra": extra or {},
    }
    data = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    if tables is not None:
        tables.save(path + ".tables.npz")


def load_checkpoint(path: str, state_template) -> Tuple[Any, int, float]:
    """Restore into the shape of state_template. Returns (state, epoch,
    loss)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    state = serialization.from_state_dict(state_template, payload["state"])
    return state, int(payload["epoch"]), float(payload["loss"])


def load_tables(path: str) -> Optional[CodecTables]:
    tp = path + ".tables.npz"
    if os.path.exists(tp):
        return CodecTables.load(tp)
    return None


def load_params_only(path: str, params_template):
    """Restore just the model params (e.g. for eval), tolerating checkpoints
    that carry a full train state."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    state = payload["state"]
    params = state["params"] if "params" in state else state
    return serialization.from_state_dict(params_template, params)


class CheckpointPolicy:
    """latest / every-5-epochs / best files (ref train.py:283-291)."""

    def __init__(self, save_dir: str, prefix: str = ""):
        self.save_dir = save_dir
        self.prefix = prefix
        self.best_loss = float("inf")

    def save(self, state, epoch: int, loss: float,
             tables: Optional[CodecTables] = None) -> None:
        base = os.path.join(self.save_dir, self.prefix)
        save_checkpoint(f"{base}checkpoint_latest.ckpt", state, epoch, loss,
                        tables)
        if epoch % 5 == 0:
            save_checkpoint(f"{base}checkpoint_epoch{epoch}.ckpt", state,
                            epoch, loss, tables)
        if loss < self.best_loss:
            self.best_loss = loss
            save_checkpoint(f"{base}checkpoint_best.ckpt", state, epoch,
                            loss, tables)
