"""Training observability: JSONL metric logs + optional TensorBoard/wandb.

The reference logs to TensorBoard (test_loss, /root/reference/train.py:401)
and wandb with train/val + val_real namespaces (train_5.py:3358-3446).
Here the always-on sink is a JSONL file (machine-readable, no deps);
TensorBoard and wandb attach automatically when their packages exist.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, log_dir: str, run_name: str = "train",
                 use_wandb: bool = False, wandb_config: Optional[Dict] = None):
        os.makedirs(log_dir, exist_ok=True)
        self._path = os.path.join(log_dir, f"{run_name}.jsonl")
        self._file = open(self._path, "a")
        self._t0 = time.time()

        self._tb = None
        try:  # optional TensorBoard
            from flax.metrics import tensorboard

            self._tb = tensorboard.SummaryWriter(
                os.path.join(log_dir, "tb"))
        except Exception:
            self._tb = None

        self._wandb = None
        if use_wandb:
            try:  # optional wandb
                import wandb

                self._wandb = wandb.init(project="dcae-tpu",
                                         name=run_name,
                                         config=wandb_config or {})
            except Exception:
                self._wandb = None

    def log(self, step: int, metrics: Dict[str, float],
            namespace: str = "train") -> None:
        record = {"step": int(step), "t": round(time.time() - self._t0, 3),
                  "ns": namespace}
        record.update({k: float(v) for k, v in metrics.items()})
        self._file.write(json.dumps(record) + "\n")
        self._file.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.scalar(f"{namespace}/{k}", float(v), step)
        if self._wandb is not None:
            self._wandb.log({f"{namespace}/{k}": float(v)
                             for k, v in metrics.items()}, step=int(step))

    def close(self) -> None:
        self._file.close()
        if self._tb is not None:
            self._tb.flush()
        if self._wandb is not None:
            self._wandb.finish()
