"""Multi-lambda RD-curve regression (VERDICT round-2 item 3, slow):
training the tiny config at two lambdas must produce a monotone RD curve
(higher lambda -> more bits, higher PSNR from the real entropy-coded
val_real hook), and the BD-rate machinery must run end-to-end on the
measured points. Full 3-lambda sweep: docs/RD_VALIDATION.md.

Ref: the reference's published 6-lambda protocol (RD_data.json:2-17,
train.py's --lmbda grid)."""

import json
import os
import sys

import numpy as np
import pytest

LAMBDAS = (0.0018, 0.05)  # extremes of the reference's MSE grid


@pytest.mark.slow
def test_two_lambda_rd_monotone_and_bd_rate(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    import validate_training as vt

    data = str(tmp_path / "data")
    vt.make_dataset(data, n_train=48, n_test=8, size=128)

    from dcae_tpu.config import DCAEConfig
    from dcae_tpu.data import rd_reference
    from dcae_tpu.train.loop import TrainOptions, run_training

    points = {}
    for lmbda in LAMBDAS:
        save = str(tmp_path / f"run_{lmbda}")
        opts = TrainOptions(
            dataset=data, epochs=4, batch_size=8, test_batch_size=8,
            patch_size=64, lmbda=lmbda, learning_rate=1e-4, lr_epochs=(4,),
            save_path=save, save=False, log_every=4, val_real_every=4,
            val_real_images=4, num_workers=2)
        run_training(opts, cfg=DCAEConfig.tiny())
        recs = [json.loads(ln)
                for ln in open(os.path.join(save, "train.jsonl"))]
        vr = [r for r in recs if r["ns"] == "val_real"][-1]
        assert np.isfinite(vr["bpp"]) and np.isfinite(vr["psnr"])
        points[lmbda] = (vr["bpp"], vr["psnr"])

    # rate monotone in lambda: a larger distortion weight buys more bits
    assert points[LAMBDAS[1]][0] > points[LAMBDAS[0]][0], points

    # BD-rate machinery end-to-end on the measured curve: the same curve
    # with 20% more bits at equal quality must read as ~+20% BD-rate
    bpp = np.array([points[la][0] for la in LAMBDAS])
    psnr = np.array([points[la][1] for la in LAMBDAS])
    assert psnr[1] != psnr[0], points  # overlap interval is non-degenerate
    bd = rd_reference.bd_rate(bpp, psnr, bpp * 1.2, psnr)
    assert abs(bd - 20.0) < 1.0, bd
