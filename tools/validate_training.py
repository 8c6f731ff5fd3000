"""Training-convergence validation (round-1 verdict item 4).

Generates a small synthetic-but-compressible image set, trains the codec
for a few epochs, and checks the properties the reference recipe relies on
(ref /root/reference/train.py:154-205, train_5.py:3029-3067):

  1. RD loss and bpp fall;
  2. the aux (quantile) loss converges toward 0 under the plain dual-Adam
     (the question behind the reference's ExponentialTargetScheduler);
  3. real entropy-coded bpp after training beats the untrained codec's.

Writes <save_path>/train.jsonl (per-step metrics) and prints a summary.
Usage:
    python tools/validate_training.py [--steps-per-epoch via dataset size]
        [--epochs 8] [--tiny/--full] [--data DIR (generated if absent)]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np


def synth_image(rng: np.random.Generator, size: int = 256) -> np.ndarray:
    """Structured, compressible content: gradients + block patterns +
    rectangles + mild noise (natural-image-ish spectra, not white noise)."""
    h = w = size
    yy, xx = np.mgrid[0:h, 0:w] / size
    img = np.stack([
        0.5 + 0.5 * np.sin(2 * np.pi * (rng.uniform(0.5, 2) * xx
                                        + rng.uniform(0, 1))),
        0.5 + 0.5 * np.sin(2 * np.pi * (rng.uniform(0.5, 2) * yy
                                        + rng.uniform(0, 1))),
        0.5 * (xx + yy),
    ], axis=-1)
    # coarse block texture
    blocks = rng.uniform(0, 1, (8, 8, 3))
    img = 0.6 * img + 0.4 * np.kron(blocks, np.ones((size // 8, size // 8,
                                                     1)))
    # random soft rectangles
    for _ in range(6):
        t, l = rng.integers(0, h - 32, 2)
        bh, bw = rng.integers(16, 96, 2)
        img[t:t + bh, l:l + bw] = (0.7 * img[t:t + bh, l:l + bw]
                                   + 0.3 * rng.uniform(0, 1, 3))
    img += rng.normal(0, 0.01, img.shape)
    return np.clip(img, 0, 1).astype(np.float32)


def make_dataset(root: str, n_train: int = 200, n_test: int = 16,
                 size: int = 256, seed: int = 0) -> None:
    from PIL import Image

    rng = np.random.default_rng(seed)
    for split, n in (("train", n_train), ("test", n_test)):
        d = os.path.join(root, split)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            arr = (synth_image(rng, size) * 255).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"{i:04d}.png"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/dcae_synth")
    ap.add_argument("--save_path", default="/tmp/dcae_train_validation")
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--patch-size", type=int, default=128)
    ap.add_argument("--lmbda", type=float, default=0.013)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--full", action="store_true",
                    help="full-size model (default: tiny config)")
    ap.add_argument("--n-train", type=int, default=200)
    ap.add_argument("--precision-reg", type=float, default=0.0)
    ap.add_argument("--aux_scheduler", action="store_true", default=None,
                    help="adaptive aux LR (ref ExponentialTargetScheduler, "
                         "train_5.py:3029-3067); default auto: on for "
                         "--full, off for tiny")
    ap.add_argument("--no-aux_scheduler", dest="aux_scheduler",
                    action="store_false", help="force plain aux Adam")
    ap.add_argument("--checkpoint", default=None,
                    help="resume training from this checkpoint")
    args = ap.parse_args()

    if not os.path.isdir(os.path.join(args.data, "train")):
        print(f"generating synthetic dataset at {args.data} ...")
        make_dataset(args.data, n_train=args.n_train)

    from dcae_tpu.config import DCAEConfig
    from dcae_tpu.train.loop import TrainOptions, run_training

    cfg = DCAEConfig() if args.full else DCAEConfig.tiny()
    opts = TrainOptions(
        dataset=args.data, epochs=args.epochs, batch_size=args.batch_size,
        test_batch_size=args.batch_size, patch_size=args.patch_size,
        lmbda=args.lmbda, learning_rate=args.lr,
        lr_epochs=(max(1, int(args.epochs * 0.9)),),
        save_path=args.save_path, save=True, log_every=10,
        val_real_every=max(1, args.epochs // 2), val_real_images=4,
        precision_reg=args.precision_reg,
        aux_scheduler=args.aux_scheduler, checkpoint=args.checkpoint)

    # untrained real-codec baseline bpp on test images
    import jax
    from dcae_tpu.data.datasets import ImageFolder
    from dcae_tpu.eval_lib import eval_image_real
    from dcae_tpu.models.codec import DCAECodec

    test_ds = ImageFolder(args.data, "test", args.patch_size,
                          num_workers=4)
    batch = next(iter(test_ds.batches(4, drop_last=False)))
    codec0 = DCAECodec(cfg, seed=100)
    codec0.update(force=True)
    bpp0 = float(np.mean([eval_image_real(codec0, batch[i:i + 1]).bpp
                          for i in range(batch.shape[0])]))
    print(f"untrained real bpp: {bpp0:.4f}")
    del codec0

    state = run_training(opts, cfg=cfg)

    # trained real-codec bpp/psnr
    codec1 = DCAECodec(cfg, params=jax.device_get(state.params))
    codec1.update(force=True)
    rs = [eval_image_real(codec1, batch[i:i + 1])
          for i in range(batch.shape[0])]
    bpp1 = float(np.mean([r.bpp for r in rs]))
    psnr1 = float(np.mean([r.psnr for r in rs]))

    # summarize the JSONL curves
    recs = [json.loads(ln) for ln in
            open(os.path.join(args.save_path, "train.jsonl"))]
    train = [r for r in recs if r["ns"] == "train" and "bpp_loss" in r]
    k = max(1, len(train) // 10)
    head = train[:k]
    tail = train[-k:]

    def avg(rows, key):
        return float(np.mean([r[key] for r in rows]))

    summary = {
        "loss_first": avg(head, "loss"), "loss_last": avg(tail, "loss"),
        "bpp_first": avg(head, "bpp_loss"), "bpp_last": avg(tail,
                                                            "bpp_loss"),
        "aux_first": avg(head, "aux_loss"), "aux_last": avg(tail,
                                                            "aux_loss"),
        "real_bpp_untrained": bpp0, "real_bpp_trained": bpp1,
        "real_psnr_trained": psnr1,
        "loss_fell": avg(tail, "loss") < avg(head, "loss"),
        "bpp_fell": avg(tail, "bpp_loss") < avg(head, "bpp_loss"),
        "aux_converging": avg(tail, "aux_loss") < 0.5 * avg(head,
                                                            "aux_loss"),
        "real_codec_improved": bpp1 < bpp0,
    }
    print(json.dumps(summary, indent=2))
    with open(os.path.join(args.save_path, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    ok = all(summary[k] for k in ("loss_fell", "bpp_fell",
                                  "real_codec_improved"))
    print("VALIDATION", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
