#!/usr/bin/env python3
"""Multi-lambda RD sweep over trained checkpoints (VERDICT r4 item 4).

Real entropy-coded evaluation (update() -> compress -> decompress, stream
bpp + PSNR) of one checkpoint per lambda, on held-out images; prints the
RD table and the BD-rate vs the reference's published Kodak anchor
(/root/reference/RD_data.json via data/rd_reference.py).

Honesty note: no Kodak set exists in this offline environment and the
reference ships no trained weights, so the test curve comes from the
synthetic training corpus's held-out split — the BD-rate is therefore a
cross-corpus number and is expected to be strongly positive; it is
reported because the VERDICT asks for the honest figure, with the caveat
recorded alongside.

Usage:
    python tools/rd_sweep_eval.py \
        --points 0.05:/tmp/ckpt_lam05.ckpt 0.013:/tmp/ckpt_lam013.ckpt \
        [--data /tmp/dcae_synth] [--images 8] [--out docs/rd_sweep.json]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", nargs="+", required=True,
                    help="lambda:checkpoint pairs, high rate first")
    ap.add_argument("--data", default="/tmp/dcae_synth")
    ap.add_argument("--images", type=int, default=8)
    ap.add_argument("--out", default=None)
    ap.add_argument("--dataset", default="Kodak",
                    help="reference anchor curve for BD-rate")
    args = ap.parse_args()

    from dcae_tpu.config import DCAEConfig
    from dcae_tpu.data.datasets import ImageFolder
    from dcae_tpu.data.rd_reference import REFERENCE_RD, bd_rate
    from dcae_tpu.eval_lib import eval_image_real
    from dcae_tpu.models.codec import DCAECodec
    from dcae_tpu.utils.checkpoint import load_params_only

    cfg = DCAEConfig()
    test_ds = ImageFolder(args.data, "test", 256, num_workers=2)
    batch = next(iter(test_ds.batches(args.images, drop_last=False)))
    batch = np.asarray(batch)[:args.images]

    rows = []
    for spec in args.points:
        lam_s, ckpt = spec.split(":", 1)
        codec = DCAECodec(cfg, seed=0)
        codec = DCAECodec(cfg, params=load_params_only(ckpt, codec.params))
        codec.update(force=True)
        rs = [eval_image_real(codec, batch[i:i + 1])
              for i in range(batch.shape[0])]
        row = {"lambda": float(lam_s), "checkpoint": ckpt,
               "bpp": float(np.mean([r.bpp for r in rs])),
               "psnr": float(np.mean([r.psnr for r in rs])),
               "images": batch.shape[0]}
        rows.append(row)
        print(f"lambda {lam_s}: bpp {row['bpp']:.4f}  "
              f"psnr {row['psnr']:.2f} dB  ({ckpt})", flush=True)
        del codec

    ref = REFERENCE_RD[args.dataset]
    bpps = [r["bpp"] for r in rows]
    psnrs = [r["psnr"] for r in rows]
    try:
        bd = bd_rate(ref["bpp"], ref["psnr"], bpps, psnrs)
    except Exception as e:  # disjoint quality ranges etc.
        bd = None
        print(f"BD-rate not computable: {e}")
    out = {"points": rows, "anchor": args.dataset,
           "anchor_curve": ref,
           "bd_rate_vs_anchor_pct": bd,
           "caveat": ("test curve measured on held-out synthetic-corpus "
                      "images (no Kodak in this environment; reference "
                      "ships no weights) — cross-corpus BD-rate")}
    if bd is not None:
        print(f"BD-rate vs {args.dataset} anchor: {bd:+.1f}% "
              "(positive = our curve needs more bits at equal PSNR)")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
