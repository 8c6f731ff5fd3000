#!/usr/bin/env python3
"""Lane-count A/B for the interleaved profile (VERDICT r4 item 2: the
fixed K=1024 lane-state header costs +14.6% bpp at the 0.34-bpp operating
point). Alternates K values round-robin in the SAME window (the only fair
comparison on the time-shared chip) and reports per-K medians of encode /
decode wall time plus the exact header-vs-payload rate split.

Usage: python tools/lanes_ab.py [--batch 8] [--rounds 3] [--ks 1024,512,256,128]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--ks", default="1024,512,256,128")
    ap.add_argument("--ckpt",
                    default="/tmp/dcae_bench_ckpt/checkpoint_latest.ckpt")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()
    ks = [int(k) for k in args.ks.split(",")]

    from bench import synthetic_kodak
    from dcae_tpu.config import DCAEConfig
    from dcae_tpu.models.codec import DCAECodec
    from dcae_tpu.utils.checkpoint import load_params_only
    from dcae_tpu.utils.profiling import force_sync

    cfg = (DCAEConfig.tiny(compute_dtype="bfloat16") if args.tiny
           else DCAEConfig(compute_dtype="bfloat16"))
    codec = DCAECodec(cfg, seed=0)
    if args.ckpt and os.path.exists(args.ckpt) and not args.tiny:
        codec = DCAECodec(cfg, params=load_params_only(args.ckpt,
                                                       codec.params))
        print(f"loaded {args.ckpt}")
    codec.update(force=True)
    imgs = [synthetic_kodak(args.batch, seed=s) for s in (100, 101)]
    px = args.batch * imgs[0].shape[1] * imgs[0].shape[2]

    res = {k: {"enc": [], "dec": [], "bpp": None, "hdr": None, "pay": None}
           for k in ks}
    # warm-up/compile every K first (compiles are serial and slow)
    for k in ks:
        e = codec.compress_device(imgs[0], lanes=k)
        d = codec.decompress_interleaved(e)
        force_sync(d["x_hat"])
        print(f"K={k} compiled, ok={bool(d['ok'])}", flush=True)

    for r in range(args.rounds):
        for k in ks:
            im = imgs[r % 2]
            t0 = time.perf_counter()
            e = codec.compress_device(im, lanes=k)
            t1 = time.perf_counter()
            d = codec.decompress_interleaved(e)
            force_sync(d["x_hat"])
            t2 = time.perf_counter()
            res[k]["enc"].append(t1 - t0)
            res[k]["dec"].append(t2 - t1)
            hdr = e["states"].nbytes
            pay = (sum(len(s) for s in e["istreams"])
                   + sum(len(s) for s in e["z_strings"])
                   + sum(8 * len(p[0]) for p in e["patches"]))
            res[k]["hdr"] = hdr
            res[k]["pay"] = pay
            res[k]["bpp"] = (hdr + pay) * 8 / px
            assert bool(d["ok"]), f"decode checksum failed at K={k}"
        print(f"round {r} done", flush=True)

    print(f"\n{'K':>5} {'enc_ms':>8} {'dec_ms':>8} {'bpp':>8} "
          f"{'hdr_B':>7} {'pay_B':>8} {'tax%':>6}")
    out = {}
    for k in ks:
        enc = 1000 * float(np.median(res[k]["enc"]))
        dec = 1000 * float(np.median(res[k]["dec"]))
        tax = 100 * res[k]["hdr"] / res[k]["pay"]
        print(f"{k:>5} {enc:8.1f} {dec:8.1f} {res[k]['bpp']:8.4f} "
              f"{res[k]['hdr']:7d} {res[k]['pay']:8d} {tax:6.2f}")
        out[k] = {"enc_ms": round(enc, 1), "dec_ms": round(dec, 1),
                  "bpp": round(res[k]["bpp"], 4),
                  "hdr_bytes": res[k]["hdr"], "payload_bytes": res[k]["pay"],
                  "tax_pct": round(tax, 2)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
