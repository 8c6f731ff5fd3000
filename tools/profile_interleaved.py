#!/usr/bin/env python3
"""Per-op DEVICE-time budget of the interleaved codec's device programs
(VERDICT r3 item 2: "per-stage xprof budget of the certified replay
program"). Device time from the xprof trace is immune to the hosted
chip's duty-cycle swings, so this is runnable even in contended windows.

Usage:
    python tools/profile_interleaved.py [--batch 8] [--tiny]
        [--ckpt /tmp/dcae_bench_ckpt/checkpoint_latest.ckpt]
        [--stage encode|decode|both]
Prints: total device ms per program, by-type table, region buckets, top ops.
"""

import argparse
import os
import re
import sys
import tempfile

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


REGIONS = (
    ("wmsa_pallas", re.compile(r"wmsa|fused_wmsa")),
    ("conv_glu_pallas", re.compile(r"conv_glu")),
    ("conv", re.compile(r"conv_general|convolution")),
    ("dca", re.compile(r"dca|dict|cross_attention|msa_agg", re.I)),
    ("rans_loop", re.compile(r"while|scan|fori", re.I)),
    ("gather_scatter", re.compile(r"gather|scatter", re.I)),
    ("dot", re.compile(r"dot_general|dot\b")),
)


def bucket(op_name: str) -> str:
    for name, rx in REGIONS:
        if rx.search(op_name):
            return name
    return "other"


def profile_fn(label, fn, n_iters=2, dump=None):
    import jax

    from dcae_tpu.utils.profiling import op_stats, trace

    with tempfile.TemporaryDirectory() as d:
        fn()  # warm-up outside the trace
        with trace(d):
            for _ in range(n_iters):
                fn()
        s = op_stats(d, group_fn=bucket, keep_rows=dump is not None)
    if dump:
        with open(dump, "w") as f:
            for ms, occ, typ, op in s.pop("rows"):
                f.write(f"{ms:.3f}\t{occ}\t{typ}\t{op}\n")
        print(f"full op table -> {dump}")
    print(f"\n=== {label}: total device {s['total_ms'] / n_iters:.1f} ms "
          f"per call ({n_iters} calls traced) ===")
    print("by region (ms/call):")
    for k, v in sorted(s["by_group"].items(), key=lambda kv: -kv[1]):
        print(f"  {k:18s} {v / n_iters:8.2f}")
    print("by op type (ms/call, top 12):")
    for k, v in sorted(s["by_type"].items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {k:28s} {v / n_iters:8.2f}")
    print("top ops (ms total over trace | occurrences | type | name):")
    for ms, occ, typ, op in s["top"][:20]:
        print(f"  {ms:8.2f} {occ:5d}  {typ:24s} {op[:90]}")
    return s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--ckpt",
                    default="/tmp/dcae_bench_ckpt/checkpoint_latest.ckpt")
    ap.add_argument("--stage", default="both",
                    choices=["encode", "decode", "both"])
    args = ap.parse_args()

    from bench import synthetic_kodak
    from dcae_tpu.config import DCAEConfig
    from dcae_tpu.models.codec import DCAECodec
    from dcae_tpu.utils.profiling import force_sync

    cfg = (DCAEConfig.tiny(compute_dtype="bfloat16") if args.tiny
           else DCAEConfig(compute_dtype="bfloat16"))
    codec = DCAECodec(cfg, seed=0)
    if args.ckpt and os.path.exists(args.ckpt) and not args.tiny:
        from dcae_tpu.utils.checkpoint import load_params_only
        codec = DCAECodec(cfg, params=load_params_only(args.ckpt,
                                                       codec.params))
        print(f"loaded {args.ckpt}")
    codec.update(force=True)
    images = synthetic_kodak(args.batch)

    enc = codec.compress_device(images)

    if args.stage in ("encode", "both"):
        # rotate buffers (PERF.md trap b): 2 input variants
        imgs2 = synthetic_kodak(args.batch, seed=101)
        seq = [images, imgs2]
        i = [0]

        def run_enc():
            i[0] ^= 1
            e = codec.compress_device(seq[i[0]])
            force_sync(e["states"])

        profile_fn("compress_device (analysis+replay+re-encode)", run_enc)

    if args.stage in ("decode", "both"):
        enc2 = codec.compress_device(synthetic_kodak(args.batch, seed=101))
        encs = [enc, enc2]
        i = [0]

        def run_dec():
            i[0] ^= 1
            d = codec.decompress_interleaved(encs[i[0]])
            force_sync(d["x_hat"])

        profile_fn("decompress_interleaved (decode streams + synthesis)",
                   run_dec, dump=os.environ.get("DCAE_PROFILE_DUMP"))


if __name__ == "__main__":
    main()
