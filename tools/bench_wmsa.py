"""Same-window microbench of the fused WMSA kernel at the three g_a/g_s
stage shapes (768x512 input, batch 8). Usage:

    python tools/bench_wmsa.py [--dtype bf16] [--reps 30]

Prints per-stage median ms with force_sync timing + rotated input buffers
(PERF.md measurement traps a/b/c).
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from dcae_tpu.ops.pallas.wmsa_v3 import fused_wmsa_v3
from dcae_tpu.utils.profiling import force_sync

STAGES = [  # (name, H, W, C, head_dim, blocks-at-full-size)
    ("stage1", 384, 256, 96, 8, 1),
    ("stage2", 192, 128, 144, 16, 2),
    ("stage3", 96, 64, 256, 32, 12),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--shifted", action="store_true")
    ap.add_argument("--iters", type=int, default=10,
                    help="kernel applications chained per dispatch")
    args = ap.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    total = 0.0
    for name, H, W, C, hd, nblocks in STAGES:
        heads = C // hd
        xs = [jnp.asarray(rng.normal(0, 1, (args.batch, H, W, C)), dt)
              for _ in range(3)]
        wqkv = jnp.asarray(rng.normal(0, 0.02, (C, 3 * C)), jnp.float32)
        bqkv = jnp.zeros((3 * C,), jnp.float32)
        wp = jnp.asarray(rng.normal(0, 0.02, (C, C)), jnp.float32)
        bp = jnp.zeros((C,), jnp.float32)
        rel = jnp.asarray(rng.normal(0, 0.02, (heads, 15, 15)), jnp.float32)

        ITERS = args.iters  # chained in ONE program: amortizes dispatch

        @jax.jit
        def run(x):
            for _ in range(ITERS):
                x = fused_wmsa_v3(x, wqkv, bqkv, wp, bp, rel, window=8,
                                  heads=heads, shifted=args.shifted)
            return x

        force_sync(run(xs[0]))  # compile
        ts = []
        for i in range(args.reps):
            x = xs[i % 3]
            t0 = time.perf_counter()
            force_sync(run(x))
            ts.append((time.perf_counter() - t0) * 1e3)
        ms = float(np.median(ts)) / ITERS
        total += ms * nblocks
        print(f"{name}: C={C} heads={heads} median {ms:.2f} ms "
              f"(x{nblocks} blocks = {ms * nblocks:.1f} ms/transform)")
    print(f"total kernel ms/transform (batch {args.batch}): {total:.1f}")


if __name__ == "__main__":
    main()
