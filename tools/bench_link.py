"""Host<->device link microbenchmark: dispatch latency and transfer
bandwidth.

The codec's wall-clock model (docs/PERF.md) prices every decode slice at
one round trip and the encode hand-off at one pytree fetch; this tool
measures what those actually cost on the current link (sub-ms co-located,
~30 ms + limited bandwidth through the axon tunnel), so perf work targets
the real constant. Ref: the reference frames the same constant as CUDA
H2D/D2H + RPC latency (rpc/eval_rpc.py timing breakdowns).

Usage: python tools/bench_link.py [reps]
Prints one JSON line.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timeit(fn, reps: int) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    dev = jax.devices()[0]

    tiny = jnp.zeros((8,), jnp.float32)
    add1 = jax.jit(lambda x: x + 1)
    jax.block_until_ready(add1(tiny))

    # dispatch+sync latency: run a trivial program and wait for it
    lat = _timeit(lambda: jax.block_until_ready(add1(tiny)), reps)
    # d2h round trip of a tiny result
    tiny_get = _timeit(lambda: jax.device_get(add1(tiny)), reps)

    sizes = {}
    bump = jax.jit(lambda x: x + 1)  # force a fresh on-device result:
    # device_get of a plain device_put'd array can return the runtime's
    # cached host copy and measure 0 ms
    for mb in (1, 8, 32):
        n = mb * (1 << 20)
        host = np.zeros(n, np.uint8)
        h2d = _timeit(
            lambda: jax.block_until_ready(jax.device_put(host, dev)), reps)
        dev_arr = jax.block_until_ready(bump(jax.device_put(host, dev)))
        d2h = _timeit(lambda: jax.device_get(bump(dev_arr)), reps)
        sizes[f"{mb}MB"] = {
            "h2d_ms": round(1000 * h2d, 2),
            "d2h_ms": round(1000 * d2h, 2),
            "h2d_MBps": round(mb / h2d, 1),
            "d2h_MBps": round(mb / d2h, 1),
        }

    print(json.dumps({
        "device": str(dev),
        "dispatch_sync_ms": round(1000 * lat, 2),
        "tiny_device_get_ms": round(1000 * tiny_get, 2),
        "transfers": sizes,
        "reps_best_of": reps,
    }))


if __name__ == "__main__":
    main()
