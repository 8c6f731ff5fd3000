"""Benchmark: full-size DCAE real-codec throughput on Kodak-size images.

Headline metric: encode+decode images/sec on 768x512 (Kodak) with the
flagship config (N=192, M=320, 119M params), real rANS bitstreams.
Baseline: the reference paper GPU latency of 193 ms enc+dec per Kodak image
(~5.18 img/s; BASELINE.md "Latency / complexity").

Protocol follows the reference (BASELINE.md): device-synced timing brackets,
first (compile/warm-up) batch excluded.

Prints ONE JSON line.
"""

import json
import sys
import time

import numpy as np


BASELINE_IMG_PER_SEC = 1000.0 / 193.0  # reference enc+dec on its GPU


def synthetic_kodak(n: int, h: int = 512, w: int = 768,
                    seed: int = 100) -> np.ndarray:
    """Natural-ish smooth images in [0,1], (n, h, w, 3)."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 1, (n, h // 16, w // 16, 3))
    img = np.kron(base, np.ones((1, 16, 16, 1)))
    # low-pass mix to avoid blocking artifacts dominating
    img = 0.7 * img + 0.3 * rng.uniform(0, 1, (n, 1, 1, 3))
    img += rng.normal(0, 0.01, img.shape)
    return np.clip(img, 0, 1).astype(np.float32)


def main():
    import jax
    from dcae_tpu.config import DCAEConfig
    from dcae_tpu.models.codec import DCAECodec

    n_timed = int(sys.argv[1]) if len(sys.argv) > 1 else 6

    cfg = DCAEConfig()
    codec = DCAECodec(cfg, seed=0)
    codec.update(force=True)

    images = synthetic_kodak(n_timed + 1)

    # warm-up (compiles both codec paths); self_check enables the fused
    # encoder when its stream bit-matches the staged (decoder-replay) one
    fused_ok = codec.self_check(images[:1])
    enc = codec.compress(images[:1])
    dec = codec.decompress(enc["strings"], enc["shape"])
    jax.block_until_ready(dec["x_hat"])

    enc_s = 0.0
    dec_s = 0.0
    total_bytes = 0
    for i in range(1, n_timed + 1):
        x = images[i: i + 1]
        t0 = time.perf_counter()
        enc = codec.compress(x)
        t1 = time.perf_counter()
        dec = codec.decompress(enc["strings"], enc["shape"])
        jax.block_until_ready(dec["x_hat"])
        t2 = time.perf_counter()
        enc_s += t1 - t0
        dec_s += t2 - t1
        total_bytes += sum(len(s) for grp in enc["strings"] for s in grp)

    ips = n_timed / (enc_s + dec_s)
    result = {
        "metric": "kodak768x512_encdec_images_per_sec",
        "value": round(ips, 4),
        "unit": "img/s",
        "vs_baseline": round(ips / BASELINE_IMG_PER_SEC, 4),
        "detail": {
            "encode_ms": round(1000 * enc_s / n_timed, 1),
            "decode_ms": round(1000 * dec_s / n_timed, 1),
            "bpp": round(total_bytes * 8 / (n_timed * 512 * 768), 4),
            "n_images": n_timed,
            "fused_encoder": fused_ok,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
