"""Benchmark: full-size DCAE real-codec throughput on Kodak-size images.

Headline metric: encode+decode images/sec on 768x512 (Kodak) with the
flagship config (N=192, M=320, 119M params), real rANS bitstreams.
Baseline: the reference paper GPU latency of 193 ms enc+dec per Kodak image
(~5.18 img/s; BASELINE.md "Latency / complexity").

Protocol follows the reference (BASELINE.md): device-synced timing brackets,
first (compile/warm-up) batch excluded. The headline statistic is the
MEDIAN serving-loop round over the time budget (best-of kept as detail):
the hosted chip is time-shared, and the median is the honest figure.

Capture guarantees (round-4 hardening): a JSON line is ALWAYS printed —
the current best-so-far result is emitted after every milestone, a
SIGTERM/SIGINT handler re-emits it before dying, and a SIGALRM hard cap
(DCAE_BENCH_TOTAL_S, default 1500 s) bounds total runtime below the
driver's kill timeout. The LAST JSON line on stdout is the result.
"""

import json
import os
import signal
import sys
import time

import numpy as np


BASELINE_IMG_PER_SEC = 1000.0 / 193.0  # reference enc+dec on its GPU

# Best-so-far result, updated at every milestone and emitted by signal
# handlers so a mid-bench kill still records a number (VERDICT r3 item 1).
_RESULT = {
    "metric": "kodak768x512_encdec_images_per_sec",
    "value": 0.0,
    "unit": "img/s",
    "vs_baseline": 0.0,
    "detail": {"error": "bench did not reach a measurement"},
}


def emit():
    """Print the current best-so-far JSON line (last line wins)."""
    sys.stdout.write(json.dumps(_RESULT) + "\n")
    sys.stdout.flush()


def _set_value(img_per_sec: float):
    _RESULT["value"] = round(img_per_sec, 4)
    _RESULT["vs_baseline"] = round(img_per_sec / BASELINE_IMG_PER_SEC, 4)
    _RESULT["detail"].pop("error", None)


def _install_capture_guards():
    """SIGTERM/SIGINT/SIGALRM all emit best-so-far JSON, then exit 0.

    Round 3 lost its driver bench to exactly this: the device-wait
    outlived the driver's timeout and the kill arrived before any JSON
    was printed (BENCH_r03.json rc=124, no number).
    """
    def handler(signum, frame):
        _RESULT["detail"]["terminated_by_signal"] = signum
        emit()
        os._exit(0)

    for sig in (signal.SIGTERM, signal.SIGINT, signal.SIGALRM):
        signal.signal(sig, handler)
    total_s = float(os.environ.get("DCAE_BENCH_TOTAL_S", "1500"))
    if total_s > 0:
        signal.alarm(int(total_s))


def synthetic_kodak(n: int, h: int = 512, w: int = 768,
                    seed: int = 100) -> np.ndarray:
    """Natural-ish structured images in [0,1], (n, h, w, 3).

    Round 4: switched from iid kron-block noise to the structured
    generator family the training validator uses (gradients + coarse
    block texture + soft rectangles + mild noise,
    tools/validate_training.py synth_image) — the old corpus's per-pixel
    noise floor was far OUTSIDE any natural-image distribution, which
    (a) pinned measured bpp near 1.3 regardless of model quality and
    (b) drove trained low-rate checkpoints into Gaussian-tail escapes
    (the r4 0.33-bpp checkpoint overflowed the 128/slice patch cap and
    lost the interleaved profile entirely). Throughput comparability
    holds: the metric is enc+dec wall time, and the reference baseline
    is a per-image latency.
    """
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w] / max(h, w)
    imgs = np.empty((n, h, w, 3), np.float32)
    for i in range(n):
        img = np.stack([
            0.5 + 0.5 * np.sin(2 * np.pi * (rng.uniform(0.5, 2) * xx
                                            + rng.uniform(0, 1))),
            0.5 + 0.5 * np.sin(2 * np.pi * (rng.uniform(0.5, 2) * yy
                                            + rng.uniform(0, 1))),
            0.5 * (xx + yy),
        ], axis=-1)
        blocks = rng.uniform(0, 1, (8, 8, 3))
        img = 0.6 * img + 0.4 * np.kron(
            blocks, np.ones((h // 8, w // 8, 1)))
        for _ in range(6):
            t = rng.integers(0, h - 32)
            l = rng.integers(0, w - 32)
            bh, bw = rng.integers(16, 160, 2)
            img[t:t + bh, l:l + bw] = (0.7 * img[t:t + bh, l:l + bw]
                                       + 0.3 * rng.uniform(0, 1, 3))
        imgs[i] = img + rng.normal(0, 0.01, img.shape)
    # uint8, as real Kodak PNGs are: the codec's uint8 ingress uploads
    # 1 byte/px and normalizes on device (tools/bench_link.py measured
    # the tunnel at ~80 MB/s h2d, so f32 upload alone was 465 ms/batch-8)
    return (np.clip(imgs, 0, 1) * 255).round().astype(np.uint8)


def wait_for_device(budget_s: float) -> bool:
    """Wait out a dead window of the hosted TPU tunnel.

    The axon PJRT plugin's pool claim can block indefinitely when the
    remote pool has no capacity (observed multi-hour windows). Probe in
    a subprocess (so a blocked claim can be killed) until the device
    answers a matmul or the budget elapses. Returns True when alive.
    """
    import subprocess

    probe_src = (
        "import jax, jax.numpy as jnp\n"
        "x = jnp.ones((2048, 2048))\n"
        "v = float((x @ x)[0, 0])\n"  # value fetch: a REAL barrier
        "print('alive', v)\n"
    )
    t0 = time.perf_counter()
    first = True
    while True:
        try:
            out = subprocess.run(
                [sys.executable, "-c", probe_src], capture_output=True,
                timeout=90, text=True)
            if "alive" in out.stdout:
                if not first:
                    print("# device probe: alive", file=sys.stderr)
                return True
        except subprocess.TimeoutExpired:
            pass
        first = False
        waited = time.perf_counter() - t0
        if waited >= budget_s:
            return False
        print(f"# device probe failed ({waited:.0f}s elapsed); "
              "retrying in 120s", file=sys.stderr, flush=True)
        time.sleep(min(120, max(1, budget_s - waited)))


def main():
    _install_capture_guards()

    import jax

    # CPU smoke runs (JAX_PLATFORMS=cpu): the hosted TPU plugin
    # re-registers itself over the env var and its pool claim can block
    # indefinitely in a dead tunnel window, so force the config path too
    # (same guard as tests/conftest.py) BEFORE any device touch.
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from dcae_tpu.config import DCAEConfig
    from dcae_tpu.models.codec import DCAECodec
    # timing brackets use a value-fetch barrier, NOT block_until_ready:
    # on the hosted axon platform block_until_ready can return before
    # execution completes (docs/PERF.md measurement traps), which would
    # inflate every throughput number below
    from dcae_tpu.utils.profiling import force_sync

    # Never start benching into a dead tunnel window: wait (bounded) for
    # the chip to answer. DCAE_BENCH_WAIT_S=0 disables (e.g. CPU runs).
    # Default 18 min: must stay well under the driver's kill budget
    # (~30 min observed) so the honest-zero JSON still lands; the
    # SIGTERM/SIGALRM guards above are the backstop either way.
    wait_s = float(os.environ.get("DCAE_BENCH_WAIT_S", "1080"))
    if wait_s > 0 and not wait_for_device(wait_s):
        _RESULT["detail"] = {
            "error": "TPU tunnel dead window: device probe failed for "
                     f"{wait_s:.0f}s (pool-side claim starvation; see "
                     "BENCH_HISTORY.md)"}
        emit()
        return

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    # serving config: bf16 analysis/synthesis bodies (entropy path stays
    # f32; stream bit-agreement is self_check-gated below). The chip's
    # default matmul precision is bf16-class even at f32 storage
    # (docs/PERF.md), so this only halves HBM traffic, not accuracy.
    # DCAE_BENCH_CONFIG=tiny smoke-tests the harness itself (CPU-friendly);
    # the headline config is the full-size flagship.
    dtype = os.environ.get("DCAE_BENCH_DTYPE", "bfloat16")
    if os.environ.get("DCAE_BENCH_CONFIG", "full") == "tiny":
        cfg = DCAEConfig.tiny(compute_dtype=dtype)
    else:
        cfg = DCAEConfig(compute_dtype=dtype)
    codec = DCAECodec(cfg, seed=0)
    # DCAE_BENCH_CKPT: benchmark trained weights (realistic bpp — random
    # weights code at ~4.4 bpp, ~8x a trained model's host-coder load).
    # When unset, auto-discover the full-size training artifact
    # (tools/validate_training.py --full --save_path /tmp/dcae_bench_ckpt):
    # trained weights are the deployment-realistic configuration AND the
    # one where the interleaved device-coding profile is valid (random
    # weights emit out-of-table symbols). Falls back to random weights
    # (detail.weights records which) if no checkpoint exists.
    AUTO_CKPTS = ("/tmp/dcae_bench_ckpt/checkpoint_latest.ckpt",
                  "/tmp/dcae_bench_ckpt/checkpoint_best.ckpt")
    ckpt = os.environ.get("DCAE_BENCH_CKPT")
    if ckpt is None and os.environ.get("DCAE_BENCH_CONFIG", "full") == "full":
        ckpt = next((p for p in AUTO_CKPTS if os.path.exists(p)), None)
    weights = "random"
    if ckpt:
        from dcae_tpu.utils.checkpoint import load_params_only
        try:
            codec = DCAECodec(cfg,
                              params=load_params_only(ckpt, codec.params))
            weights = f"trained ({ckpt})"
        except Exception as e:  # stale/corrupt file: bench must still run
            print(f"# checkpoint load failed, using random weights: {e}",
                  file=sys.stderr)
    codec.update(force=True)
    _RESULT["detail"] = {"weights": weights, "batch": batch,
                         "device": str(jax.devices()[0]),
                         # corpus generation version: bpp/throughput rows in
                         # BENCH_HISTORY are only comparable within one
                         # corpus family (ADVICE r4) — structured-v2 is the
                         # r4+ generator; rounds 1-3 used iid kron noise
                         "corpus": "structured-v2",
                         "error": "bench did not reach a measurement"}

    images = synthetic_kodak(batch)

    # warm-up (compiles both codec paths); self_check enables the fused
    # encoder when its stream bit-matches the staged (decoder-replay) one
    fused_ok = codec.self_check(images[:1])
    for b in (1, batch):
        enc = codec.compress(images[:b])
        dec = codec.decompress(enc["strings"], enc["shape"])
        force_sync(dec["x_hat"])

    # single-image latency
    t0 = time.perf_counter()
    enc = codec.compress(images[:1])
    t1 = time.perf_counter()
    dec = codec.decompress(enc["strings"], enc["shape"])
    force_sync(dec["x_hat"])
    single_ms = 1000 * (time.perf_counter() - t0)
    single_enc_ms = 1000 * (t1 - t0)

    PIPE_BATCHES = int(os.environ.get("DCAE_BENCH_PIPE_BATCHES", "6"))

    # batched throughput (one stream per image; the channel-AR round trips
    # amortize over the batch). The hosted chip is time-shared with 2-20x
    # duty-cycle swings (docs/PERF.md), so run rounds until a time budget
    # elapses (>= n_rounds, <= BUDGET_S) and report the MEDIAN round
    # (best-of kept as detail — VERDICT r3: best-of flatters on a
    # contended chip; the median is the honest headline).
    BUDGET_S = float(os.environ.get(
        "DCAE_BENCH_BUDGET_S", "150" if n_rounds > 1 else "0"))

    # (a) sequential enc->dec round: per-stage latency detail
    best = None
    total_bytes = 0
    for r in range(2):
        t0 = time.perf_counter()
        enc = codec.compress(images)
        enc_s = time.perf_counter() - t0
        t1 = time.perf_counter()
        dec = codec.decompress(enc["strings"], enc["shape"])
        force_sync(dec["x_hat"])
        dec_s = time.perf_counter() - t1
        if best is None or enc_s + dec_s < best[0] + best[1]:
            best = (enc_s, dec_s)
        total_bytes = sum(len(s) for grp in enc["strings"] for s in grp)
    enc_s, dec_s = best

    # first real number: record the sequential figure so a kill during
    # the (longer) serving loop below still reports a measurement
    _set_value(batch / (enc_s + dec_s))
    _RESULT["detail"].update({
        "profile": "sequential(provisional)",
        "encode_ms_per_img": round(1000 * enc_s / batch, 1),
        "decode_ms_per_img": round(1000 * dec_s / batch, 1),
        "sequential_img_per_sec": round(batch / (enc_s + dec_s), 4),
        "single_image_ms": round(single_ms, 1),
        "single_image_encode_ms": round(single_enc_ms, 1),
        "bpp": round(total_bytes * 8 / (batch * 512 * 768), 4),
        "encode_mode": codec.encode_mode,
        "fast_encoder": fused_ok,
        "pipeline_batches": PIPE_BATCHES,
    })
    emit()

    # (b) warm the interleaved (device-decode) profile: per-slice K-lane
    # rANS y streams the decoder entropy-decodes ON the chip — decode is
    # host-z + ONE device program, at reference-grade bpp (+ ~4%
    # lane-state overhead). Random weights can emit out-of-table symbols
    # (EscapeError) — skip gracefully; trained checkpoints essentially
    # never escape. Measured enc/dec splits here; its serving loop races
    # the classic one same-window in (c).
    interleaved = {}
    try:
        enc_il = codec.compress_device(images)
        dec_il = codec.decompress_interleaved(enc_il)  # warm-up/compile
        force_sync(dec_il["x_hat"])
        best_il = None
        for _ in range(3):
            t2 = time.perf_counter()
            enc_il = codec.compress_device(images)
            t3 = time.perf_counter()
            dec_il = codec.decompress_interleaved(enc_il)
            force_sync(dec_il["x_hat"])
            t4 = time.perf_counter()
            if best_il is None or t4 - t2 < sum(best_il):
                best_il = (t3 - t2, t4 - t3)
        il_bytes = (sum(len(s) for s in enc_il["istreams"])
                    + enc_il["states"].nbytes
                    + sum(len(s) for s in enc_il["z_strings"]))
        interleaved = {
            "img_per_sec": round(batch / sum(best_il), 4),
            "encode_ms_per_img": round(1000 * best_il[0] / batch, 1),
            "decode_ms_per_img": round(1000 * best_il[1] / batch, 1),
            "ok": bool(dec_il["ok"]),
            "bpp": round(il_bytes * 8 / (batch * 512 * 768), 4),
            "lanes": enc_il["lanes"],
        }
    except Exception as e:
        print(f"# interleaved profile skipped: {e}", file=sys.stderr)
    _RESULT["detail"]["interleaved_profile"] = interleaved

    # (c) steady-state serving throughput: encode of batch i+1 overlaps
    # decode of batch i (codec.encdec_pipeline) — the headline metric.
    # Each pass streams PIPE_BATCHES batches through the pipeline; images
    # per second counts every image fully encoded AND decoded. Decode
    # interleave groups CONSECUTIVE batches (full-size device programs,
    # overlapped dispatch round trips). When the interleaved profile is
    # valid its serving loop (encdec_pipeline_interleaved) runs in the
    # SAME budget loop, alternating with the classic one — a same-window
    # A/B, the only comparison the time-shared chip admits.
    env_il = os.environ.get("DCAE_BENCH_DECODE_INTERLEAVE", "auto")
    # interleaved serving: dispatch batch i+4's device programs before
    # batch i's host sync. Same-window round-robin sweep (round 5, 3
    # rounds each): depth 4 -> 19.3 img/s vs 3 -> 17.8 vs 5 -> 18.7;
    # r3's depth-3-beats-2 result still holds directionally.
    os.environ.setdefault("DCAE_IL_DISPATCH_AHEAD", "4")
    stream = [images] * PIPE_BATCHES
    n_images = batch * PIPE_BATCHES
    pipe_times = []
    pipe_il_times = []
    race_il = interleaved.get("ok", False)

    def update_headline():
        """Refresh _RESULT from the serving samples collected so far.

        Headline = MEDIAN of the winning deployable serving profile
        (classic vs interleaved device-decode, whichever's median is
        higher); best-of kept in detail. Bench contract (VERDICT r4 item
        7): `classic_median_img_per_sec` and the interleaved/classic
        same-window ratio are ALWAYS emitted at top level — the classic
        median is the in-window contention normalizer, and the ratio's
        observed range across driver/builder windows is 1.6-2.4x (it is
        window-dependent, not a constant; BENCH_HISTORY.md).
        """
        med_c = n_images / float(np.median(pipe_times))
        det = {
            "profile": "classic",
            "pipeline_ms_per_img": round(
                1000 * float(np.median(pipe_times)) / n_images, 1),
            "best_img_per_sec": round(n_images / min(pipe_times), 4),
            "rounds": len(pipe_times),
        }
        ips = med_c
        _RESULT["classic_median_img_per_sec"] = round(med_c, 4)
        if pipe_il_times:
            med_il = n_images / float(np.median(pipe_il_times))
            interleaved["pipeline_img_per_sec"] = round(
                n_images / min(pipe_il_times), 4)
            interleaved["pipeline_median_img_per_sec"] = round(med_il, 4)
            _RESULT["interleaved_classic_ratio"] = round(med_il / med_c, 4)
            if med_il > med_c:
                ips = med_il
                det["profile"] = "interleaved_device_decode"
                det["best_img_per_sec"] = interleaved["pipeline_img_per_sec"]
                det["pipeline_ms_per_img"] = round(
                    1000 * float(np.median(pipe_il_times)) / n_images, 1)
            det["classic_median_img_per_sec"] = round(med_c, 4)
        _set_value(ips)
        _RESULT["detail"].update(det)

    t_bench0 = time.perf_counter()
    r = 0
    while r < n_rounds or time.perf_counter() - t_bench0 < BUDGET_S:
        r += 1
        # same-window sweep: interleave 2 and 3 both beat 1 (docs/PERF.md
        # round-3 breakdown — trip latency hides between grouped jobs);
        # 3 has the best best-case, 2 the best median, so auto alternates
        il = (3 if r % 2 else 2) if env_il == "auto" else max(1, int(env_il))
        t0 = time.perf_counter()
        outs = codec.encdec_pipeline(stream, decode_interleave=il)
        force_sync([o["x_hat"] for o in outs])
        pipe_times.append(time.perf_counter() - t0)
        if race_il:
            t0 = time.perf_counter()
            outs = codec.encdec_pipeline_interleaved(stream)
            force_sync([o["x_hat"] for o in outs])
            pipe_il_times.append(time.perf_counter() - t0)
        update_headline()
        if r == 1:  # intermediate capture after the FIRST completed round
            emit()

    # single-image latency in the interleaved device-coding profile: the
    # whole codec is a handful of device programs with ONE host sync per
    # direction, so this is the latency profile for remote-accelerator
    # serving (classic pays ~6 decode round trips). Best-effort detail.
    if interleaved.get("ok"):
        try:
            e1 = codec.compress_device(images[:1])
            d1 = codec.decompress_interleaved(e1)  # warm-up/compile
            force_sync(d1["x_hat"])
            t2 = time.perf_counter()
            e1 = codec.compress_device(images[:1])
            t3 = time.perf_counter()
            d1 = codec.decompress_interleaved(e1)
            force_sync(d1["x_hat"])
            interleaved["single_image_ms"] = round(
                1000 * (time.perf_counter() - t2), 1)
            interleaved["single_image_encode_ms"] = round(
                1000 * (t3 - t2), 1)
        except Exception as e:
            print(f"# interleaved single-image metric skipped: {e}",
                  file=sys.stderr)

    # single-image latency in the indexes-shipped (DCAE_6) profile: the
    # host rANS runs to completion upfront, so the whole channel-AR chain
    # + synthesis is ONE device program (DCAE.decode_all) — 1 dispatch
    # round trip instead of 6. Trades stream size (raw 6-bit indexes ride
    # along) for latency. Measured as full enc+dec, not decode-only.
    single_dec_1trip_ms = -1.0  # best-effort: never risk the headline
    single_1trip_ms = -1.0
    try:
        enc_i = codec.compress_with_indexes(images[:1])
        d1 = codec.decompress(enc_i["strings"], enc_i["shape"],
                              indexes=enc_i["indexes"])  # warm-up/compile
        force_sync(d1["x_hat"])
        t2 = time.perf_counter()
        enc_i = codec.compress_with_indexes(images[:1])
        t3 = time.perf_counter()
        d1 = codec.decompress(enc_i["strings"], enc_i["shape"],
                              indexes=enc_i["indexes"])
        force_sync(d1["x_hat"])
        single_dec_1trip_ms = 1000 * (time.perf_counter() - t3)
        single_1trip_ms = 1000 * (time.perf_counter() - t2)
    except Exception as e:
        print(f"# 1-trip decode metric skipped: {e}", file=sys.stderr)
    _RESULT["detail"]["single_image_decode_1trip_ms"] = round(
        single_dec_1trip_ms, 1)
    _RESULT["detail"]["single_image_1trip_ms"] = round(single_1trip_ms, 1)

    # headline single-image latency = best deployable profile (classic
    # 6-trip, interleaved device-decode, or indexes-shipped 1-trip); the
    # reference bar is 193 ms enc+dec (assets/sota.PNG). Which profile won
    # is recorded so the number stays auditable.
    candidates = {"classic": single_ms}
    if interleaved.get("single_image_ms"):
        candidates["interleaved"] = interleaved["single_image_ms"]
    if single_1trip_ms > 0:
        candidates["indexes_1trip"] = single_1trip_ms
    prof = min(candidates, key=candidates.get)
    _RESULT["detail"]["single_image_ms"] = round(candidates[prof], 1)
    _RESULT["detail"]["single_image_profile"] = prof
    _RESULT["detail"]["single_image_classic_ms"] = round(single_ms, 1)

    update_headline()
    emit()


if __name__ == "__main__":
    main()
