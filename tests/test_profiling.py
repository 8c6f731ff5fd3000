"""Profiling harness tests (tiny config, CPU)."""

import numpy as np

from dcae_tpu.config import DCAEConfig
from dcae_tpu.models.codec import DCAECodec
from dcae_tpu.utils import profiling


def test_report_and_breakdown():
    cfg = DCAEConfig.tiny()
    codec = DCAECodec(cfg)
    p = cfg.pad_multiple
    x = np.random.default_rng(0).uniform(0, 1, (1, p, p, 3)).astype(
        np.float32)

    codec.update(force=True)
    bd = profiling.codec_breakdown(codec, x, iters=1)
    assert set(bd) == {"g_a", "h_a", "hyper_synthesis", "g_s",
                       "encode_full"}
    for k, r in bd.items():
        assert r["median_ms"] > 0, k
        assert np.isfinite(r["gflops"]), k


def test_trace_context(tmp_path):
    import jax.numpy as jnp

    with profiling.trace(str(tmp_path)):
        jnp.ones((8, 8)).sum().block_until_ready()
    import os
    assert any(os.scandir(str(tmp_path)))


def test_op_stats_parses_trace(tmp_path):
    """trace() + op_stats(): capture a tiny device trace and get per-op
    device-time stats back (the xprof pipeline used for docs/PERF.md)."""
    import jax
    import jax.numpy as jnp

    from dcae_tpu.utils.profiling import op_stats, trace

    f = jax.jit(lambda a, b: jnp.tanh(a @ b).sum())
    x = jnp.ones((256, 256))
    jax.block_until_ready(f(x, x))
    logdir = str(tmp_path / "tr")
    with trace(logdir):
        jax.block_until_ready(f(x, x))
    s = op_stats(logdir, group_fn=lambda op: "matmul" if "dot" in op
                 else "other")
    assert s["total_ms"] >= 0
    assert isinstance(s["by_type"], dict) and s["top"]
    assert set(s["by_group"]) <= {"matmul", "other"}
