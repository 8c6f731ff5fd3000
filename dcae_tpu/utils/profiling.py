"""Profiling / tracing harness (SURVEY.md §5 "TPU rebuild: jax.profiler
traces + simple timing harness"; replaces the reference's ad-hoc
cuda.synchronize timing brackets, ref eval_1.py:143-165).

Three levels:
  * trace(logdir)        — jax.profiler device trace (open in XProf/TB)
  * time_fn(fn, ...)     — wall time with block_until_ready, warm-up
  * report(fn, ...)      — measured time + XLA cost analysis -> effective
                           TFLOP/s and HBM GB/s (identifies compute- vs
                           bandwidth- vs dispatch-bound programs)
  * codec_breakdown(...) — per-subnet encode/decode timing of a DCAECodec
                           (formalizes docs/PERF.md's measurement)
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace into logdir (view with xprof/tensorboard
    or Perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def force_sync(tree):
    """TRUE completion barrier for timing brackets and pipeline drains.

    jax.block_until_ready can return before execution completes on some
    remote-accelerator PJRT plugins (measured on the hosted axon TPU
    platform: a "blocked" 5.5-TFLOP program returned in 0.1 ms while the
    value fetch behind it stalled for its full execution — docs/PERF.md
    "measurement traps"). Fetching one element of every leaf is a
    guaranteed barrier on any platform: a d2h copy of a defined buffer
    cannot start until the producing program has finished. Returns `tree`
    so call sites can wrap expressions."""
    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if isinstance(x, jax.Array)]
    if leaves:
        jax.device_get([x[(0,) * x.ndim] for x in leaves])
    return tree


def time_fn(fn: Callable, *args, iters: int = 5, warmup: int = 2) -> Dict:
    """Median/best wall time of fn(*args) with full device sync."""
    for _ in range(warmup):
        force_sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        force_sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return {"median_s": float(np.median(times)),
            "best_s": float(np.min(times)),
            "times_s": times}


def cost_analysis(fn: Callable, *args) -> Dict:
    """XLA's static cost model for the jitted fn at these arg shapes:
    {flops, hbm bytes accessed} (0.0 when the backend reports none)."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    try:
        costs = compiled.cost_analysis()
        if isinstance(costs, (list, tuple)):
            costs = costs[0]
    except Exception:
        costs = {}
    return {
        "flops": float(costs.get("flops", 0.0)),
        "bytes_accessed": float(costs.get("bytes accessed",
                                costs.get("bytes_accessed", 0.0))),
    }


def report(fn: Callable, *args, iters: int = 5, warmup: int = 2,
           label: str = "") -> Dict:
    """Measured wall time + cost model -> effective TFLOP/s and GB/s."""
    t = time_fn(fn, *args, iters=iters, warmup=warmup)
    c = cost_analysis(fn, *args)
    sec = t["median_s"]
    out = {
        "label": label,
        "median_ms": sec * 1e3,
        "best_ms": t["best_s"] * 1e3,
        "gflops": c["flops"] / 1e9,
        "hbm_gb": c["bytes_accessed"] / 1e9,
        "tflops_per_s": c["flops"] / sec / 1e12 if sec > 0 else 0.0,
        "hbm_gb_per_s": c["bytes_accessed"] / sec / 1e9 if sec > 0 else 0.0,
    }
    return out


def op_stats(logdir: str, group_fn: Optional[Callable] = None,
             keep_rows: bool = False) -> Dict[str, Dict]:
    """Parse a jax.profiler trace (written by `trace(logdir)`) into
    per-op DEVICE-time stats via xprof — the number that is immune to a
    time-shared chip's duty cycle (wall timings are not). Returns
    {"total_ms", "by_type": {op_type: ms}, "by_group": {group: ms},
     "top": [(ms, occurrences, type, op_name), ...]}.

    group_fn(op_name) -> str optionally buckets ops by model region
    (e.g. lambda op: "g_a" if "/g_a/" in op else "other").

    This is how the round-2 searchsorted discovery was made
    (docs/PERF.md): gather ops from jit(searchsorted) were 55% of the
    encode program's device time.
    """
    import glob
    import json as _json

    from xprof.convert import raw_to_tool_data as _rtd

    xs = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
    if not xs:
        raise FileNotFoundError(f"no .xplane.pb under {logdir}")
    data, _ = _rtd.xspace_to_tool_data(xs, "framework_op_stats", {})
    d = _json.loads(data if isinstance(data, str) else data.decode())
    tbl = d[0] if isinstance(d, list) else d
    cols = [c["id"] for c in tbl["cols"]]
    rows = [[c["v"] if isinstance(c, dict) else c for c in r["c"]]
            for r in tbl["rows"]]
    i_dev = cols.index("host_or_device")
    i_type = cols.index("type")
    i_op = cols.index("operation")
    i_tot = cols.index("total_time")
    i_occ = cols.index("occurrences")
    dev = [r for r in rows if r[i_dev] == "Device"]
    if not dev:  # CPU backend traces report ops as Host
        dev = [r for r in rows if r[i_dev] == "Host"]
    total = sum(r[i_tot] for r in dev)
    by_type: Dict[str, float] = {}
    by_group: Dict[str, float] = {}
    for r in dev:
        by_type[r[i_type]] = by_type.get(r[i_type], 0.0) + r[i_tot] / 1e3
        if group_fn is not None:
            g = group_fn(str(r[i_op]))
            by_group[g] = by_group.get(g, 0.0) + r[i_tot] / 1e3
    rows_out = sorted(((r[i_tot] / 1e3, int(r[i_occ]), r[i_type],
                        str(r[i_op])) for r in dev), reverse=True)
    out = {"total_ms": total / 1e3, "by_type": by_type,
           "by_group": by_group, "top": rows_out[:25]}
    if keep_rows:
        out["rows"] = rows_out
    return out


def codec_breakdown(codec, x, iters: int = 3) -> Dict[str, Dict]:
    """Per-subnet timing + utilization of the codec's compiled programs on
    batch x. Returns {subnet: report}."""
    import jax.numpy as jnp

    from dcae_tpu.models.dcae import DCAE

    x = jnp.asarray(x, jnp.float32)
    p = codec.params
    model = codec.model
    st = jnp.asarray(codec._scale_table)

    def g_a(p_, x_):
        return model.apply({"params": p_}, x_, method=DCAE.analysis)

    y = jax.jit(g_a)(p, x)

    def h_a(p_, y_):
        return model.apply({"params": p_}, y_, method=DCAE.hyper_analysis)

    z = jax.jit(h_a)(p, y)

    def hyper_syn(p_, z_):
        return model.apply({"params": p_}, z_, method=DCAE.hyper_synthesis)

    def g_s(p_, y_):
        return model.apply({"params": p_}, y_, method=DCAE.decode_synthesis)

    def full_encode(p_, x_):
        return model.apply({"params": p_}, x_, st,
                           method=DCAE.encode_arrays)

    out = {}
    out["g_a"] = report(g_a, p, x, iters=iters, label="g_a")
    out["h_a"] = report(h_a, p, y, iters=iters, label="h_a")
    out["hyper_synthesis"] = report(hyper_syn, p, z, iters=iters,
                                    label="h_z_s1+h_z_s2")
    out["g_s"] = report(g_s, p, y, iters=iters, label="g_s")
    out["encode_full"] = report(full_encode, p, x, iters=iters,
                                label="fused encode program")
    return out
