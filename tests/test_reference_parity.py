"""End-to-end numeric parity against the reference's OWN model code.

Round 1 validated blocks against torch oracles re-written from SURVEY.md;
this test instead executes /root/reference/models/dcae.py itself (via the
minimal compressai/timm stubs in tests/refstub/ — only the entropy-model
forward math is stubbed; every transform/attention/slice-loop line is the
reference's). Flow:

  Flax DCAE init -> export_reference_state_dict -> strict torch
  load_state_dict -> both forwards on the same input -> compare
  y / means / scales / likelihoods / x_hat.

A failure means the converter or any block diverges from the reference's
actual math (VERDICT round-1 item 3).
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

STUB = os.path.join(os.path.dirname(os.path.abspath(__file__)), "refstub")
REF_DCAE = "/root/reference/models/dcae.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_DCAE), reason="reference tree not available")


def load_reference_dcae():
    os.environ.setdefault("MPLBACKEND", "Agg")
    if STUB not in sys.path:
        sys.path.insert(0, STUB)
    spec = importlib.util.spec_from_file_location("ref_dcae", REF_DCAE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_full_size_forward_parity():
    import jax
    import jax.numpy as jnp
    import torch

    from dcae_tpu.config import DCAEConfig
    from dcae_tpu.models.dcae import DCAE
    from dcae_tpu.utils.convert import export_reference_state_dict

    torch.manual_seed(0)
    torch.set_num_threads(max(1, os.cpu_count() or 1))

    cfg = DCAEConfig()  # full-size flagship
    model = DCAE(cfg)
    # >= 256: at 128 the hyper path is 4x4 and the reference's own
    # pad-to-window+1 quirk (models/dcae.py:371-375) crashes the reference
    H = W = 256
    x = np.random.RandomState(7).rand(1, H, W, 3).astype(np.float32)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.asarray(x), training=False)["params"]
    sd = export_reference_state_dict(params, cfg)

    ref = load_reference_dcae()
    net = ref.DCAE()
    net.eval()
    tsd = {k: torch.from_numpy(np.ascontiguousarray(v)).float()
           for k, v in sd.items()}
    # bypass the reference's load_state_dict override (it resizes rANS CDF
    # buffers we intentionally don't carry); strict=True proves the exported
    # tree covers every reference parameter exactly
    torch.nn.Module.load_state_dict(net, tsd, strict=True)

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
    with torch.no_grad():
        out_t = net(xt)
        y_t = net.g_a(xt)
        z_t = net.h_a(y_t)
        med_t = net.entropy_bottleneck._get_medians()

    # every rounding decision must sit safely away from the .5 boundary, or
    # a tiny numeric difference could legitimately flip a symbol (observed
    # margin at this seed: 3.5e-6; observed mu diff: ~1e-7)
    def boundary_margin(v):
        d = torch.abs(v - torch.round(v))
        return float((0.5 - d).min())

    assert boundary_margin(z_t - med_t) > 1e-5
    assert boundary_margin(y_t - out_t["para"]["means"]) > 1e-6

    # this jax build's DEFAULT matmul/conv precision is bf16-class even on
    # CPU (measured: single f32 conv 1.9e-3 off float64; HIGHEST = exact
    # f32, 1e-7) — parity vs torch f32 requires HIGHEST.
    with jax.default_matmul_precision("highest"):
        out_j = jax.jit(
            lambda p, xx: model.apply({"params": p}, xx, training=False)
        )(params, jnp.asarray(x))

    def check(name, tj, tt, atol):
        a = np.asarray(tj)
        b = tt.detach().numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(a, b, atol=atol, rtol=0,
                                   err_msg=name)

    # measured maxima at this seed (docs/PERF.md round-2): y 5.1e-6,
    # means 8.9e-8, scales 1.0e-7, like_y 1.9e-11, like_z 2.9e-6,
    # x_hat 1.8e-6 — tolerances carry ~20x headroom
    check("y", out_j["para"]["y"], out_t["para"]["y"], 1e-4)
    check("means", out_j["para"]["means"], out_t["para"]["means"], 1e-5)
    check("scales", out_j["para"]["scales"], out_t["para"]["scales"], 1e-5)
    check("like_y", out_j["likelihoods"]["y"], out_t["likelihoods"]["y"],
          1e-6)
    check("like_z", out_j["likelihoods"]["z"], out_t["likelihoods"]["z"],
          1e-4)
    check("x_hat", out_j["x_hat"], out_t["x_hat"], 1e-4)
