"""Scratch driver for the reference-parity check (the pytest version lives
in tests/test_reference_parity.py; this prints raw diffs for tolerance
setting). Run: python tests/refstub/run_parity.py [HxW]"""

import importlib.util
import os
import sys

os.environ.setdefault("MPLBACKEND", "Agg")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

STUB = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(STUB))
sys.path.insert(0, STUB)
sys.path.insert(0, REPO)


def load_reference_dcae():
    spec = importlib.util.spec_from_file_location(
        "ref_dcae", "/root/reference/models/dcae.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    # NOTE: >= 256 required — at 128 the hyper path is 4x4 and the
    # reference's own SwinBlockWithConvMulti padding quirk (pads size<=window
    # to window+1, ref models/dcae.py:371-375) crashes the reference.
    size = sys.argv[1] if len(sys.argv) > 1 else "256x256"
    H, W = map(int, size.split("x"))

    import jax
    import jax.numpy as jnp
    import torch

    from dcae_tpu.config import DCAEConfig
    from dcae_tpu.models.dcae import DCAE
    from dcae_tpu.utils.convert import export_reference_state_dict

    torch.manual_seed(0)
    cfg = DCAEConfig()
    model = DCAE(cfg)
    x = np.random.RandomState(7).rand(1, H, W, 3).astype(np.float32)
    print("init flax params...", flush=True)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.asarray(x), training=False)["params"]
    print("export to reference layout...", flush=True)
    sd = export_reference_state_dict(params, cfg)

    print("build reference torch model...", flush=True)
    ref = load_reference_dcae()
    net = ref.DCAE()
    net.eval()
    tsd = {k: torch.from_numpy(np.ascontiguousarray(v)).float()
           for k, v in sd.items()}
    torch.nn.Module.load_state_dict(net, tsd, strict=True)
    print("loaded strict OK", flush=True)

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2)).float()
    with torch.no_grad():
        out_t = net(xt)
        y_t = net.g_a(xt)
        z_t = net.h_a(y_t)
        med_t = net.entropy_bottleneck._get_medians()

    # rounding-boundary safety: all round() decisions must be far from .5
    def boundary_margin(v):
        d = torch.abs(v - torch.round(v))
        return float((0.5 - d).min())

    mz = boundary_margin(z_t - med_t)
    my = boundary_margin(y_t - out_t["para"]["means"])
    print(f"boundary margin z={mz:.2e} y={my:.2e}", flush=True)

    print("flax forward...", flush=True)
    # default matmul precision in this jax build is bf16-class even on CPU;
    # parity vs torch f32 needs HIGHEST (exact f32) — measured in
    # docs/PERF.md round-2 notes
    with jax.default_matmul_precision("highest"):
        out_j = jax.jit(
            lambda p, xx: model.apply({"params": p}, xx, training=False)
        )(params, jnp.asarray(x))

    def cmp(name, tj, tt):
        a = np.asarray(tj)
        b = tt.detach().numpy().transpose(0, 2, 3, 1)
        d = np.abs(a - b)
        print(f"{name:12s} max {d.max():.3e} mean {d.mean():.3e} "
              f"ref_absmax {np.abs(b).max():.3e}", flush=True)

    cmp("y", out_j["para"]["y"], out_t["para"]["y"])
    cmp("means", out_j["para"]["means"], out_t["para"]["means"])
    cmp("scales", out_j["para"]["scales"], out_t["para"]["scales"])
    cmp("like_y", out_j["likelihoods"]["y"], out_t["likelihoods"]["y"])
    cmp("like_z", out_j["likelihoods"]["z"], out_t["likelihoods"]["z"])
    cmp("x_hat", out_j["x_hat"], out_t["x_hat"])


if __name__ == "__main__":
    main()
