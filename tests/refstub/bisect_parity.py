"""Stage-wise g_a bisect between the Flax model and the reference torch
model (same exported weights): finds WHERE the forward diverges.
Run: python tests/refstub/bisect_parity.py"""

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


def main():
    import jax
    import jax.numpy as jnp
    import torch

    from dcae_tpu.config import DCAEConfig
    from dcae_tpu.models.dcae import DCAE
    from dcae_tpu.utils.convert import export_reference_state_dict

    torch.manual_seed(0)
    cfg = DCAEConfig()
    model = DCAE(cfg)
    H = W = 256
    x = np.random.RandomState(7).rand(1, H, W, 3).astype(np.float32)
    print("init flax params...", flush=True)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.asarray(x), training=False)["params"]
    sd = export_reference_state_dict(params, cfg)

    spec = importlib.util.spec_from_file_location(
        "ref_dcae", "/root/reference/models/dcae.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    net = ref.DCAE()
    net.eval()
    tsd = {k: torch.from_numpy(np.ascontiguousarray(v)).float()
           for k, v in sd.items()}
    torch.nn.Module.load_state_dict(net, tsd, strict=True)

    # torch g_a stage by stage
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
    t_stages = []
    with torch.no_grad():
        h = xt
        for m in net.g_a:
            h = m(h)
            t_stages.append(h.numpy().transpose(0, 2, 3, 1))

    # flax g_a stage outputs via capture_intermediates
    names = {"down0", "swin1", "down1", "swin2", "down2", "swin3", "down3"}

    def filt(mdl, method_name):
        return method_name == "__call__" and mdl.name in names

    print("flax forward with intermediates...", flush=True)
    out, mut = model.apply({"params": params}, jnp.asarray(x),
                           training=False,
                           capture_intermediates=filt,
                           mutable=["intermediates"])
    inter = mut["intermediates"]["g_a"]
    order = ["down0", "swin1", "down1", "swin2", "down2", "swin3", "down3"]
    for i, name in enumerate(order):
        a = np.asarray(inter[name]["__call__"][0])
        b = t_stages[i]
        d = np.abs(a - b)
        print(f"g_a[{i}] {name:6s} max {d.max():.3e} mean {d.mean():.3e} "
              f"absmax {np.abs(b).max():.3e}", flush=True)

    # drill into swin3's first sub-blocks if it's the diverging stage:
    # compare swin1 (1 block) vs down-stream growth to localize.


if __name__ == "__main__":
    main()
