#!/usr/bin/env python3
"""Mesh-sharded (data-parallel) forward eval of an image directory.

Scales the reference's single-GPU eval protocol across a TPU mesh: batches
are sharded over the dp axis (optionally sp over image rows), XLA inserts
the collectives, and the aggregate likelihood-bpp / PSNR / throughput are
reported. The real entropy-coded path stays per-codec (host rANS); for
multi-chip real coding build one DCAECodec per device (DCAECodec(device=)
— see tools/eval.py --device_encoder/--device_decoder).

Usage:
    python tools/eval_sharded.py --data DIR [--checkpoint CKPT] [--sp N]
        [--batch-size 8] [--patch 512] [--tiny]

Run tests/smoke on the virtual CPU mesh with:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
(ref eval protocol: /root/reference/eval_1.py:45-59,132-208; DDP analog
train.py:413-426.)
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main(argv=None):
    p = argparse.ArgumentParser(description="sharded forward eval")
    p.add_argument("--data", type=str, required=True)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--patch", type=int, default=None,
                   help="center-crop eval patch (default: pad originals)")
    p.add_argument("--sp", type=int, default=1,
                   help="spatial mesh axis (dp = n_devices // sp)")
    p.add_argument("--lmbda", type=float, default=0.013)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--tiny", action="store_true")
    a = p.parse_args(argv)

    import os

    import jax

    # the hosted TPU plugin re-registers itself over the JAX_PLATFORMS env
    # var; force the config path too so the virtual CPU mesh recipe in the
    # module docstring actually yields N devices
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import jax.numpy as jnp
    import numpy as np

    from dcae_tpu.config import DCAEConfig
    from dcae_tpu.data.datasets import list_images, load_image
    from dcae_tpu.models.dcae import DCAE
    from dcae_tpu.ops.layers import pad_spatial
    from dcae_tpu.parallel import mesh as pmesh
    from dcae_tpu.train.step import make_eval_step
    from dcae_tpu.utils.checkpoint import load_params_only
    from dcae_tpu.utils.metrics import AverageMeter

    cfg = DCAEConfig.tiny() if a.tiny else DCAEConfig()
    model = DCAE(cfg)

    n_dev = len(jax.devices())
    dp = max(1, n_dev // a.sp)
    while dp > 1 and a.batch_size % dp != 0:
        dp -= 1
    mesh = pmesh.make_mesh(n_devices=dp * a.sp, sp=a.sp)
    print(f"mesh: dp={dp} sp={a.sp} over {dp * a.sp}/{n_dev} devices")

    files = list_images(a.data)
    if a.limit:
        files = files[:a.limit]
    if not files:
        raise SystemExit(f"no images under {a.data}")

    # one padded geometry for the whole run (jit-stable shapes): crop to
    # --patch, or pad everything to the largest padded size
    def prep(path):
        x = load_image(path)
        if a.patch:
            h, w = x.shape[:2]
            t = max(0, (h - a.patch) // 2)
            l = max(0, (w - a.patch) // 2)
            x = x[t:t + a.patch, l:l + a.patch]
        padded, _ = pad_spatial(jnp.asarray(x)[None], cfg.pad_multiple)
        return np.asarray(padded[0])

    imgs = [prep(f) for f in files]
    hmax = max(i.shape[0] for i in imgs)
    wmax = max(i.shape[1] for i in imgs)
    imgs = [np.pad(i, ((0, hmax - i.shape[0]), (0, wmax - i.shape[1]),
                       (0, 0))) for i in imgs]

    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((1, cfg.pad_multiple, cfg.pad_multiple,
                                   cfg.in_channels)), training=False)["params"]
    if a.checkpoint:
        params = load_params_only(a.checkpoint, params)
    params = jax.device_put(params, pmesh.replicated(mesh))
    eval_step = pmesh.shard_eval_step(
        make_eval_step(model, a.lmbda), mesh)
    eval_rem = jax.jit(make_eval_step(model, a.lmbda))
    bshard = pmesh.batch_sharding(mesh)

    meters = {k: AverageMeter() for k in ("loss", "bpp_loss", "psnr")}
    t0 = time.time()
    n_done = 0
    for i in range(0, len(imgs), a.batch_size):
        batch = jnp.asarray(np.stack(imgs[i:i + a.batch_size]))
        if batch.shape[0] % mesh.shape["dp"] == 0:
            m = eval_step(params, jax.device_put(batch, bshard))
        else:
            m = eval_rem(params, batch)
        for k in meters:
            meters[k].update(float(m[k]), batch.shape[0])
        n_done += batch.shape[0]
    dt = time.time() - t0
    print(f"{n_done} images in {dt:.1f}s = {n_done / dt:.2f} img/s | "
          f"bpp {meters['bpp_loss'].avg:.4f} | "
          f"psnr {meters['psnr'].avg:.2f} dB | loss {meters['loss'].avg:.4f}")


if __name__ == "__main__":
    main()
