#!/usr/bin/env python3
"""Transforms-only autoencoder evaluation CLI.

Parity with two reference scripts:
- /root/reference/eval_g_a_g_s.py — joint eval: PSNR, MS-SSIM (dB),
  analytic compression ratio, per-stage encode/decode timing, per-image
  metrics files + reconstructed PNGs + summary file.
- /root/reference/eval_g_a_g_s_split.py (--split) — split deployment:
  g_a on the encoder device (CPU edge), latent shipped in a reduced
  dtype (fp16 default, ref :596-625), g_s on the accelerator; per-stage
  encode/transfer/decode timing, one-time size analysis
  (compute_size_analysis, ref :456-500), and g_a/g_s model sizes in MB.

The reference's split script resizes inputs to 256x256 (ref :529); we keep
native resolution + pad-to-128 (same protocol as every other eval here).
"""

import argparse
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dcae_tpu.config import DCAEConfig  # noqa: E402
from dcae_tpu.data.datasets import list_images, load_image  # noqa: E402
from dcae_tpu.models.autoencoder import SimpleAutoencoder, params_from_dcae  # noqa: E402
from dcae_tpu.ops.layers import crop_spatial, pad_spatial  # noqa: E402
from dcae_tpu.utils.checkpoint import load_params_only  # noqa: E402
from dcae_tpu.utils.metrics import ms_ssim, msssim_db, psnr  # noqa: E402
from dcae_tpu.utils.profiling import force_sync  # noqa: E402


_LATENT_BITS = {"float32": 32, "float16": 16, "bfloat16": 16, "int8": 8}


def tree_mb(tree) -> float:
    return sum(l.size * l.dtype.itemsize
               for l in jax.tree.leaves(tree)) / 2**20


def size_analysis(x_shape, y_shape, latent_dtype: str) -> dict:
    """Ref eval_g_a_g_s_split.py compute_size_analysis (:456-500): uint8
    image vs shipped-latent byte accounting, spatial/channel factors."""
    _, h, w, c = x_shape
    _, yh, yw, yc = y_shape
    bits = _LATENT_BITS[latent_dtype]
    orig_bits = h * w * c * 8
    latent_bits = yh * yw * yc * bits
    return {
        "orig_resolution": (h, w, c),
        "orig_size_mb": orig_bits / (8 * 2**20),
        "latent_resolution": (yh, yw, yc),
        "latent_dtype": latent_dtype,
        "latent_size_mb": latent_bits / (8 * 2**20),
        "spatial_reduction": (h * w) / (yh * yw),
        "channel_expansion": yc / c,
        "compression_ratio": orig_bits / latent_bits,
    }


def save_png(x_hat: np.ndarray, out_path: str) -> None:
    from PIL import Image

    img = np.clip(np.asarray(x_hat) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(img).save(out_path)


def _device(name: str):
    if not name:
        return None
    plat = name.split(":")[0]
    idx = int(name.split(":")[1]) if ":" in name else 0
    return jax.devices(plat)[idx]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--data", type=str, required=True)
    p.add_argument("--checkpoint", type=str, default=None,
                   help="SimpleAutoencoder checkpoint (train_autoencoder)")
    p.add_argument("--from_dcae", type=str, default=None,
                   help="pull g_a/g_s out of a full DCAE checkpoint")
    p.add_argument("--M", type=int, default=320,
                   help="latent channels (the reference split eval "
                        "shrinks to 160, eval_g_a_g_s_split.py:564)")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--save_path", type=str, default=None,
                   help="write reconstructed_*.png, metrics_*.txt and a "
                        "summary file here")
    p.add_argument("--split", action="store_true",
                   help="split deployment: g_a on --device_encoder, "
                        "latent shipped as --latent_dtype, g_s on "
                        "--device_decoder")
    p.add_argument("--device_encoder", type=str, default="cpu",
                   help="split mode g_a device (platform[:index])")
    p.add_argument("--device_decoder", type=str, default=None,
                   help="split mode g_s device; default = default backend")
    p.add_argument("--latent_dtype", type=str, default="float16",
                   choices=list(_LATENT_BITS),
                   help="shipped latent dtype in split mode (ref ships "
                        "fp16, eval_g_a_g_s_split.py:597)")
    p.add_argument("--seed", type=int, default=100)
    a = p.parse_args(argv)

    cfg = DCAEConfig.tiny(M=a.M) if a.tiny else DCAEConfig(M=a.M)
    model = SimpleAutoencoder(cfg)
    rng = jax.random.PRNGKey(a.seed)
    dummy = jnp.zeros((1, cfg.pad_multiple, cfg.pad_multiple, 3),
                      jnp.float32)
    params = model.init({"params": rng}, dummy)["params"]
    if a.checkpoint:
        params = load_params_only(a.checkpoint, params)
        print(f"loaded {a.checkpoint}")
    elif a.from_dcae:
        from dcae_tpu.models.dcae import DCAE
        full = DCAE(cfg)
        fp = full.init({"params": rng}, dummy, training=False)["params"]
        fp = load_params_only(a.from_dcae, fp)
        params = {**params, **params_from_dcae(fp)}
        print(f"loaded transforms from DCAE checkpoint {a.from_dcae}")

    g_a_mb, g_s_mb = tree_mb(params["g_a"]), tree_mb(params["g_s"])
    print(f"model sizes: g_a {g_a_mb:.2f} MB, g_s {g_s_mb:.2f} MB, "
          f"total {g_a_mb + g_s_mb:.2f} MB")

    enc_dev = _device(a.device_encoder) if a.split else None
    dec_dev = (_device(a.device_decoder) if a.device_decoder
               else (jax.devices()[0] if a.split else None))
    if a.split:
        print(f"split deployment: g_a on {enc_dev}, g_s on {dec_dev}, "
              f"latent shipped as {a.latent_dtype}")

    # jitted stages; in split mode each stage's params are committed to
    # its device, so the compiled programs run where their inputs live
    ga_params = jax.device_put(params["g_a"], enc_dev)
    gs_params = jax.device_put(params["g_s"], dec_dev)
    encode = jax.jit(lambda pr, x: model.apply(
        {"params": {"g_a": pr}}, x, method=SimpleAutoencoder.compress))
    decode = jax.jit(lambda pr, y: model.apply(
        {"params": {"g_s": pr}}, y, method=SimpleAutoencoder.decompress))

    lat_np_dtype = (np.dtype(a.latent_dtype)
                    if a.latent_dtype != "bfloat16" else jnp.bfloat16)

    if a.save_path:
        os.makedirs(a.save_path, exist_ok=True)

    tot = {"psnr": 0.0, "msssim": 0.0, "ratio": 0.0,
           "enc": 0.0, "xfer": 0.0, "dec": 0.0}
    count = 0
    msssim_count = 0
    analysis_done = False
    paths = list_images(a.data)
    if not paths:
        raise SystemExit(f"no images in {a.data}")
    for i, path in enumerate(paths):
        x = load_image(path)[None]
        padded, padding = pad_spatial(jnp.asarray(x), cfg.pad_multiple)
        padded = jax.device_put(padded, enc_dev)

        warm = i == 0  # first image compiles; exclude from timing
        t0 = time.perf_counter()
        y = encode(ga_params, padded)
        if a.split:
            y = y.astype(lat_np_dtype)
        force_sync(y)
        t1 = time.perf_counter()
        if a.split:
            y = jax.device_put(y, dec_dev)
            force_sync(y)
        t2 = time.perf_counter()
        x_hat = decode(gs_params, y.astype(jnp.float32))
        force_sync(x_hat)
        t3 = time.perf_counter()

        if not analysis_done:
            ana = size_analysis(padded.shape, y.shape,
                                a.latent_dtype if a.split else "float32")
            print("\nSIZE ANALYSIS (single padded image)")
            for k, v in ana.items():
                print(f"  {k}: {v if not isinstance(v, float) else round(v, 3)}")
            print()
            analysis_done = True

        x_hat = crop_spatial(np.asarray(jax.device_get(x_hat)), padding)
        p_db = float(psnr(jnp.asarray(x), jnp.asarray(x_hat)))
        try:
            ms_db = msssim_db(ms_ssim(jnp.asarray(x), jnp.asarray(x_hat)))
        except Exception:
            ms_db = float("nan")  # image below the 5-scale minimum
        ratio = ana["compression_ratio"]

        count += 1
        tot["psnr"] += p_db
        if not math.isnan(ms_db):
            # images below the 5-scale MS-SSIM minimum are excluded from
            # BOTH numerator and denominator (ADVICE r4: counting them as
            # 0.0 deflated the average)
            tot["msssim"] += ms_db
            msssim_count += 1
        tot["ratio"] += ratio
        if not warm:
            tot["enc"] += t1 - t0
            tot["xfer"] += t2 - t1
            tot["dec"] += t3 - t2
        stage = (f"enc {1000 * (t1 - t0):.1f} ms, "
                 f"xfer {1000 * (t2 - t1):.1f} ms, "
                 f"dec {1000 * (t3 - t2):.1f} ms"
                 if a.split else
                 f"enc {1000 * (t1 - t0):.1f} ms, "
                 f"dec {1000 * (t3 - t2):.1f} ms")
        print(f"{os.path.basename(path)}: PSNR {p_db:.2f} dB, "
              f"MS-SSIM {ms_db:.4f} dB, {stage}"
              + (" [warm-up]" if warm else ""))

        if a.save_path:
            name = os.path.splitext(os.path.basename(path))[0]
            with open(os.path.join(a.save_path,
                                   f"metrics_{name}.txt"), "w") as f:
                f.write(f"PSNR: {p_db:.2f}dB\n")
                f.write(f"MS-SSIM: {ms_db:.4f}\n")
                f.write(f"Compression Ratio: {ratio:.2f}\n")
            save_png(x_hat[0], os.path.join(a.save_path,
                                            f"reconstructed_{name}.png"))

    timed = max(count - 1, 1)  # warm-up image excluded
    lines = [
        f"Total images processed: {count}",
        f"Average PSNR: {tot['psnr'] / count:.2f} dB",
        f"Average MS-SSIM: "
        f"{tot['msssim'] / max(msssim_count, 1):.4f} dB"
        + (f" (over {msssim_count}/{count} images large enough for "
           f"5-scale MS-SSIM)" if msssim_count != count else ""),
        f"Average Compression Ratio: {tot['ratio'] / count:.2f}",
        f"Average encode time per image: "
        f"{1000 * tot['enc'] / timed:.3f} ms",
        f"Average decode time per image: "
        f"{1000 * tot['dec'] / timed:.3f} ms",
    ]
    if a.split:
        lines.insert(0, f"Split Deployment: g_a on {enc_dev}, "
                        f"g_s on {dec_dev} ({a.latent_dtype} latent)")
        lines.append(f"Average transfer time per image: "
                     f"{1000 * tot['xfer'] / timed:.3f} ms")
    print("\n" + "=" * 50 + "\nEVALUATION RESULTS\n" + "=" * 50)
    print("\n".join(lines))
    if a.save_path:
        suffix = "_split" if a.split else ""
        out = os.path.join(a.save_path, f"summary_results{suffix}.txt")
        with open(out, "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"results saved to {out}")


if __name__ == "__main__":
    main()
