#!/usr/bin/env python3
"""Bitstream codec CLI — behavior parity with
/root/reference/compress_and_decompress.py: compress a directory of images
to .bin files (pad-to-128 + exact container layout) or decompress .bin files
back to .png."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax.numpy as jnp  # noqa: E402

from dcae_tpu.config import DCAEConfig  # noqa: E402
from dcae_tpu.data.datasets import list_images, load_image  # noqa: E402
from dcae_tpu.models.codec import DCAECodec  # noqa: E402
from dcae_tpu.ops.layers import crop_spatial, pad_spatial  # noqa: E402
from dcae_tpu.runtime import container  # noqa: E402
from dcae_tpu.utils.checkpoint import load_params_only, load_tables  # noqa: E402


def save_png(x_hat: np.ndarray, out_path: str) -> None:
    from PIL import Image

    img = np.clip(np.asarray(x_hat[0]) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    Image.fromarray(img).save(out_path)


def compress_dir(codec: DCAECodec, data: str, save_path: str,
                 interleaved: bool = False,
                 latent_dtype: str = None) -> None:
    bin_dir = os.path.join(save_path, "bin")
    os.makedirs(bin_dir, exist_ok=True)
    for path in list_images(data):
        x = load_image(path)[None]
        h, w = x.shape[1:3]
        padded, _ = pad_spatial(jnp.asarray(x), codec.cfg.pad_multiple)
        name = os.path.splitext(os.path.basename(path))[0] + ".bin"
        if latent_dtype:
            # latent-handoff profile (ref eval_3.py:103 / DCAE_4): ship
            # raw y, no entropy coding; int8 is the check.py:668-679
            # size experiment (max-abs scaled here, not plain-cast)
            y = codec.compress_latent(padded)
            data_bytes = container.pack_latent(y, (h, w),
                                               dtype=latent_dtype)
            with open(os.path.join(bin_dir, name), "wb") as f:
                f.write(data_bytes)
            print(f"{path} -> {name} ({len(data_bytes)} bytes, "
                  f"DLT1 {latent_dtype})")
            continue
        if interleaved:
            # device-decode profile (DTI1): falls back to the classic
            # container when a symbol escapes the coding tables
            from dcae_tpu.entropy.rans import EscapeError
            try:
                enc = codec.compress_device(padded)
                data_bytes = container.pack_bin_interleaved(enc, (h, w))
                with open(os.path.join(bin_dir, name), "wb") as f:
                    f.write(data_bytes)
                print(f"{path} -> {name} ({len(data_bytes)} bytes, DTI1)")
                continue
            except EscapeError:
                print(f"{path}: escape symbol; falling back to classic .bin")
        enc = codec.compress(padded)
        container.save_bin(os.path.join(bin_dir, name), enc["strings"],
                           (h, w))
        print(f"{path} -> {name} "
              f"({sum(len(s) for g in enc['strings'] for s in g)} bytes)")


def decompress_dir(codec: DCAECodec, data: str, save_path: str) -> None:
    png_dir = os.path.join(save_path, "png")
    os.makedirs(png_dir, exist_ok=True)
    bins = [f for f in sorted(os.listdir(data)) if f.endswith(".bin")]
    for name in bins:
        with open(os.path.join(data, name), "rb") as f:
            raw = f.read()
        if container.is_latent_bin(raw):
            y, padding, _ = container.unpack_latent(
                raw, codec.cfg.pad_multiple)
            dec = codec.decompress_latent(y)
        elif container.is_interleaved_bin(raw):
            enc, padding, _ = container.unpack_bin_interleaved(
                raw, codec.cfg.pad_multiple, codec.cfg.z_downsample)
            dec = codec.decompress_interleaved(enc)
            if not bool(dec["ok"]):
                raise ValueError(f"{name}: lanes checksum failed "
                                 "(corrupt stream or table mismatch)")
        else:
            strings, z_shape, padding, _ = container.unpack_bin(
                raw, codec.cfg.pad_multiple, codec.cfg.z_downsample)
            dec = codec.decompress(strings, z_shape)
        x_hat = crop_spatial(dec["x_hat"], padding)
        out = os.path.join(png_dir, os.path.splitext(name)[0] + ".png")
        save_png(np.asarray(x_hat), out)
        print(f"{name} -> {out}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["compress", "decompress"],
                   required=True)
    p.add_argument("--data", type=str, required=True,
                   help="image dir (compress) or .bin dir (decompress)")
    p.add_argument("--save_path", type=str, default="./output")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--interleaved", action="store_true",
                   help="write the device-decode (DTI1) container; "
                        "decompress auto-detects either format")
    p.add_argument("--latent", nargs="?", const="float32", default=None,
                   dest="latent_dtype", metavar="DTYPE",
                   choices=["float32", "float16", "bfloat16", "int8"],
                   help="latent-handoff mode (ref eval_3.py): compress "
                        "writes raw-y DLT1 containers in the given dtype "
                        "instead of entropy-coded bitstreams; decompress "
                        "auto-detects (int8 = check.py:668 cast "
                        "experiment, max-abs scaled)")
    a = p.parse_args(argv)

    cfg = DCAEConfig.tiny() if a.tiny else DCAEConfig()
    codec = DCAECodec(cfg)
    if a.checkpoint:
        codec.params = load_params_only(a.checkpoint, codec.params)
        codec.tables = load_tables(a.checkpoint)
    codec.update()

    if a.mode == "compress":
        compress_dir(codec, a.data, a.save_path, interleaved=a.interleaved,
                     latent_dtype=a.latent_dtype)
    else:
        decompress_dir(codec, a.data, a.save_path)


if __name__ == "__main__":
    main()
