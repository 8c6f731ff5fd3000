"""Evaluation layer (L5): dataset eval with the reference protocol.

Protocol (SURVEY.md §2.4, BASELINE.md): list images in a directory, center
pad-to-128, two modes — real (entropy-coded round trip; bpp from stream
bytes) and forward-only (bpp from likelihoods) — PSNR and MS-SSIM (reported
in dB), per-image encode/decode wall time with device sync, first image
treated as warm-up and excluded from timing.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dcae_tpu.data.datasets import list_images, load_image
from dcae_tpu.models.codec import DCAECodec
from dcae_tpu.ops.layers import crop_spatial, pad_spatial
from dcae_tpu.utils.metrics import (AverageMeter, likelihood_bpp, ms_ssim,
                                    msssim_db, psnr)


@dataclasses.dataclass
class ImageResult:
    name: str
    psnr: float
    msssim_db: float
    bpp: float
    enc_time: float
    dec_time: float


def _eval_coded_round_trip(codec: DCAECodec, x: np.ndarray,
                           compress_fn, decompress_fn,
                           byte_count_fn) -> ImageResult:
    """Shared scaffolding of the real-coded eval modes: pad, timed
    compress/decompress, crop, PSNR/MS-SSIM, bpp from byte_count_fn."""
    h, w = x.shape[1:3]
    num_pixels = h * w
    padded, padding = pad_spatial(jnp.asarray(x), codec.cfg.pad_multiple)

    t0 = time.perf_counter()
    enc = compress_fn(padded)
    t1 = time.perf_counter()
    dec = decompress_fn(enc)
    x_hat = jax.block_until_ready(dec["x_hat"])
    t2 = time.perf_counter()
    if not bool(dec.get("ok", True)):
        raise ValueError("interleaved decode lanes checksum failed")

    x_hat = crop_spatial(x_hat, padding)
    p = float(psnr(jnp.asarray(x), x_hat))
    try:
        ms = msssim_db(ms_ssim(jnp.asarray(x), x_hat))
    except Exception:
        ms = float("nan")  # image smaller than the 5-scale minimum
    return ImageResult("", p, ms, byte_count_fn(enc) * 8.0 / num_pixels,
                       t1 - t0, t2 - t1)


def eval_image_real(codec: DCAECodec, x: np.ndarray) -> ImageResult:
    """Entropy-coded round trip of one image (B=1 NHWC in [0,1])."""
    return _eval_coded_round_trip(
        codec, x,
        codec.compress,
        lambda enc: codec.decompress(enc["strings"], enc["shape"]),
        lambda enc: sum(len(s) for g in enc["strings"] for s in g))


def eval_image_interleaved(codec: DCAECodec, x: np.ndarray) -> ImageResult:
    """Entropy-coded round trip in the device-decode profile: bpp counts
    the full DTI1 payload (streams + lane states + z), so the profile's
    rate overhead is visible; the decode path is host-z + one device
    program (no per-slice round trips). An escape symbol (outside the
    coding tables) falls back to the classic path for that image, like
    every other profile surface."""
    from dcae_tpu.entropy.rans import EscapeError

    try:
        return _eval_coded_round_trip(
            codec, x,
            codec.compress_device,
            codec.decompress_interleaved,
            lambda enc: (sum(len(s) for s in enc["istreams"])
                         + enc["states"].nbytes
                         + sum(len(s) for s in enc["z_strings"])))
    except EscapeError:
        return eval_image_real(codec, x)


def eval_image_forward(codec: DCAECodec, x: np.ndarray) -> ImageResult:
    """Forward-only eval: bpp from likelihoods, no bitstream."""
    h, w = x.shape[1:3]
    padded, padding = pad_spatial(jnp.asarray(x), codec.cfg.pad_multiple)
    t0 = time.perf_counter()
    out = codec.forward(padded)
    x_hat = jax.block_until_ready(out["x_hat"])
    t1 = time.perf_counter()
    x_hat = crop_spatial(jnp.clip(x_hat, 0, 1), padding)
    p = float(psnr(jnp.asarray(x), x_hat))
    try:
        ms = msssim_db(ms_ssim(jnp.asarray(x), x_hat))
    except Exception:
        ms = float("nan")
    bpp = float(likelihood_bpp(out["likelihoods"], h * w))
    return ImageResult("", p, ms, bpp, t1 - t0, 0.0)


def eval_directory(codec: DCAECodec, data_dir: str, real: bool = False,
                   limit: Optional[int] = None,
                   verbose: bool = True,
                   profile: str = "classic") -> Dict[str, float]:
    files = list_images(data_dir)
    if limit:
        files = files[:limit]
    if profile == "interleaved":
        if not real:
            raise ValueError(
                "profile='interleaved' requires real=True (the device-"
                "decode profile is an entropy-coded round trip; forward "
                "mode has no bitstream)")
        fn = eval_image_interleaved
    else:
        fn = eval_image_real if real else eval_image_forward

    meters = {k: AverageMeter() for k in
              ("psnr", "msssim_db", "bpp", "enc_time", "dec_time")}
    results: List[ImageResult] = []
    for i, path in enumerate(files):
        x = load_image(path)[None]
        r = fn(codec, x)
        r.name = path
        results.append(r)
        if i == 0 and len(files) > 1:
            continue  # warm-up (compile) excluded from averages
        meters["psnr"].update(r.psnr)
        if np.isfinite(r.msssim_db):
            meters["msssim_db"].update(r.msssim_db)
        meters["bpp"].update(r.bpp)
        meters["enc_time"].update(r.enc_time)
        meters["dec_time"].update(r.dec_time)
        if verbose:
            print(f"{path}: psnr {r.psnr:.2f} dB | msssim {r.msssim_db:.2f} "
                  f"dB | bpp {r.bpp:.4f} | enc {r.enc_time * 1e3:.0f} ms | "
                  f"dec {r.dec_time * 1e3:.0f} ms")

    summary = {k: m.avg for k, m in meters.items()}
    summary["n_images"] = len(files)
    if verbose:
        print(f"average: psnr {summary['psnr']:.3f} dB | "
              f"msssim {summary['msssim_db']:.3f} dB | "
              f"bpp {summary['bpp']:.4f} | "
              f"enc {summary['enc_time'] * 1e3:.1f} ms | "
              f"dec {summary['dec_time'] * 1e3:.1f} ms")
    return summary
