#!/usr/bin/env python3
"""Evaluation CLI — protocol parity with /root/reference/eval.py /
eval_1.py: PSNR / MS-SSIM(dB) / bpp / enc+dec latency over a directory,
--real for entropy-coded round trips."""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dcae_tpu.config import DCAEConfig  # noqa: E402
from dcae_tpu.eval_lib import eval_directory  # noqa: E402
from dcae_tpu.models.codec import DCAECodec  # noqa: E402
from dcae_tpu.utils.checkpoint import load_params_only, load_tables  # noqa: E402


def two_phase(codec, a):
    """Two-phase eval: --mode compress pickles each image's whole out_enc
    (strings + shape + original size) to save_path; --mode decompress
    reloads the pickles, decodes, and reports metrics vs the originals
    (ref eval_2.py:133-160)."""
    import os
    import pickle

    import jax.numpy as jnp
    import numpy as np

    from dcae_tpu.data.datasets import list_images, load_image
    from dcae_tpu.ops.layers import crop_spatial, pad_spatial
    from dcae_tpu.utils.metrics import psnr, real_bpp

    files = list_images(a.data)
    if a.limit:
        files = files[:a.limit]
    codec.update()
    os.makedirs(a.save_path, exist_ok=True)

    if a.mode == "compress":
        for path in files:
            x = load_image(path)[None]
            padded, padding = pad_spatial(jnp.asarray(x),
                                          codec.cfg.pad_multiple)
            out_enc = codec.compress(padded)
            out_enc["size"] = (x.shape[1], x.shape[2])
            out_enc["padding"] = padding
            name = os.path.splitext(os.path.basename(path))[0]
            with open(os.path.join(a.save_path, name + ".pkl"), "wb") as f:
                pickle.dump(out_enc, f)
            print(f"{path}: {real_bpp(out_enc['strings'], x.shape[1] * x.shape[2]):.4f} bpp")
        return

    bpps, psnrs = [], []
    for path in files:
        name = os.path.splitext(os.path.basename(path))[0]
        pkl = os.path.join(a.save_path, name + ".pkl")
        if not os.path.exists(pkl):
            continue
        with open(pkl, "rb") as f:
            out_enc = pickle.load(f)
        x = load_image(path)[None]
        dec = codec.decompress(out_enc["strings"], out_enc["shape"])
        x_hat = crop_spatial(dec["x_hat"], out_enc["padding"])
        p_ = float(psnr(jnp.asarray(x), x_hat))
        b_ = real_bpp(out_enc["strings"], x.shape[1] * x.shape[2])
        bpps.append(b_)
        psnrs.append(p_)
        print(f"{path}: psnr {p_:.2f} dB | bpp {b_:.4f}")
    if not bpps:
        raise SystemExit(
            f"no encoded .pkl payloads found in {a.save_path} for "
            f"{len(files)} images — run --mode compress first")
    print(f"average: psnr {np.mean(psnrs):.3f} dB | "
          f"bpp {np.mean(bpps):.4f} over {len(bpps)} images")


class CrossDeviceCodec:
    """compress on one device's codec, decompress on another's (ref
    eval_1.py: compress(..., device=encoder) / decompress(...,
    device=decoder)). Reduced-precision platform differences make the
    recomputed sigma->index mapping drift across heterogeneous devices —
    exactly the reference's CPU/GPU drift problem — so ship_indexes=True
    uses the DCAE_6 protocol (encoder ships its coding indexes) for an
    exact decode."""

    def __init__(self, enc, dec, ship_indexes: bool = False):
        self.enc, self.dec = enc, dec
        self.cfg = enc.cfg
        self.ship = ship_indexes
        self._indexes = None

    def update(self, *a, **k):
        changed = self.enc.update(*a, **k)
        self.dec.tables = self.enc.tables
        self.dec._scale_table = self.enc._scale_table
        return changed

    def forward(self, x):
        return self.enc.forward(x)

    def compress(self, x):
        if self.ship:
            out = self.enc.compress_with_indexes(x)
            self._indexes = out.pop("indexes")
            return out
        return self.enc.compress(x)

    def decompress(self, strings, shape):
        idx, self._indexes = self._indexes, None
        return self.dec.decompress(strings, shape, indexes=idx)


def main(argv=None):
    p = argparse.ArgumentParser(description="DCAE-TPU evaluation")
    p.add_argument("--data", type=str, required=True)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--real", action="store_true",
                   help="entropy-coded round trip (default: forward-only)")
    p.add_argument("--mode", type=str, default="both",
                   choices=["both", "size_analysis", "compress",
                            "decompress"],
                   help="size_analysis: payload/model byte accounting "
                        "(ref eval.py analyze_data_size); compress/"
                        "decompress: two-phase eval persisting the whole "
                        "out_enc per image (ref eval_2.py:133-160)")
    p.add_argument("--save_path", type=str, default="./eval_out",
                   help="out_enc pickle dir for two-phase modes")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--tiny", action="store_true",
                   help="tiny config (tests/smoke)")
    p.add_argument("--bd_dataset", type=str, default=None,
                   choices=["Kodak", "CLIC", "Tecnick", "Kodak-msssim"],
                   help="print the golden RD curve for comparison")
    p.add_argument("--device_encoder", type=str, default=None,
                   help="device for compress, e.g. tpu:0 / cpu:0 "
                        "(ref eval_1.py cross-device eval)")
    p.add_argument("--device_decoder", type=str, default=None)
    p.add_argument("--profile", choices=["classic", "interleaved"],
                   default="classic",
                   help="interleaved = device-decode profile (real mode): "
                        "entropy decoding runs on the accelerator; bpp "
                        "counts the full DTI1 payload")
    p.add_argument("--ship_indexes", action="store_true",
                   help="with cross-device eval: encoder ships its coding "
                        "indexes so heterogeneous-precision decode is "
                        "exact (ref eval_6.py / DCAE_6)")
    a = p.parse_args(argv)

    cfg = DCAEConfig.tiny() if a.tiny else DCAEConfig()
    codec = DCAECodec(cfg)
    if a.checkpoint:
        codec.params = load_params_only(a.checkpoint, codec.params)
        codec.tables = load_tables(a.checkpoint)
    if a.device_encoder or a.device_decoder:
        import jax

        def dev(spec):
            if spec is None:
                return None
            kind, _, idx = spec.partition(":")
            return jax.devices(kind)[int(idx or 0)]

        enc = DCAECodec(cfg, params=codec.params, tables=codec.tables,
                        device=dev(a.device_encoder))
        dec = DCAECodec(cfg, params=codec.params, tables=codec.tables,
                        device=dev(a.device_decoder))
        codec = CrossDeviceCodec(enc, dec, ship_indexes=a.ship_indexes)
    if a.mode == "size_analysis":
        import json

        import jax.numpy as jnp

        from dcae_tpu.data.datasets import list_images, load_image
        from dcae_tpu.ops.layers import pad_spatial

        codec.update()
        path = list_images(a.data)[0]
        x = load_image(path)[None]
        padded, _ = pad_spatial(jnp.asarray(x), cfg.pad_multiple)
        print(json.dumps(codec.analyze_sizes(padded), indent=2))
        return
    if a.mode in ("compress", "decompress"):
        two_phase(codec, a)
        return
    if a.real:
        codec.update()  # no-op when tables came with the checkpoint
    summary = eval_directory(codec, a.data, real=a.real, limit=a.limit,
                             profile=a.profile)
    if a.bd_dataset:
        from dcae_tpu.data.rd_reference import REFERENCE_RD
        golden = REFERENCE_RD[a.bd_dataset]
        print(f"golden {a.bd_dataset} RD (6 lambdas): "
              f"bpp {golden['bpp']} / "
              f"{'psnr' if 'psnr' in golden else 'msssim_db'} "
              f"{golden.get('psnr', golden.get('msssim_db'))}")
        print(f"this checkpoint: bpp {summary['bpp']:.4f} "
              f"psnr {summary['psnr']:.3f} dB — collect all 6 lambda "
              f"checkpoints and use dcae_tpu.data.rd_reference."
              f"compare_to_reference for the BD-rate.")


if __name__ == "__main__":
    main()
