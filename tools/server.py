#!/usr/bin/env python3
"""Bitstream receive server — behavior parity with
/root/reference/server.py (accept loop, name|size header, ACK, chunked
receive into ./output/binary/bin/received_*), with an optional --decode mode
that decompresses payloads on arrival (the reference decodes offline)."""

import argparse
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dcae_tpu.runtime.service import BitstreamServer  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--port", type=int, default=8888)
    p.add_argument("--out", type=str, default="./output/binary/bin")
    p.add_argument("--decode", action="store_true",
                   help="decode received .bin payloads to png on arrival")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--tiny", action="store_true")
    a = p.parse_args(argv)

    on_payload = None
    if a.decode:
        import numpy as np
        from dcae_tpu.config import DCAEConfig
        from dcae_tpu.models.codec import DCAECodec
        from dcae_tpu.ops.layers import crop_spatial
        from dcae_tpu.runtime.container import (is_interleaved_bin,
                                                unpack_bin,
                                                unpack_bin_interleaved)
        from dcae_tpu.utils.checkpoint import load_params_only, load_tables
        from tools.compress_and_decompress import save_png

        cfg = DCAEConfig.tiny() if a.tiny else DCAEConfig()
        codec = DCAECodec(cfg)
        if a.checkpoint:
            codec.params = load_params_only(a.checkpoint, codec.params)
            codec.tables = load_tables(a.checkpoint)
        codec.update()

        def on_payload(name: str, data: bytes) -> None:
            if is_interleaved_bin(data):  # device-decode profile (DTI1)
                enc, padding, _ = unpack_bin_interleaved(
                    data, cfg.pad_multiple, cfg.z_downsample)
                dec = codec.decompress_interleaved(enc)
                if not bool(dec["ok"]):
                    raise ValueError(f"{name}: lanes checksum failed")
            else:
                strings, z_shape, padding, _ = unpack_bin(
                    data, cfg.pad_multiple, cfg.z_downsample)
                dec = codec.decompress(strings, z_shape)
            x_hat = crop_spatial(dec["x_hat"], padding)
            out = os.path.join(a.out, os.path.splitext(name)[0] + ".png")
            save_png(np.asarray(x_hat), out)
            print(f"decoded {name} -> {out}")

    server = BitstreamServer(a.port, a.out, on_payload)
    print(f"listening on :{a.port}")
    server.start()


if __name__ == "__main__":
    main()
