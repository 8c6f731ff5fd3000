#!/usr/bin/env python3
"""Edge-encode client — behavior parity with /root/reference/client.py:
compress images, pack .bin payloads, ship them to a receiver over the
name|size + ACK TCP protocol."""

import argparse
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax.numpy as jnp  # noqa: E402

from dcae_tpu.config import DCAEConfig  # noqa: E402
from dcae_tpu.data.datasets import list_images, load_image  # noqa: E402
from dcae_tpu.models.codec import DCAECodec  # noqa: E402
from dcae_tpu.ops.layers import pad_spatial  # noqa: E402
from dcae_tpu.runtime.container import pack_bin  # noqa: E402
from dcae_tpu.runtime.service import send_bytes  # noqa: E402
from dcae_tpu.utils.checkpoint import load_params_only, load_tables  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", type=str, required=True)
    p.add_argument("--host", type=str, default="localhost")
    p.add_argument("--port", type=int, default=8888)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--tiny", action="store_true")
    a = p.parse_args(argv)

    cfg = DCAEConfig.tiny() if a.tiny else DCAEConfig()
    codec = DCAECodec(cfg)
    if a.checkpoint:
        codec.params = load_params_only(a.checkpoint, codec.params)
        codec.tables = load_tables(a.checkpoint)
    codec.update()

    for path in list_images(a.data):
        x = load_image(path)[None]
        h, w = x.shape[1:3]
        padded, _ = pad_spatial(jnp.asarray(x), cfg.pad_multiple)
        enc = codec.compress(padded)
        payload = pack_bin(enc["strings"], (h, w))
        name = os.path.splitext(os.path.basename(path))[0] + ".bin"
        print(f"sending {name} ({len(payload)} bytes) "
              f"-> {a.host}:{a.port}")
        send_bytes(name, payload, a.host, a.port)


if __name__ == "__main__":
    main()
