#!/usr/bin/env python3
"""bpp / size / compression-ratio report over a directory of .bin files —
parity with /root/reference/rpc/cal_bin.py:14-88."""

import argparse
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dcae_tpu.runtime.container import read_bin  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", type=str, required=True, help=".bin directory")
    a = p.parse_args(argv)

    bins = [f for f in sorted(os.listdir(a.data)) if f.endswith(".bin")]
    if not bins:
        print(f"no .bin files under {a.data}")
        return
    total_bpp = total_ratio = 0.0
    for name in bins:
        path = os.path.join(a.data, name)
        strings, _, _, (h, w) = read_bin(path)
        nbytes = os.path.getsize(path)
        y_len = len(strings[0][0])
        z_len = len(strings[1][0])
        bpp = nbytes * 8 / (h * w)
        ratio = (h * w * 3) / nbytes
        total_bpp += bpp
        total_ratio += ratio
        print(f"{name}: {h}x{w} | {nbytes} B (y {y_len}, z {z_len}) | "
              f"bpp {bpp:.4f} | ratio {ratio:.1f}x")
    n = len(bins)
    print(f"average over {n}: bpp {total_bpp / n:.4f} | "
          f"ratio {total_ratio / n:.1f}x")


if __name__ == "__main__":
    main()
