#!/usr/bin/env python3
"""Table-baking export — behavior parity with
/root/reference/export_checkpoint.py:13-43 ("Machine A -> Machine B"): load a
checkpoint, bake the integer entropy tables, save checkpoint + tables so the
receiving machine codes bit-exactly without recomputation."""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dcae_tpu.config import DCAEConfig  # noqa: E402
from dcae_tpu.models.codec import DCAECodec  # noqa: E402
from dcae_tpu.utils.checkpoint import (load_checkpoint, load_params_only,  # noqa: E402
                                       save_checkpoint)
from dcae_tpu.train.state import create_train_state, make_optimizer  # noqa: E402

import jax  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--output", type=str, required=True)
    p.add_argument("--tiny", action="store_true")
    a = p.parse_args(argv)

    cfg = DCAEConfig.tiny() if a.tiny else DCAEConfig()
    codec = DCAECodec(cfg)
    codec.params = load_params_only(a.checkpoint, codec.params)
    codec.update(force=True)

    tx = make_optimizer(1e-4)
    state = create_train_state(codec.params, tx, jax.random.PRNGKey(0))
    save_checkpoint(a.output, state, epoch=0, loss=0.0, tables=codec.tables)
    print(f"exported {a.output} (+ .tables.npz with baked CDFs)")


if __name__ == "__main__":
    main()
