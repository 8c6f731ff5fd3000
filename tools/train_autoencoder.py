#!/usr/bin/env python3
"""Transforms-only pretraining CLI — parity with
/root/reference/train_g_a_g_s.py: train SimpleAutoencoder (g_a+g_s, no
entropy model) with mse/l1/ms-ssim/mixed reconstruction losses, optionally
bootstrapped from a full DCAE checkpoint."""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from dcae_tpu.config import DCAEConfig  # noqa: E402
from dcae_tpu.data.datasets import ImageFolder  # noqa: E402
from dcae_tpu.models.autoencoder import SimpleAutoencoder, params_from_dcae  # noqa: E402
from dcae_tpu.parallel import mesh as pmesh  # noqa: E402
from dcae_tpu.train.losses import reconstruction_loss  # noqa: E402
from dcae_tpu.utils.checkpoint import (CheckpointPolicy, load_params_only)  # noqa: E402
from dcae_tpu.utils.metrics import AverageMeter  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-d", "--dataset", type=str, required=True)
    p.add_argument("-e", "--epochs", type=int, default=100)
    p.add_argument("-lr", "--learning_rate", type=float, default=1e-4)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--patch-size", type=int, default=256)
    p.add_argument("--loss", type=str, default="mse",
                   choices=["mse", "l1", "ms-ssim", "mixed"])
    p.add_argument("--M", type=int, default=320,
                   help="latent channels (split eval uses 160)")
    p.add_argument("--save_path", type=str, default="./checkpoints/ae")
    p.add_argument("--from_dcae", type=str, default=None,
                   help="bootstrap g_a/g_s from a DCAE checkpoint")
    p.add_argument("--seed", type=int, default=100)
    a = p.parse_args(argv)

    cfg = DCAEConfig(M=a.M)
    model = SimpleAutoencoder(cfg)
    rng = jax.random.PRNGKey(a.seed)
    dummy = jnp.zeros((1, a.patch_size, a.patch_size, 3), jnp.float32)
    params = model.init({"params": rng}, dummy)["params"]
    if a.from_dcae:
        from dcae_tpu.models.dcae import DCAE
        full = DCAE(cfg)
        fp = full.init({"params": rng}, dummy, training=False)["params"]
        fp = load_params_only(a.from_dcae, fp)
        params = params_from_dcae(fp)

    tx = optax.adamw(a.learning_rate, weight_decay=a.weight_decay) \
        if a.weight_decay > 0 else optax.adam(a.learning_rate)
    opt_state = tx.init(params)

    mesh = pmesh.make_mesh(sp=1)

    def step_fn(params, opt_state, batch):
        def loss_fn(p):
            out = model.apply({"params": p}, batch)
            return reconstruction_loss(out["x_hat"], batch, a.loss)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    step = jax.jit(step_fn,
                   in_shardings=(pmesh.replicated(mesh),
                                 pmesh.replicated(mesh),
                                 pmesh.batch_sharding(mesh)),
                   out_shardings=pmesh.replicated(mesh))

    train_ds = ImageFolder(a.dataset, "train", a.patch_size, seed=a.seed)
    test_ds = ImageFolder(a.dataset, "test", a.patch_size, seed=a.seed)
    policy = CheckpointPolicy(a.save_path)

    from dcae_tpu.train.state import create_train_state
    for epoch in range(a.epochs):
        t0 = time.time()
        meter = AverageMeter()
        for i, batch in enumerate(train_ds.batches(a.batch_size, epoch)):
            batch = jax.device_put(batch, pmesh.batch_sharding(mesh))
            params, opt_state, loss = step(params, opt_state, batch)
            meter.update(float(loss))
            if i % 100 == 0:
                print(f"epoch {epoch} [{i}] loss {float(loss):.5f}")
        test_m = AverageMeter()
        ev = jax.jit(lambda p, b: reconstruction_loss(
            model.apply({"params": p}, b)["x_hat"], b, a.loss))
        for batch in test_ds.batches(a.batch_size, drop_last=False):
            test_m.update(float(ev(params, jnp.asarray(batch))),
                          batch.shape[0])
        print(f"epoch {epoch}: train {meter.avg:.5f} test {test_m.avg:.5f} "
              f"({time.time() - t0:.0f}s)")
        state = create_train_state(params, tx, rng)
        policy.save(state, epoch + 1, test_m.avg)


if __name__ == "__main__":
    main()
