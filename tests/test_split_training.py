"""Split-training tests: the two-device pipelined step must produce exactly
the gradients of the equivalent single-device computation (same rng
streams), and run with halves pinned to different (virtual) devices."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcae_tpu.config import DCAEConfig
from dcae_tpu.models.dcae import DCAE
from dcae_tpu.train.losses import rate_distortion_loss
from dcae_tpu.train.split_step import (ENC_KEYS, make_split_train_step,
                                       merge_halves, split_halves)
from dcae_tpu.train.state import create_train_state, make_optimizer


@pytest.fixture(scope="module")
def setup():
    cfg = DCAEConfig.tiny(drift_noise=0.01)
    model = DCAE(cfg)
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.uniform(
        0, 1, (2, cfg.pad_multiple, cfg.pad_multiple, 3)).astype(np.float32))
    params = model.init({"params": jax.random.PRNGKey(0)}, batch[:1],
                        training=False)["params"]
    return cfg, model, params, batch


def test_halves_partition(setup):
    _, _, params, _ = setup
    enc, dec = split_halves(params)
    assert set(enc) == set(ENC_KEYS) & set(params)
    assert not (set(enc) & set(dec))
    assert set(merge_halves(enc, dec)) == set(params)


@pytest.mark.slow
def test_split_grads_match_composed_reference(setup):
    """Stitched two-device VJP == one-shot grad of the same composed
    computation (identical rng streams)."""
    cfg, model, params, batch = setup
    import math

    lmbda = 0.013
    state_rng = jax.random.PRNGKey(7)
    rng, noise_rng, drift_rng = jax.random.split(state_rng, 3)

    def composed_loss(p):
        y, z_hat, z_like = model.apply(
            {"params": p}, batch, True,
            rngs={"noise": noise_rng, "drift": drift_rng},
            method=DCAE.encode_half)
        x_hat, y_like, *_ = model.apply(
            {"params": p}, y, z_hat, True,
            rngs={"noise": noise_rng, "drift": drift_rng},
            method=DCAE.decode_half)
        out = {"x_hat": x_hat, "likelihoods": {"y": y_like}}
        rd = rate_distortion_loss(out, batch, lmbda, "mse")
        num_pixels = batch.shape[0] * batch.shape[1] * batch.shape[2]
        bpp_z = jnp.sum(jnp.log(z_like)) / (-math.log(2) * num_pixels)
        aux = model.apply({"params": p}, method=DCAE.aux_loss)
        return rd["loss"] + bpp_z + aux

    want = jax.grad(composed_loss)(params)

    tx = make_optimizer(1e-4, 1e-3)
    state = create_train_state(params, tx, state_rng)
    devs = jax.devices()
    step = make_split_train_step(model, tx, lmbda, "mse",
                                 enc_device=devs[0], dec_device=devs[1])
    # reconstruct the gradients the step applied from the param delta of a
    # plain-SGD variant: easier to just re-run the internals — instead,
    # compare via a 1-step probe with identity-like optimizer
    import optax
    sgd = optax.sgd(1.0)
    probe_state = create_train_state(params, sgd, state_rng)
    probe = make_split_train_step(model, sgd, lmbda, "mse",
                                  enc_device=devs[0], dec_device=devs[1])
    new_state, metrics = probe(probe_state, batch)
    got = jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b),
                       params, new_state.params)  # = lr * grads = grads

    flat_w = jax.tree_util.tree_flatten_with_path(want)[0]
    flat_g = dict(jax.tree_util.tree_flatten_with_path(got)[0])
    for k, w in flat_w:
        g = flat_g[k]
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-6,
            err_msg=jax.tree_util.keystr(k))
    assert np.isfinite(float(metrics["loss"]))
    assert metrics["bpp_loss"] > 0


def test_split_step_devices(setup):
    """Halves really run on distinct devices."""
    cfg, model, params, batch = setup
    tx = make_optimizer(1e-4)
    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    devs = jax.devices()
    assert len(devs) >= 2, "conftest guarantees 8 virtual devices"
    step = make_split_train_step(model, tx, 0.013, "mse",
                                 enc_device=devs[2], dec_device=devs[3])
    new_state, metrics = step(state, batch)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
