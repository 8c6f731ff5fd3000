"""Training-stack tests: optimizer partition, one sharded step, schedule,
checkpoint policy, data pipeline."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcae_tpu.config import DCAEConfig
from dcae_tpu.models.dcae import DCAE
from dcae_tpu.parallel import mesh as pmesh
from dcae_tpu.train.state import (create_train_state, make_optimizer,
                                  multistep_lr, param_labels)
from dcae_tpu.train.step import make_eval_step, make_train_step
from dcae_tpu.utils.checkpoint import (CheckpointPolicy, load_checkpoint,
                                       save_checkpoint)


@pytest.fixture(scope="module")
def setup():
    cfg = DCAEConfig.tiny()
    model = DCAE(cfg)
    batch = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (8, cfg.pad_multiple, cfg.pad_multiple, 3)).astype(np.float32))
    params = model.init({"params": jax.random.PRNGKey(0)}, batch[:1],
                        training=False)["params"]
    return cfg, model, params, batch


class TestOptimizerPartition:
    def test_labels(self, setup):
        _, _, params, _ = setup
        labels = param_labels(params)
        flat = jax.tree_util.tree_flatten_with_path(labels)[0]
        aux = [k for k, v in flat if v == "aux"]
        assert len(aux) == 1 and "quantiles" in jax.tree_util.keystr(aux[0])

    def test_multistep_schedule(self):
        sched = multistep_lr(1e-4, [100, 200])
        np.testing.assert_allclose(float(sched(0)), 1e-4, rtol=1e-6)
        np.testing.assert_allclose(float(sched(150)), 1e-5, rtol=1e-6)
        np.testing.assert_allclose(float(sched(250)), 1e-6, rtol=1e-6)


class TestTrainStep:
    def test_one_sharded_step_updates_both_groups(self, setup):
        cfg, model, params, batch = setup
        mesh = pmesh.make_mesh(sp=1)
        tx = make_optimizer(1e-4, 1e-3)
        state = create_train_state(params, tx, jax.random.PRNGKey(1))
        state = jax.device_put(state, pmesh.replicated(mesh))
        batch_s = jax.device_put(batch, pmesh.batch_sharding(mesh))

        step = pmesh.shard_train_step(
            make_train_step(model, tx, lmbda=0.013), mesh)
        new_state, metrics = step(state, batch_s)

        for k in ("loss", "mse_loss", "bpp_loss", "aux_loss"):
            assert np.isfinite(float(metrics[k])), k
        # main group moved
        w0 = np.asarray(params["g_a"]["down0"]["down"]["conv"]["kernel"])
        w1 = np.asarray(
            new_state.params["g_a"]["down0"]["down"]["conv"]["kernel"])
        assert not np.allclose(w0, w1)
        # aux group (quantiles) moved too, via the fused aux loss
        q0 = np.asarray(params["entropy_bottleneck"]["quantiles"])
        q1 = np.asarray(new_state.params["entropy_bottleneck"]["quantiles"])
        assert not np.allclose(q0, q1)
        assert int(new_state.step) == 1

    def test_encoder_only_finetune_freezes_decoder(self, setup):
        """--finetune_encoder parity: only g_a/h_a move (ref
        train_fine_tune.py freeze_decompress_and_shared_components)."""
        cfg, model, params, batch = setup
        tx = make_optimizer(1e-4, 1e-3, trainable_keys=("g_a", "h_a"))
        state = create_train_state(params, tx, jax.random.PRNGKey(2))
        step = jax.jit(make_train_step(model, tx, lmbda=0.013))
        new_state, _ = step(state, batch)
        moved = np.asarray(
            new_state.params["g_a"]["down0"]["down"]["conv"]["kernel"])
        assert not np.allclose(
            moved,
            np.asarray(params["g_a"]["down0"]["down"]["conv"]["kernel"]))
        for key in ("g_s", "h_z_s1", "dt", "entropy_bottleneck"):
            for a, b in zip(jax.tree.leaves(params[key]),
                            jax.tree.leaves(new_state.params[key])):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_eval_step(self, setup):
        cfg, model, params, batch = setup
        mesh = pmesh.make_mesh(sp=1)
        ev = pmesh.shard_eval_step(make_eval_step(model, 0.013), mesh)
        m = ev(jax.device_put(params, pmesh.replicated(mesh)),
               jax.device_put(batch, pmesh.batch_sharding(mesh)))
        assert np.isfinite(float(m["loss"]))
        assert float(m["psnr"]) > 0

    def test_precision_regularization(self, setup):
        """The cross-device precision penalty (ref train_5.py:3320-3337) is
        nonzero, finite, and differentiable (the step completes and moves
        weights with it in the loss)."""
        cfg, model, params, batch = setup
        tx = make_optimizer(1e-4, 1e-3)
        state = create_train_state(params, tx, jax.random.PRNGKey(3))
        step = jax.jit(make_train_step(model, tx, lmbda=0.013,
                                       precision_reg=1e-3,
                                       precision_noise=1e-3))
        new_state, metrics = step(state, batch[:2])
        p = float(metrics["precision_loss"])
        assert np.isfinite(p) and p > 0, p
        w0 = np.asarray(params["g_s"]["up0"]["kernel"])
        w1 = np.asarray(new_state.params["g_s"]["up0"]["kernel"])
        assert not np.allclose(w0, w1)


class TestCheckpointing:
    def test_save_load_round_trip(self, setup, tmp_path):
        _, _, params, _ = setup
        tx = make_optimizer(1e-4)
        state = create_train_state(params, tx, jax.random.PRNGKey(0))
        path = str(tmp_path / "ck.ckpt")
        save_checkpoint(path, state, epoch=7, loss=1.25)
        restored, epoch, loss = load_checkpoint(path, state)
        assert epoch == 7 and abs(loss - 1.25) < 1e-9
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_policy_files(self, setup, tmp_path):
        _, _, params, _ = setup
        tx = make_optimizer(1e-4)
        state = create_train_state(params, tx, jax.random.PRNGKey(0))
        policy = CheckpointPolicy(str(tmp_path))
        policy.save(state, epoch=5, loss=2.0)
        policy.save(state, epoch=6, loss=1.0)
        names = set(os.listdir(tmp_path))
        assert "checkpoint_latest.ckpt" in names
        assert "checkpoint_epoch5.ckpt" in names
        assert "checkpoint_best.ckpt" in names
        _, _, best = load_checkpoint(str(tmp_path / "checkpoint_best.ckpt"),
                                     state)
        assert best == 1.0


class TestDataPipeline:
    def test_image_folder_batches(self, tmp_path):
        from PIL import Image
        from dcae_tpu.data.datasets import ImageFolder

        rng = np.random.default_rng(0)
        for split, n in (("train", 6), ("test", 3)):
            os.makedirs(tmp_path / split)
            for i in range(n):
                arr = rng.integers(0, 255, (80, 100, 3), dtype=np.uint8)
                Image.fromarray(arr).save(tmp_path / split / f"{i}.png")

        ds = ImageFolder(str(tmp_path), "train", patch_size=64)
        batches = list(ds.batches(batch_size=2, epoch=0))
        assert len(batches) == 3
        for b in batches:
            assert b.shape == (2, 64, 64, 3)
            assert b.dtype == np.float32
            assert 0 <= b.min() and b.max() <= 1

        test_ds = ImageFolder(str(tmp_path), "test", patch_size=64)
        tb = list(test_ds.batches(batch_size=2, drop_last=False))
        assert sum(x.shape[0] for x in tb) == 3
        # center crops are deterministic
        tb2 = list(test_ds.batches(batch_size=2, drop_last=False))
        np.testing.assert_array_equal(tb[0], tb2[0])


class TestAuxScheduler:
    """ExponentialTargetScheduler (ref train_5.py:3029-3067) + the
    inject_hyperparams aux-LR rewiring."""

    def test_multiplier_bands(self):
        from dcae_tpu.train.state import ExponentialTargetScheduler
        s = ExponentialTargetScheduler(start_loss=3820, target_loss=10,
                                       total_epochs=100)
        # far behind schedule at epoch 50 -> aggressive boost, capped 1000
        lr, mult = s.step(current_aux_loss=3820, main_lr=1e-4, epoch=50)
        assert mult == 1000 and lr == pytest.approx(0.1)
        # exactly on schedule -> standard band (>=50x main; the multiplier
        # itself is uncapped in this band — only the LR is, at 0.1)
        expected = 3820 * s.decay_rate ** 30
        lr, mult = s.step(expected * 0.99, 1e-4, 30)
        assert mult >= 50 and lr <= 0.1
        # slightly behind -> 100x-band
        lr, mult = s.step(expected * 1.2, 1e-4, 30)
        assert 100 <= mult <= 500

    def test_default_resolution_matches_docs(self):
        # docs/TRAIN_VALIDATION.md: "the default flips to scheduled for
        # full-size runs" — the auto default must be ON at full size and
        # OFF for tiny configs, with explicit True/False always winning.
        from dcae_tpu.config import DCAEConfig
        from dcae_tpu.train.loop import TrainOptions, resolve_aux_scheduler
        opts = TrainOptions(dataset="/nonexistent")
        assert opts.aux_scheduler is None
        assert resolve_aux_scheduler(opts, DCAEConfig()) is True
        assert resolve_aux_scheduler(opts, DCAEConfig.tiny()) is False
        import dataclasses
        forced_off = dataclasses.replace(opts, aux_scheduler=False)
        assert resolve_aux_scheduler(forced_off, DCAEConfig()) is False
        forced_on = dataclasses.replace(opts, aux_scheduler=True)
        assert resolve_aux_scheduler(forced_on, DCAEConfig.tiny()) is True

    def test_set_get_aux_lr(self, setup):
        from dcae_tpu.train.state import get_aux_lr, set_aux_lr
        _, _, params, _ = setup
        tx = make_optimizer(1e-4, 1e-3)
        opt_state = tx.init(params)
        assert get_aux_lr(opt_state) == pytest.approx(1e-3)
        opt_state2 = set_aux_lr(opt_state, 0.05)
        assert get_aux_lr(opt_state2) == pytest.approx(0.05)
        # main branch untouched: one step with the boosted LR moves the
        # quantiles ~50x more than the default LR does
        labels = param_labels(params)
        flat = jax.tree_util.tree_flatten_with_path(labels)[0]
        assert any(v == "main" for _, v in flat)

    def test_boosted_lr_moves_quantiles_faster(self, setup):
        from dcae_tpu.train.state import set_aux_lr
        cfg, model, params, batch = setup
        tx = make_optimizer(1e-4, 1e-3)
        step = jax.jit(make_train_step(model, tx, lmbda=0.013))

        def quantile_delta(aux_lr):
            state = create_train_state(params, tx, jax.random.PRNGKey(1))
            state = state.replace(
                opt_state=set_aux_lr(state.opt_state, aux_lr))
            new_state, _ = step(state, batch)
            q0 = np.asarray(params["entropy_bottleneck"]["quantiles"])
            q1 = np.asarray(
                new_state.params["entropy_bottleneck"]["quantiles"])
            return np.abs(q1 - q0).max()

        d_small, d_big = quantile_delta(1e-3), quantile_delta(5e-2)
        assert d_big > 10 * d_small
