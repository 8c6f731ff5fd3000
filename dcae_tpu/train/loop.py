"""Training driver: the canonical RD recipe, data-parallel over a TPU mesh.

Parity with /root/reference/train.py (recipe: dual Adam, clip 1.0,
MultiStepLR x0.1 at --lr_epoch, bs 8, patch 256^2, checkpoint
latest/every-5/best, resume restores optimizers+schedule). DDP/NCCL is
replaced by jit over a (dp, sp) mesh (dcae_tpu.parallel.mesh).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dcae_tpu.config import DCAEConfig
from dcae_tpu.data.datasets import ImageFolder
from dcae_tpu.models.dcae import DCAE
from dcae_tpu.parallel import mesh as pmesh
from dcae_tpu.train.state import (TrainState, create_train_state,
                                  make_optimizer, multistep_lr)
from dcae_tpu.train.step import make_eval_step, make_train_step
from dcae_tpu.utils.checkpoint import (CheckpointPolicy, load_checkpoint)
from dcae_tpu.utils.metrics import AverageMeter


@dataclasses.dataclass
class TrainOptions:
    dataset: str
    epochs: int = 50
    learning_rate: float = 1e-4
    aux_learning_rate: float = 1e-3
    lmbda: float = 0.0483
    batch_size: int = 8
    test_batch_size: int = 8
    patch_size: int = 256
    loss_type: str = "mse"          # mse | ms-ssim | l1
    lr_epochs: Tuple[int, ...] = (46,)
    clip_max_norm: float = 1.0
    seed: int = 100
    save: bool = True
    save_path: str = "./checkpoints"
    checkpoint: Optional[str] = None
    continue_train: bool = True
    num_workers: int = 8
    sp: int = 1                      # spatial mesh axis
    drift_noise: float = 0.0
    log_every: int = 100
    use_wandb: bool = False
    # e.g. ("g_a", "h_a") = encoder-only fine-tuning (ref train_fine_tune)
    freeze_except: Optional[Tuple[str, ...]] = None
    # cross-device precision regularization (ref train_5.py:3320-3337):
    # weight of the MSE between decoder outputs under 1e-6 latent noise
    precision_reg: float = 0.0
    precision_noise: float = 1e-6
    # real-codec validation cadence (ref rpc/master.py:341-349: true
    # entropy-coded RD every 10 epochs, logged under val_real/*); 0 disables
    val_real_every: int = 10
    val_real_images: int = 4
    # adaptive aux-LR (ref ExponentialTargetScheduler, train_5.py:3029-3067):
    # drive the quantile loss to aux_target_loss by the end of training,
    # retuning the aux Adam LR every epoch. None = auto: ON for full-size
    # configs (where the quantile loss starts ~7900 and plain Adam at
    # aux_learning_rate barely moves it — docs/TRAIN_VALIDATION.md r4),
    # OFF for tiny test configs (aux starts ~660 and plain Adam converges).
    # True/False force it either way.
    aux_scheduler: Optional[bool] = None
    aux_target_loss: float = 10.0


def resolve_aux_scheduler(opts: "TrainOptions", cfg: DCAEConfig) -> bool:
    """Auto default documented in docs/TRAIN_VALIDATION.md: scheduled aux
    LR for full-size configs, plain Adam for tiny ones (ref
    ExponentialTargetScheduler, /root/reference/train_5.py:3029-3067)."""
    if opts.aux_scheduler is not None:
        return opts.aux_scheduler
    return cfg.N >= 64


def validate_real(cfg: DCAEConfig, state, test_ds, n_images: int
                  ) -> Optional[dict]:
    """True entropy-coded RD on a few validation images: bake tables from
    the live params, compress+decompress for real, report stream bpp and
    PSNR (the reference's val_real/* namespace — every 10 epochs the RPC
    trainer decodes actual bitstreams, ref rpc/master.py:341-349,
    train_5.py:3358-3446)."""
    from dcae_tpu.eval_lib import eval_image_real
    from dcae_tpu.models.codec import DCAECodec

    codec = DCAECodec(cfg, params=jax.device_get(state.params))
    codec.update(force=True)
    batch = next(iter(test_ds.batches(max(1, n_images), drop_last=False)),
                 None)
    if batch is None:
        return None
    meters = {k: AverageMeter() for k in ("bpp", "psnr")}
    for i in range(min(n_images, batch.shape[0])):
        r = eval_image_real(codec, np.asarray(batch[i:i + 1]))
        meters["bpp"].update(r.bpp)
        meters["psnr"].update(r.psnr)
    return {k: m.avg for k, m in meters.items()}


def run_training(opts: TrainOptions, cfg: Optional[DCAEConfig] = None):
    if cfg is None:
        cfg = DCAEConfig(drift_noise=opts.drift_noise)

    train_ds = ImageFolder(opts.dataset, "train", opts.patch_size,
                           seed=opts.seed, num_workers=opts.num_workers)
    test_ds = ImageFolder(opts.dataset, "test", opts.patch_size,
                          seed=opts.seed, num_workers=opts.num_workers)
    steps_per_epoch = train_ds.steps_per_epoch(opts.batch_size)

    model = DCAE(cfg)
    rng = jax.random.PRNGKey(opts.seed)
    init_rng, state_rng = jax.random.split(rng)
    dummy = jnp.zeros((1, opts.patch_size, opts.patch_size, cfg.in_channels),
                      jnp.float32)
    params = model.init({"params": init_rng}, dummy, training=False)["params"]
    n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(params))
    print(f"model: {n_params / 1e6:.1f}M params, "
          f"{steps_per_epoch} steps/epoch")

    schedule = multistep_lr(
        opts.learning_rate, [m * steps_per_epoch for m in opts.lr_epochs])
    tx = make_optimizer(schedule, opts.aux_learning_rate, opts.clip_max_norm,
                        trainable_keys=opts.freeze_except)
    state = create_train_state(params, tx, state_rng)

    last_epoch = 0
    policy = CheckpointPolicy(opts.save_path)
    if opts.checkpoint:
        state, last_epoch, best = load_checkpoint(opts.checkpoint, state)
        policy.best_loss = best
        print(f"resumed from {opts.checkpoint} @ epoch {last_epoch} "
              f"(loss {best:.4f})")
        if not opts.continue_train:
            # arch-migration resume: keep params, rebuild optimizer state
            # (ref train_origin.py:455-480)
            state = create_train_state(state.params, tx, state_rng)
            state = dataclasses.replace(
                state, step=jnp.asarray(last_epoch * steps_per_epoch,
                                        jnp.int32))

    from dcae_tpu.utils.logging import MetricLogger
    logger = MetricLogger(opts.save_path, use_wandb=opts.use_wandb,
                          wandb_config=dataclasses.asdict(opts))

    # dp must divide the batch; shrink the mesh for small-batch runs
    n_dev = len(jax.devices())
    dp = max(1, n_dev // opts.sp)
    while dp > 1 and opts.batch_size % dp != 0:
        dp -= 1
    device_mesh = pmesh.make_mesh(n_devices=dp * opts.sp, sp=opts.sp)
    if dp * opts.sp < n_dev:
        print(f"using {dp * opts.sp}/{n_dev} devices "
              f"(batch {opts.batch_size} % dp)")
    train_step = pmesh.shard_train_step(
        make_train_step(model, tx, opts.lmbda, opts.loss_type,
                        precision_reg=opts.precision_reg,
                        precision_noise=opts.precision_noise), device_mesh)
    eval_step = pmesh.shard_eval_step(
        make_eval_step(model, opts.lmbda, opts.loss_type), device_mesh)
    # unsharded fallback for leftover test batches (B % dp != 0) so no
    # images are silently dropped from the validation metric
    eval_step_rem = jax.jit(make_eval_step(model, opts.lmbda,
                                           opts.loss_type))
    state = jax.device_put(state, pmesh.replicated(device_mesh))
    bshard = pmesh.batch_sharding(device_mesh)

    aux_sched = None  # built lazily from the first epoch's measured aux loss
    aux_sched_on = resolve_aux_scheduler(opts, cfg)
    if opts.aux_scheduler is None:
        print(f"aux_scheduler auto -> {'on' if aux_sched_on else 'off'} "
              f"(N={cfg.N})")

    for epoch in range(last_epoch, opts.epochs):
        t0 = time.time()
        meters = {k: AverageMeter() for k in ("loss", "bpp_loss", "aux_loss")}
        for i, batch in enumerate(train_ds.batches(opts.batch_size, epoch)):
            batch = jax.device_put(batch, bshard)
            state, metrics = train_step(state, batch)
            if i % opts.log_every == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                logger.log(epoch * steps_per_epoch + i, metrics)
                for k in meters:
                    meters[k].update(metrics.get(k, 0.0))
                dist_key = next(k for k in metrics if k.endswith("_loss")
                                and k not in ("bpp_loss", "aux_loss"))
                print(f"epoch {epoch} [{i}/{steps_per_epoch}] "
                      f"loss {metrics['loss']:.4f} | "
                      f"{dist_key} {metrics[dist_key]:.5f} | "
                      f"bpp {metrics['bpp_loss']:.3f} | "
                      f"aux {metrics['aux_loss']:.1f}")

        test_meter = AverageMeter()
        for batch in test_ds.batches(opts.test_batch_size, drop_last=False):
            if batch.shape[0] % device_mesh.shape["dp"] != 0:
                m = eval_step_rem(state.params, jnp.asarray(batch))
            else:
                m = eval_step(state.params, jax.device_put(batch, bshard))
            test_meter.update(float(m["loss"]), batch.shape[0])
        test_loss = test_meter.avg
        logger.log((epoch + 1) * steps_per_epoch, {"loss": test_loss},
                   namespace="val")
        print(f"epoch {epoch}: test loss {test_loss:.4f} "
              f"({time.time() - t0:.0f}s)")

        if aux_sched_on and meters["aux_loss"].count:
            from dcae_tpu.train.state import (ExponentialTargetScheduler,
                                              set_aux_lr)
            aux_now = meters["aux_loss"].avg
            if aux_sched is None:
                aux_sched = ExponentialTargetScheduler(
                    start_loss=max(aux_now, opts.aux_target_loss * 2),
                    target_loss=opts.aux_target_loss,
                    total_epochs=max(1, opts.epochs - last_epoch))
            main_lr = float(schedule(state.step))
            new_lr, mult = aux_sched.step(aux_now, main_lr,
                                          epoch - last_epoch)
            state = dataclasses.replace(
                state, opt_state=set_aux_lr(state.opt_state, new_lr))
            logger.log((epoch + 1) * steps_per_epoch,
                       {"aux_lr": new_lr, "aux_mult": mult},
                       namespace="aux_sched")
            print(f"epoch {epoch}: aux_lr -> {new_lr:.2e} (x{mult:.0f}, "
                  f"aux {aux_now:.1f})")

        if (opts.val_real_every > 0
                and (epoch + 1) % opts.val_real_every == 0):
            vr = validate_real(cfg, state, test_ds, opts.val_real_images)
            if vr:
                logger.log((epoch + 1) * steps_per_epoch, vr,
                           namespace="val_real")
                print(f"epoch {epoch}: val_real bpp {vr['bpp']:.4f} "
                      f"psnr {vr['psnr']:.2f} dB")

        if opts.save:
            policy.save(jax.device_get(state), epoch + 1, test_loss)
    logger.close()
    return state
