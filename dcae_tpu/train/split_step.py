"""Split training: encoder half and decoder half on different devices.

The reference implements this with a manual parameter server — CompressModel
on CPU, DecompressModel on GPU, per-step gradient copies and a
ParameterSync every 5 steps (/root/reference/train_5.py:3156-3345,
models/dcae_5.py:1967-2113). The TPU-native version is a two-stage pipeline
over ONE parameter tree partitioned into disjoint halves:

    enc half: {g_a, h_a, entropy_bottleneck}           on device A
    dec half: {g_s + shared context/hyper/dictionary}  on device B

Forward ships (y, z_hat) A->B; backward ships their cotangents B->A; each
half's gradient is computed by its own jitted program on its own device
(the encoder backward recomputes its forward inside the VJP — the standard
remat trade). There is no gradient copying or weight re-sync machinery:
the halves are disjoint subtrees of one tree, combined exactly once per
step by the optimizer. RD loss semantics match the joint step exactly
(verified in tests/test_split_training.py).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from dcae_tpu.models.dcae import DCAE
from dcae_tpu.train.losses import rate_distortion_loss

ENC_KEYS = ("g_a", "h_a", "entropy_bottleneck")


@flax.struct.dataclass
class SplitTrainState:
    """Device-resident split training state: each half's params and
    optimizer state stay committed to its device across steps (no per-step
    weight H2D — the fix for round-1's re-upload-everything pattern)."""

    step: jax.Array
    enc_params: Any
    dec_params: Any
    enc_opt: Any
    dec_opt: Any
    rng: jax.Array

    @property
    def params(self) -> Dict:
        """Merged view (leaves live on their respective devices)."""
        return merge_halves(self.enc_params, self.dec_params)


def split_halves(params: Dict) -> Tuple[Dict, Dict]:
    enc = {k: v for k, v in params.items() if k in ENC_KEYS}
    dec = {k: v for k, v in params.items() if k not in ENC_KEYS}
    return enc, dec


def merge_halves(enc: Dict, dec: Dict) -> Dict:
    out = dict(dec)
    out.update(enc)
    return out


def make_split_train_step(model: DCAE, tx: optax.GradientTransformation,
                          lmbda: float, metric: str = "mse",
                          enc_device=None, dec_device=None) -> Callable:
    """Returns train_step(state, batch) running the two halves on the given
    devices (defaults: first two local devices)."""
    if enc_device is None:
        enc_device = jax.devices()[0]
    if dec_device is None:
        devs = jax.devices()
        dec_device = devs[1] if len(devs) > 1 else devs[0]

    def enc_fwd_fn(enc_params, dec_params_stub, x, noise_rng, drift_rng):
        # dec_params_stub supplies the tree structure flax needs; only the
        # enc subtrees are touched by encode_half.
        params = merge_halves(enc_params, dec_params_stub)
        return model.apply({"params": params}, x, True,
                           rngs={"noise": noise_rng, "drift": drift_rng},
                           method=DCAE.encode_half)

    def dec_loss_fn(dec_params, enc_params_stub, y, z_hat, target,
                    noise_rng, drift_rng):
        params = merge_halves(enc_params_stub, dec_params)
        x_hat, y_like, *_ = model.apply(
            {"params": params}, y, z_hat, True,
            rngs={"noise": noise_rng, "drift": drift_rng},
            method=DCAE.decode_half)
        out = {"x_hat": x_hat, "likelihoods": {"y": y_like}}
        rd = rate_distortion_loss(out, target, lmbda, metric)
        return rd["loss"], rd

    # --- decoder device: loss + grads wrt (dec_params, y, z_hat) ---
    @jax.jit
    def dec_step(dec_params, enc_stub, y, z_hat, target, noise_rng,
                 drift_rng):
        def f(dp, y_, z_):
            return dec_loss_fn(dp, enc_stub, y_, z_, target, noise_rng,
                               drift_rng)

        (loss, rd), grads = jax.value_and_grad(
            f, argnums=(0, 1, 2), has_aux=True)(dec_params, y, z_hat)
        g_dec, g_y, g_z = grads
        return loss, rd, g_dec, g_y, g_z

    # --- encoder device: forward ---
    @jax.jit
    def enc_fwd(enc_params, dec_stub, x, noise_rng, drift_rng):
        y, z_hat, z_like = enc_fwd_fn(enc_params, dec_stub, x, noise_rng,
                                      drift_rng)
        num_pixels = x.shape[0] * x.shape[1] * x.shape[2]
        bpp_z = jnp.sum(jnp.log(z_like)) / (-math.log(2) * num_pixels)
        return y, z_hat, bpp_z

    # --- encoder device: backward (VJP via recompute) + aux grads ---
    @jax.jit
    def enc_bwd(enc_params, dec_stub, x, g_y, g_z, noise_rng, drift_rng):
        def f(ep):
            y, z_hat, bpp_z = enc_fwd(ep, dec_stub, x, noise_rng, drift_rng)
            aux = model.apply(
                {"params": merge_halves(ep, dec_stub)},
                method=DCAE.aux_loss)
            # dot with incoming cotangents; bpp_z and aux enter with weight 1
            return (jnp.vdot(y, g_y) + jnp.vdot(z_hat, g_z) + bpp_z + aux,
                    (bpp_z, aux))

        (_, (bpp_z, aux)), g_enc = jax.value_and_grad(f, has_aux=True)(
            enc_params)
        return g_enc, bpp_z, aux

    # per-half optimizer updates, jitted; they run on whichever device the
    # (committed) inputs live on. Per-half application of tx matches the
    # reference, which clips/steps each model's optimizer separately
    # (ref train_5.py:3234-3276,3341-3345).
    @jax.jit
    def apply_tx(params, opt_state, grads):
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    # zero "structure stubs" carry no gradient and never change; built once
    # per device and reused every step
    stub_cache: Dict = {}

    def to_split_state(state) -> SplitTrainState:
        if isinstance(state, SplitTrainState):
            return state
        enc_params, dec_params = split_halves(state.params)
        enc_params = jax.device_put(enc_params, enc_device)
        dec_params = jax.device_put(dec_params, dec_device)
        return SplitTrainState(
            step=state.step,
            enc_params=enc_params, dec_params=dec_params,
            enc_opt=tx.init(enc_params), dec_opt=tx.init(dec_params),
            rng=state.rng)

    def train_step(state, batch):
        """state: SplitTrainState (a plain TrainState is converted on the
        first call — per-half optimizer states are initialized on their
        devices). Returns (SplitTrainState, metrics-with-device-scalars)."""
        state = to_split_state(state)
        rng, noise_rng, drift_rng = jax.random.split(state.rng, 3)
        enc_params, dec_params = state.enc_params, state.dec_params
        if not stub_cache:
            stub_cache["enc@dec"] = jax.device_put(
                jax.tree.map(jnp.zeros_like, enc_params), dec_device)
            stub_cache["dec@enc"] = jax.device_put(
                jax.tree.map(jnp.zeros_like, dec_params), enc_device)

        x_enc = jax.device_put(batch, enc_device)
        y, z_hat, bpp_z = enc_fwd(enc_params, stub_cache["dec@enc"], x_enc,
                                  noise_rng, drift_rng)

        # ship activations to the decoder device
        y_d = jax.device_put(y, dec_device)
        z_d = jax.device_put(z_hat, dec_device)
        loss_dec, rd, g_dec, g_y, g_z = dec_step(
            dec_params, stub_cache["enc@dec"], y_d, z_d,
            jax.device_put(batch, dec_device), noise_rng, drift_rng)

        # ship cotangents back
        g_enc, bpp_z, aux = enc_bwd(
            enc_params, stub_cache["dec@enc"], x_enc,
            jax.device_put(g_y, enc_device),
            jax.device_put(g_z, enc_device), noise_rng, drift_rng)

        new_enc, enc_opt = apply_tx(enc_params, state.enc_opt, g_enc)
        new_dec, dec_opt = apply_tx(dec_params, state.dec_opt, g_dec)

        # metrics stay device scalars (loss components live on different
        # devices; move only the tiny bpp_z/aux scalars)
        bpp_z_d = jax.device_put(bpp_z, dec_device)
        metrics = dict(rd)
        metrics["bpp_loss"] = metrics["bpp_loss"] + bpp_z_d
        metrics["loss"] = loss_dec + bpp_z_d
        metrics["aux_loss"] = aux
        new_state = SplitTrainState(
            step=state.step + 1, enc_params=new_enc, dec_params=new_dec,
            enc_opt=enc_opt, dec_opt=dec_opt, rng=rng)
        return new_state, metrics

    return train_step
