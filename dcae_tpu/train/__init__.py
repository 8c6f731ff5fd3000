"""Training layer (L4)."""

from dcae_tpu.train import loop, losses, state, step
from dcae_tpu.train.losses import rate_distortion_loss, reconstruction_loss
from dcae_tpu.train.state import (TrainState, create_train_state,
                                  make_optimizer, multistep_lr, param_labels)
from dcae_tpu.train.step import make_eval_step, make_train_step

__all__ = [
    "loop", "losses", "state", "step",
    "rate_distortion_loss", "reconstruction_loss",
    "TrainState", "create_train_state", "make_optimizer", "multistep_lr",
    "param_labels", "make_eval_step", "make_train_step",
]
