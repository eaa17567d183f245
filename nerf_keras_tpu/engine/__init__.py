"""Training engine: functional forward pass, jitted steps, trainer loop."""

from nerf_keras_tpu.engine.step import (
    TrainState,
    init_train_state,
    make_forward_pass,
    make_train_step,
    make_eval_step,
    mse,
    psnr,
)
from nerf_keras_tpu.engine.trainer import Trainer

__all__ = [
    "TrainState",
    "init_train_state",
    "make_forward_pass",
    "make_train_step",
    "make_eval_step",
    "mse",
    "psnr",
    "Trainer",
]
