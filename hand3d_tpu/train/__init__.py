from hand3d_tpu.train.losses import (
    posenet_scoremap_loss,
    handsegnet_loss,
    lifting_loss,
)
from hand3d_tpu.train.schedule import piecewise_constant
from hand3d_tpu.train.trainer import TrainState, make_train_step, make_optimizer

__all__ = [
    "posenet_scoremap_loss",
    "handsegnet_loss",
    "lifting_loss",
    "piecewise_constant",
    "TrainState",
    "make_train_step",
    "make_optimizer",
]
