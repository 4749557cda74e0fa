"""Training: unified pjit trainer + the 3-stage progressive recipe."""

from emox.train.stages import stage_loss_fn, trainable_mask, STAGE_DESCRIPTIONS
from emox.train.trainer import TrainState, Trainer, make_optimizer

__all__ = [
    "stage_loss_fn",
    "trainable_mask",
    "STAGE_DESCRIPTIONS",
    "TrainState",
    "Trainer",
    "make_optimizer",
]
