"""Training loop, early stopping, checkpointing."""

from deeppreconditioning_tpu.train.trainer import (
    EarlyStopping,
    TrainState,
    train,
    train_step,
    validate,
)

__all__ = ["EarlyStopping", "TrainState", "train", "train_step", "validate"]
