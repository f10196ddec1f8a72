from fastspeech2_tpu.training.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)
from fastspeech2_tpu.training.optim import make_optimizer, noam_schedule
from fastspeech2_tpu.training.step import make_eval_step, make_train_step
from fastspeech2_tpu.training.train_state import TrainState

__all__ = [
    "latest_step",
    "restore_checkpoint",
    "save_checkpoint",
    "make_optimizer",
    "noam_schedule",
    "make_eval_step",
    "make_train_step",
    "TrainState",
]
