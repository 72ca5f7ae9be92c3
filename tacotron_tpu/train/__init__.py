from tacotron_tpu.train.loss import tacotron_loss
from tacotron_tpu.train.schedule import lr_schedule, make_optimizer
from tacotron_tpu.train.step import TrainState, create_train_state, make_train_step
from tacotron_tpu.train import checkpoint

__all__ = [
    "tacotron_loss",
    "lr_schedule",
    "make_optimizer",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "checkpoint",
]
