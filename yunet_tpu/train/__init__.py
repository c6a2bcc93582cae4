from .targets import build_targets
from .step import TrainState, make_train_step, init_train_state, loss_fn
from .lr import lr_schedule, scale_lr

__all__ = ["build_targets", "TrainState", "make_train_step",
           "init_train_state", "loss_fn", "lr_schedule", "scale_lr"]
