from nerf_workspaces_explorer_tpu.train.step import (
    TrainState,
    init_train_state,
    make_optimizer,
    make_train_step,
)
from nerf_workspaces_explorer_tpu.train.loop import Trainer

__all__ = [
    "TrainState",
    "Trainer",
    "init_train_state",
    "make_optimizer",
    "make_train_step",
]
