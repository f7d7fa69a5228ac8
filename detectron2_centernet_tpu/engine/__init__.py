from . import hooks
from .defaults import (
    DefaultPredictor,
    DefaultTrainer,
    default_argument_parser,
    default_setup,
    launch,
)
from .train_loop import HookBase, SimpleTrainer, TrainerBase
from .train_state import (
    TrainState,
    create_train_state,
    make_predict_step,
    make_train_step,
)

__all__ = [
    "DefaultPredictor",
    "DefaultTrainer",
    "HookBase",
    "SimpleTrainer",
    "TrainerBase",
    "TrainState",
    "create_train_state",
    "default_argument_parser",
    "default_setup",
    "hooks",
    "launch",
    "make_predict_step",
    "make_train_step",
]
