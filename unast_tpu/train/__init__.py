"""Training layer: losses, augmentation, optimizers/schedules, the jitted
multi-objective train step, checkpointing, observability, and the driver
loop. Parity map: reference src/train.py (see each module docstring)."""

from . import losses
from . import augment
from . import optim
from . import steps
from . import config
from . import observe
from .steps import TrainState, init_train_state, make_train_step

__all__ = ["losses", "augment", "optim", "steps", "config", "observe",
           "TrainState", "init_train_state", "make_train_step"]
