from psg_tpu.train.state import TrainState
from psg_tpu.train.optim import build_optimizer, make_lr_schedule

__all__ = ["TrainState", "build_optimizer", "make_lr_schedule"]
