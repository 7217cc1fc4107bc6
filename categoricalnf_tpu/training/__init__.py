from categoricalnf_tpu.training.engine import TrainConfig, Trainer
from categoricalnf_tpu.training.schedules import ScheduleSpec
from categoricalnf_tpu.training.state import OptimizerConfig, TrainState
from categoricalnf_tpu.training.task import TaskTemplate

__all__ = ["TrainConfig", "Trainer", "ScheduleSpec", "OptimizerConfig",
           "TrainState", "TaskTemplate"]
