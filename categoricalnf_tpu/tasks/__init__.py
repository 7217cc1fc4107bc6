from categoricalnf_tpu.tasks.set_modeling import (SetShufflingTask,
                                                  SetSummationTask)

__all__ = ["SetShufflingTask", "SetSummationTask"]
