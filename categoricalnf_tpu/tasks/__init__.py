from categoricalnf_tpu.tasks.language import LanguageModelingTask
from categoricalnf_tpu.tasks.set_modeling import (SetShufflingTask,
                                                  SetSummationTask)

__all__ = ["LanguageModelingTask", "SetShufflingTask", "SetSummationTask"]
