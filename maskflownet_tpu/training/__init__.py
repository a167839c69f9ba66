from maskflownet_tpu.training.engine import (Trainer, TrainSettings,
                                             centralize)
from maskflownet_tpu.training.logging import (DictMovingAverage, FileLog,
                                              MovingAverage, find_checkpoints,
                                              find_log, generate_run_id,
                                              read_log)
from maskflownet_tpu.training.schedule import lr_at_step, total_steps

__all__ = ["DictMovingAverage", "FileLog", "MovingAverage", "Trainer",
           "TrainSettings", "centralize", "find_checkpoints", "find_log",
           "generate_run_id", "lr_at_step", "read_log", "total_steps"]
