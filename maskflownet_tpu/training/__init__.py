from maskflownet_tpu.training.engine import (Trainer, TrainSettings,
                                             centralize, sync_metrics)
from maskflownet_tpu.training.logging import (DictMovingAverage, FileLog,
                                              MovingAverage, find_checkpoints,
                                              find_log, generate_run_id,
                                              read_log)
from maskflownet_tpu.training.schedule import lr_at_step, total_steps

__all__ = ["DictMovingAverage", "FileLog", "MovingAverage", "Trainer",
           "TrainSettings", "centralize", "find_checkpoints", "find_log",
           "generate_run_id", "lr_at_step", "read_log", "sync_metrics",
           "total_steps"]
