from minisgl_tpu.engine.config import SchedulerConfig
from minisgl_tpu.scheduler.scheduler import Scheduler

__all__ = ["Scheduler", "SchedulerConfig"]
