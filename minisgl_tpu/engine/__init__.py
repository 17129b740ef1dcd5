from minisgl_tpu.engine.config import EngineConfig, SchedulerConfig
from minisgl_tpu.engine.engine import Engine, ForwardOutput
from minisgl_tpu.engine.step import DeviceState, build_step_fn

__all__ = ["DeviceState", "Engine", "EngineConfig", "ForwardOutput", "SchedulerConfig", "build_step_fn"]
