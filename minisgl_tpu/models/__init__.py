from minisgl_tpu.models.base import Model, create_model
from minisgl_tpu.models.config import ModelConfig, RotaryConfig

__all__ = ["Model", "ModelConfig", "RotaryConfig", "create_model"]
