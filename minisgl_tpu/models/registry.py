"""Model family registry (counterpart of reference models/register.py:5-12)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict

from minisgl_tpu.models.common import ModelExtras
from minisgl_tpu.models.config import ModelConfig
from minisgl_tpu.utils import Registry

# architecture name -> ModelExtras factory
MODEL_REGISTRY: Registry[Callable[[ModelConfig], ModelExtras]] = Registry("model")


def register_model(arch: str):
    def deco(fn):
        MODEL_REGISTRY.register(arch, fn)
        return fn

    return deco


def resolve_extras(cfg: ModelConfig) -> ModelExtras:
    for arch in cfg.architectures:
        if arch in MODEL_REGISTRY:
            return MODEL_REGISTRY.get(arch)(cfg)
    raise ValueError(
        f"unsupported architectures {cfg.architectures}; "
        f"supported: {MODEL_REGISTRY.supported_names()}"
    )
