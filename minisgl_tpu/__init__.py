"""minisgl_tpu: a TPU-native LLM serving engine (JAX/XLA/Pallas/pjit)."""

__version__ = "0.1.0"

from minisgl_tpu.core import Batch, Req, SamplingParams

__all__ = ["Batch", "Req", "SamplingParams", "__version__"]
