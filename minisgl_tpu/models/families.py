"""Supported model families.

Parity with the reference model zoo (models/llama.py, qwen2.py:19-20,
qwen3.py:20, qwen3_moe.py:11-12, mistral.py): every family is the shared
decoder (models/common.py) plus two knobs — attention bias (Qwen2) and
per-head q/k RMSNorm (Qwen3 / Qwen3-MoE). Mistral and Llama are the plain
decoder; Mistral's rope-theta quirk is handled in ModelConfig.from_hf.
"""

from __future__ import annotations

from minisgl_tpu.models.common import ModelExtras
from minisgl_tpu.models.config import ModelConfig
from minisgl_tpu.models.registry import register_model


@register_model("LlamaForCausalLM")
def _llama(cfg: ModelConfig) -> ModelExtras:
    return ModelExtras(attn_bias=False, qk_norm=False)


@register_model("MistralForCausalLM")
def _mistral(cfg: ModelConfig) -> ModelExtras:
    return ModelExtras(attn_bias=False, qk_norm=False)


@register_model("Qwen2ForCausalLM")
def _qwen2(cfg: ModelConfig) -> ModelExtras:
    # Qwen2 uses bias on the qkv projections (reference qwen2.py:19-20)
    return ModelExtras(attn_bias=True, qk_norm=False)


@register_model("Qwen3ForCausalLM")
def _qwen3(cfg: ModelConfig) -> ModelExtras:
    # Qwen3 applies per-head RMSNorm to q and k (reference qwen3.py:20)
    return ModelExtras(attn_bias=False, qk_norm=True)


@register_model("Qwen3MoeForCausalLM")
def _qwen3_moe(cfg: ModelConfig) -> ModelExtras:
    return ModelExtras(attn_bias=False, qk_norm=True)
