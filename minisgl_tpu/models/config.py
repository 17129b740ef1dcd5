"""Model configuration normalized from HuggingFace config.json.

Parity with /root/reference/python/minisgl/models/config.py:16-87 including
its quirks: ``text_config`` unwrap for multimodal wrappers, Mistral's
rope_theta living inside rope_scaling, head_dim override, MoE fields.
Consumes a plain dict (we read config.json directly; no transformers
dependency on the hot path).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional


@dataclass(frozen=True)
class RotaryConfig:
    head_dim: int
    rotary_dim: int
    max_position: int
    base: float
    scaling: Optional[Dict[str, Any]]


@dataclass(frozen=True)
class ModelConfig:
    num_layers: int
    num_qo_heads: int
    num_kv_heads: int
    head_dim: int
    hidden_size: int
    vocab_size: int
    intermediate_size: int
    rms_norm_eps: float
    rotary_config: RotaryConfig
    hidden_act: str
    tie_word_embeddings: bool
    num_experts: int
    num_experts_per_tok: int
    moe_intermediate_size: int
    norm_topk_prob: bool
    model_type: str
    architectures: List[str]
    dtype: str = "bfloat16"

    @property
    def is_moe(self) -> bool:
        return "moe" in self.model_type

    @classmethod
    def from_hf(cls, hf: Dict[str, Any]) -> "ModelConfig":
        if isinstance(hf.get("text_config"), dict):
            top, hf = hf, dict(hf["text_config"])
            for attr in ("architectures", "rope_theta", "rope_scaling"):
                if not hf.get(attr) and top.get(attr):
                    hf[attr] = top[attr]

        num_heads = hf["num_attention_heads"]
        num_kv_heads = hf.get("num_key_value_heads") or num_heads
        head_dim = hf.get("head_dim") or hf["hidden_size"] // num_heads
        rope_scaling = hf.get("rope_scaling")
        # Llama/Qwen put rope_theta at top level; Mistral(3) tucks it inside
        # rope_scaling (reference config.py:60-62).
        rope_theta = hf.get("rope_theta") or (rope_scaling or {}).get("rope_theta")
        if rope_theta is None:
            rope_theta = 10000.0

        return cls(
            num_layers=hf["num_hidden_layers"],
            num_qo_heads=num_heads,
            num_kv_heads=num_kv_heads,
            head_dim=head_dim,
            hidden_size=hf["hidden_size"],
            vocab_size=hf["vocab_size"],
            intermediate_size=hf["intermediate_size"],
            hidden_act=hf.get("hidden_act", "silu"),
            rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
            tie_word_embeddings=hf.get("tie_word_embeddings", False),
            rotary_config=RotaryConfig(
                head_dim=head_dim,
                rotary_dim=head_dim,
                max_position=hf.get("max_position_embeddings", 32768),
                base=float(rope_theta),
                scaling=rope_scaling,
            ),
            num_experts=hf.get("num_local_experts") or hf.get("num_experts") or 0,
            num_experts_per_tok=hf.get("num_experts_per_tok", 0),
            moe_intermediate_size=hf.get("moe_intermediate_size", 0),
            norm_topk_prob=hf.get("norm_topk_prob", False),
            model_type=hf.get("model_type", "llama"),
            architectures=hf.get("architectures") or ["LlamaForCausalLM"],
            dtype=hf.get("torch_dtype") or hf.get("dtype") or "bfloat16",
        )
