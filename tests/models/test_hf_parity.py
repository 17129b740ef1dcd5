"""Logits / greedy-generation parity against HuggingFace transformers.

This is the numerics gate the reference lacks (SURVEY.md §4: "add the missing
logits-parity tests"): every model family must reproduce HF's per-step
last-token logits within float32 tolerance through the full paged pipeline
(paged KV writes, prefix reads, rope, sampling fast path).
"""

import numpy as np
import pytest

from tests.helpers import SimpleRunner, hf_greedy_generate, save_tiny_hf_model

PROMPT = [3, 17, 92, 54, 11, 28, 7]
N_NEW = 6


@pytest.mark.parametrize(
    "family", ["llama", "qwen2", "qwen3", "qwen3_moe", "mistral"]
)
def test_family_parity(tmp_path, family):
    hf_model = save_tiny_hf_model(str(tmp_path), family)
    hf_tokens, hf_logits = hf_greedy_generate(hf_model, PROMPT, N_NEW)

    runner = SimpleRunner(str(tmp_path), tp_size=1, page_size=4)
    tokens, logits = runner.greedy_generate(PROMPT, N_NEW)

    np.testing.assert_allclose(logits, hf_logits, rtol=2e-4, atol=2e-4)
    assert tokens == hf_tokens


def test_llama_tp2_parity(tmp_path):
    """TP sharding must be numerically identical to single-shard."""
    hf_model = save_tiny_hf_model(str(tmp_path), "llama")
    hf_tokens, hf_logits = hf_greedy_generate(hf_model, PROMPT, N_NEW)

    runner = SimpleRunner(str(tmp_path), tp_size=2, page_size=4)
    tokens, logits = runner.greedy_generate(PROMPT, N_NEW)
    np.testing.assert_allclose(logits, hf_logits, rtol=2e-4, atol=2e-4)
    assert tokens == hf_tokens


def test_llama_tp8_kv_replication(tmp_path):
    """tp=8 > kv_heads=2 exercises the KV-head replication path."""
    hf_model = save_tiny_hf_model(str(tmp_path), "llama", num_attention_heads=8)
    hf_tokens, hf_logits = hf_greedy_generate(hf_model, PROMPT, N_NEW)

    runner = SimpleRunner(str(tmp_path), tp_size=8, page_size=4)
    tokens, logits = runner.greedy_generate(PROMPT, N_NEW)
    np.testing.assert_allclose(logits, hf_logits, rtol=2e-4, atol=2e-4)
    assert tokens == hf_tokens


def test_tie_word_embeddings(tmp_path):
    hf_model = save_tiny_hf_model(str(tmp_path), "llama", tie_word_embeddings=True)
    hf_tokens, hf_logits = hf_greedy_generate(hf_model, PROMPT, N_NEW)
    runner = SimpleRunner(str(tmp_path), tp_size=2, page_size=4)
    tokens, logits = runner.greedy_generate(PROMPT, N_NEW)
    np.testing.assert_allclose(logits, hf_logits, rtol=2e-4, atol=2e-4)
    assert tokens == hf_tokens


def test_llama3_rope_scaling_parity(tmp_path):
    """Llama-3.1-style llama3 rope scaling (ops/rope.py:_llama3_scaling)."""
    hf_model = save_tiny_hf_model(
        str(tmp_path),
        "llama",
        rope_scaling={
            "rope_type": "llama3",
            "factor": 8.0,
            "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
            "original_max_position_embeddings": 64,
        },
        max_position_embeddings=128,
    )
    hf_tokens, hf_logits = hf_greedy_generate(hf_model, PROMPT, N_NEW)
    runner = SimpleRunner(str(tmp_path), tp_size=1, page_size=4)
    tokens, logits = runner.greedy_generate(PROMPT, N_NEW)
    np.testing.assert_allclose(logits, hf_logits, rtol=2e-4, atol=2e-4)
    assert tokens == hf_tokens


def test_yarn_rope_scaling_cache_shape():
    """YaRN scaling path builds a finite cache with the mscale folded in."""
    from minisgl_tpu.models.config import RotaryConfig
    from minisgl_tpu.ops.rope import compute_rope_cache

    cache = compute_rope_cache(
        RotaryConfig(
            head_dim=32,
            rotary_dim=32,
            max_position=128,
            base=10000.0,
            scaling={
                "rope_type": "yarn",
                "factor": 4.0,
                "original_max_position_embeddings": 32,
            },
        )
    )
    assert cache.shape == (128, 32)
    assert np.isfinite(cache).all()
    # mscale > 1 for factor > 1: cos(0) scaled above 1
    assert cache[0, 0] > 1.0
