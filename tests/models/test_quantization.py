"""Quantization paths: INT8 weight-only and FP8 KV storage.

No reference counterpart exists (BASELINE.md north-star feature). Checks:
- int8 per-output-channel quantization round-trips with small error
- a quantized tiny model tracks the full-precision model's logits and
  greedy tokens (CPU, xla backend)
- fp8 KV storage tracks bf16 KV closely
"""

import numpy as np
import pytest

from minisgl_tpu.layers.params import quantize_int8


def test_quantize_int8_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((4, 64, 32)).astype(np.float32)
    q, scale = quantize_int8(w)
    assert q.dtype == np.int8 and scale.shape == (4, 1, 32)
    deq = q.astype(np.float32) * scale
    err = np.abs(deq - w).max() / np.abs(w).max()
    assert err < 1e-2


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    from tests.helpers import save_tiny_hf_model

    d = str(tmp_path_factory.mktemp("qtiny"))
    save_tiny_hf_model(d, "qwen3")
    return d


def _generate(model_dir, prompt, n_new, **kw):
    from minisgl_tpu.core import SamplingParams
    from minisgl_tpu.llm import LLM

    llm = LLM(
        model_dir,
        max_running_req=4,
        max_seq_len_override=128,
        num_page_override=64,
        page_size=4,
        cache_type="naive",
        **kw,
    )
    out = llm.generate(
        [prompt], SamplingParams(temperature=0.0, max_tokens=n_new, ignore_eos=True)
    )
    return out[0]["token_ids"]


def test_int8_weight_only_tracks_fp(tiny_model_dir):
    prompt = list(range(7, 27))
    ref = _generate(tiny_model_dir, prompt, 8)
    got = _generate(tiny_model_dir, prompt, 8, quantization="int8")
    # random tiny models have near-uniform logits; require agreement on the
    # first few steps (argmax is sensitive where logit gaps are tiny)
    assert got[:2] == ref[:2], (got, ref)


def test_w8a8_tracks_fp(tiny_model_dir):
    prompt = list(range(7, 27))
    ref = _generate(tiny_model_dir, prompt, 8)
    got = _generate(tiny_model_dir, prompt, 8, quantization="w8a8")
    assert got[:2] == ref[:2], (got, ref)


def test_fp8_kv_tracks_bf16(tiny_model_dir):
    prompt = list(range(7, 27))
    ref = _generate(tiny_model_dir, prompt, 8)
    got = _generate(tiny_model_dir, prompt, 8, kv_dtype="fp8")
    assert got[:2] == ref[:2], (got, ref)


def test_int8_param_spec_entries():
    from minisgl_tpu.models.base import create_model
    from minisgl_tpu.models.config import ModelConfig

    hf = dict(
        architectures=["Qwen3ForCausalLM"],
        model_type="qwen3",
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        vocab_size=256,
        max_position_embeddings=128,
        rope_theta=10000.0,
        tie_word_embeddings=True,
        hidden_act="silu",
    )
    model = create_model(ModelConfig.from_hf(hf), 1, quant="int8")
    spec = model.params_spec
    assert "layers/qkv_w@scale" in spec
    assert spec["layers/qkv_w"].quant == "int8"
    # scale sharding drops the contraction axis
    assert spec["layers/qkv_w@scale"].shape == (2, 1, spec["layers/qkv_w"].shape[-1])
    # norms stay unquantized
    assert spec["layers/input_norm_w"].quant is None
