"""Quantization paths: INT8/INT4 weight-only, W8A8, and FP8 KV storage.

No reference counterpart exists (BASELINE.md north-star feature). Checks:
- int8/int4 quantization round-trips with small error
- a quantized tiny model tracks the full-precision model's greedy tokens
- the teacher-forced NLL gate (quality/nll.py): every quant mode's
  perplexity stays within the north-star delta of the full-precision run
  on the same fixed sequences (the "<= 0.1 ppl" BASELINE criterion,
  CI-sized here)
"""

import numpy as np
import pytest

from minisgl_tpu.layers.params import quantize_int4, quantize_int8


def test_quantize_int8_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((4, 64, 32)).astype(np.float32)
    q, scale = quantize_int8(w)
    assert q.dtype == np.int8 and scale.shape == (4, 1, 32)
    deq = q.astype(np.float32) * scale
    err = np.abs(deq - w).max() / np.abs(w).max()
    assert err < 1e-2


def test_quantize_int4_roundtrip():
    from minisgl_tpu.layers.params import unpack_int4

    rng = np.random.default_rng(0)
    w = rng.standard_normal((2, 64, 32)).astype(np.float32)
    packed, scale = quantize_int4(w, group=16)
    assert packed.dtype == np.int8 and packed.shape == (2, 32, 32)
    assert scale.shape == (2, 4, 32)
    nib = np.asarray(unpack_int4(packed))  # [2, 64, 32] in [-8, 7]
    assert nib.min() >= -8 and nib.max() <= 7
    deq = nib.reshape(2, 4, 16, 32) * scale[:, :, None, :]
    err = np.abs(deq.reshape(w.shape) - w).max() / np.abs(w).max()
    assert err < 0.12  # 4-bit grouped: ~scale/2 worst case


def test_int4_mm_matches_dequant():
    """_mm's fused unpack+dequant+dot == explicit dequant matmul."""
    import jax.numpy as jnp

    from minisgl_tpu.models.common import _mm

    rng = np.random.default_rng(1)
    w = rng.standard_normal((64, 48)).astype(np.float32) * 0.1
    x = rng.standard_normal((5, 64)).astype(np.float32)
    packed, scale = quantize_int4(w, group=32)
    lp = {"w": jnp.asarray(packed), "w@scale": jnp.asarray(scale)}
    got = np.asarray(_mm(jnp.asarray(x), lp, "w"))
    from minisgl_tpu.layers.params import unpack_int4

    deq = (
        np.asarray(unpack_int4(jnp.asarray(packed))).reshape(2, 32, 48)
        * scale[:, None, :]
    ).reshape(64, 48)
    np.testing.assert_allclose(got, x @ deq, rtol=2e-3, atol=2e-3)


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


def test_int4_weight_only_tracks_fp(tiny_model_dir):
    prompt = list(range(7, 27))
    ref = _generate(tiny_model_dir, prompt, 8)
    got = _generate(tiny_model_dir, prompt, 8, quantization="int4")
    assert got[:2] == ref[:2], (got, ref)


def test_fp8_kv_tracks_bf16(tiny_model_dir):
    prompt = list(range(7, 27))
    ref = _generate(tiny_model_dir, prompt, 8)
    got = _generate(tiny_model_dir, prompt, 8, kv_dtype="fp8")
    assert got[:2] == ref[:2], (got, ref)


# ---- teacher-forced NLL gate (quality/nll.py) ------------------------------


@pytest.fixture(scope="module")
def nll_seqs():
    rng = np.random.default_rng(3)
    return [rng.integers(1, 250, 48).tolist() for _ in range(4)]


@pytest.fixture(scope="module")
def nll_fp(tiny_model_dir, nll_seqs):
    from minisgl_tpu.quality import score_nll

    return score_nll(tiny_model_dir, nll_seqs, page_size=4, backend="xla")


@pytest.mark.parametrize(
    "mode,bound",
    [
        (dict(quantization="int8"), 0.05),
        (dict(quantization="w8a8"), 0.10),
        (dict(quantization="int4"), 0.10),
        (dict(kv_dtype="fp8"), 0.10),
        (dict(kv_dtype="int8"), 0.10),
    ],
    ids=["int8", "w8a8", "int4", "fp8kv", "int8kv"],
)
def test_ppl_gate(tiny_model_dir, nll_seqs, nll_fp, mode, bound):
    """BASELINE north star: quantized ppl within delta of full precision."""
    from minisgl_tpu.quality import score_nll

    got = score_nll(tiny_model_dir, nll_seqs, page_size=4, backend="xla", **mode)
    delta = got["ppl"] - nll_fp["ppl"]
    assert abs(delta) <= bound * nll_fp["ppl"] + 0.1, (got, nll_fp)


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
