"""End-to-end offline generation through the full stack:
LLM -> Scheduler (continuous batching, radix cache, chunked prefill)
-> Engine (bucketed jitted steps) -> model -> sampler.

Greedy outputs must match HF per-request regardless of batching order,
chunking, or prefix-cache hits — the strongest behavioral gate we can run
without hardware (reference has no equivalent; SURVEY.md §4 calls this gap
out).
"""

import numpy as np
import pytest

from minisgl_tpu.core import SamplingParams
from minisgl_tpu.llm import LLM
from tests.helpers import hf_greedy_generate, save_tiny_hf_model


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tiny_llama"))
    hf_model = save_tiny_hf_model(path, "llama")
    return path, hf_model


@pytest.fixture(scope="module")
def llm(tiny_model):
    path, _ = tiny_model
    return LLM(
        path,
        num_page_override=64,
        page_size=4,
        max_running_req=8,
        max_extend_tokens=32,  # force chunked prefill for long prompts
        max_seq_len_override=128,
    )


def test_single_greedy_matches_hf(tiny_model, llm):
    path, hf_model = tiny_model
    prompt = [3, 17, 92, 54, 11, 28, 7]
    n_new = 8
    hf_tokens, _ = hf_greedy_generate(hf_model, prompt, n_new)
    out = llm.generate([prompt], SamplingParams(max_tokens=n_new, ignore_eos=True))
    assert out[0]["token_ids"] == hf_tokens


def test_batch_greedy_matches_hf(tiny_model, llm):
    path, hf_model = tiny_model
    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(2, 250, size=n)) for n in (5, 11, 23, 40, 3)]
    n_new = 6
    expected = [hf_greedy_generate(hf_model, p, n_new)[0] for p in prompts]
    outs = llm.generate(
        prompts, SamplingParams(max_tokens=n_new, ignore_eos=True)
    )
    for out, exp in zip(outs, expected):
        assert out["token_ids"] == exp


def test_chunked_prefill_long_prompt(tiny_model, llm):
    """Prompt longer than max_extend_tokens=32 forces multiple chunks."""
    path, hf_model = tiny_model
    rng = np.random.default_rng(1)
    prompt = list(rng.integers(2, 250, size=75))
    n_new = 5
    hf_tokens, _ = hf_greedy_generate(hf_model, prompt, n_new)
    out = llm.generate([prompt], SamplingParams(max_tokens=n_new, ignore_eos=True))
    assert out[0]["token_ids"] == hf_tokens


def test_radix_cache_reuse_consistency(tiny_model, llm):
    """Second run shares the prefix via the radix cache; results must not
    change."""
    path, hf_model = tiny_model
    rng = np.random.default_rng(2)
    base = list(rng.integers(2, 250, size=24))
    p1 = base + list(rng.integers(2, 250, size=8))
    p2 = base + list(rng.integers(2, 250, size=8))
    n_new = 5
    exp1 = hf_greedy_generate(hf_model, p1, n_new)[0]
    exp2 = hf_greedy_generate(hf_model, p2, n_new)[0]
    out1 = llm.generate([p1], SamplingParams(max_tokens=n_new, ignore_eos=True))
    # p2 now hits the cached prefix of p1
    out2 = llm.generate([p2], SamplingParams(max_tokens=n_new, ignore_eos=True))
    assert out1[0]["token_ids"] == exp1
    assert out2[0]["token_ids"] == exp2


def test_sampling_params_accepted(tiny_model, llm):
    out = llm.generate(
        [[5, 6, 7, 8]],
        SamplingParams(max_tokens=4, temperature=0.8, top_k=20, top_p=0.9, ignore_eos=True),
    )
    assert len(out[0]["token_ids"]) == 4


def test_offline_logprobs(tiny_model):
    from minisgl_tpu.llm import LLM

    llm = LLM(
        tiny_model[0],
        use_dummy_weight=False,
        max_running_req=4,
        max_seq_len_override=128,
        num_page_override=128,
        page_size=4,
    )
    sp = SamplingParams(
        temperature=0.0, max_tokens=5, ignore_eos=True, logprobs=3
    )
    out = llm.generate([[5, 6, 7]], sp)[0]
    assert len(out["logprobs"]) == len(out["token_ids"]) == 5
    for (lp, top), tok in zip(out["logprobs"], out["token_ids"]):
        assert lp <= 0.0 and len(top) == 3
        # greedy: the sampled token is the argmax -> top-1 candidate
        assert top[0][0] == tok
        assert abs(top[0][1] - lp) < 1e-4
