"""Non-greedy sampling through the full engine path (the all_greedy=False
step variant): stochastic generation completes, respects max_tokens, and
differs across RNG state while staying within the top-k support."""

import numpy as np
import pytest

from minisgl_tpu.core import SamplingParams
from minisgl_tpu.llm import LLM


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    from tests.helpers import save_tiny_hf_model

    d = str(tmp_path_factory.mktemp("samp"))
    save_tiny_hf_model(d, "llama")
    return d


def test_sampled_generation_completes(model_dir):
    llm = LLM(
        model_dir,
        max_running_req=4,
        max_seq_len_override=128,
        num_page_override=128,
        page_size=4,
        cache_type="naive",
    )
    sp = SamplingParams(temperature=0.8, top_k=8, top_p=0.95, max_tokens=12,
                        ignore_eos=True)
    out = llm.generate([[3, 4, 5], [9, 8, 7, 6]], sp)
    assert all(len(r["token_ids"]) == 12 for r in out)
    V = 256
    assert all(0 <= t < V for r in out for t in r["token_ids"])


def test_mixed_greedy_and_sampled_batch(model_dir):
    llm = LLM(
        model_dir,
        max_running_req=4,
        max_seq_len_override=128,
        num_page_override=128,
        page_size=4,
        cache_type="naive",
    )
    sps = [
        SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True),
        SamplingParams(temperature=1.0, max_tokens=10, ignore_eos=True),
    ]
    out = llm.generate([[3, 4, 5], [3, 4, 5]], sps)
    # the greedy row must match a pure-greedy run exactly
    ref = llm.generate(
        [[3, 4, 5]], SamplingParams(temperature=0.0, max_tokens=10,
                                    ignore_eos=True)
    )
    assert out[0]["token_ids"] == ref[0]["token_ids"]
