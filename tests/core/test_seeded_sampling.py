"""Per-request sampling seeds: a seeded request's stream derives only from
(seed, token position), so its output is reproducible across runs and
independent of batch composition; unseeded requests keep the global
stream."""

import numpy as np
import pytest

from minisgl_tpu.core import SamplingParams
from minisgl_tpu.llm import LLM


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    from tests.helpers import save_tiny_hf_model

    d = str(tmp_path_factory.mktemp("seeded"))
    save_tiny_hf_model(d, "llama")
    return d


def _llm(model_dir):
    return LLM(
        model_dir,
        use_dummy_weight=True,
        max_running_req=4,
        max_seq_len_override=128,
        num_page_override=128,
        page_size=4,
        cache_type="naive",
        attention_backend="xla",
    )


PROMPT = [7, 8, 9, 10]
SP = dict(temperature=0.8, max_tokens=10, ignore_eos=True)


def test_seed_reproducible_across_runs_and_batches(model_dir):
    llm = _llm(model_dir)
    solo = llm.generate([PROMPT], SamplingParams(seed=1234, **SP))
    again = llm.generate([PROMPT], SamplingParams(seed=1234, **SP))
    assert solo[0]["token_ids"] == again[0]["token_ids"]

    # same seeded request inside a different batch: identical output
    mixed = llm.generate(
        [[40, 41, 42, 43, 44], PROMPT, [50, 51]],
        [
            SamplingParams(seed=0, **SP),
            SamplingParams(seed=1234, **SP),
            SamplingParams(seed=9, **SP),
        ],
    )
    assert mixed[1]["token_ids"] == solo[0]["token_ids"]


def test_different_seeds_diverge(model_dir):
    llm = _llm(model_dir)
    a = llm.generate([PROMPT], SamplingParams(seed=1, **SP))
    b = llm.generate([PROMPT], SamplingParams(seed=2, **SP))
    assert a[0]["token_ids"] != b[0]["token_ids"]


def test_unseeded_still_varies(model_dir):
    llm = _llm(model_dir)
    outs = {
        tuple(llm.generate([PROMPT], SamplingParams(**SP))[0]["token_ids"])
        for _ in range(4)
    }
    assert len(outs) > 1  # global stream advances between runs


def test_seed_ignored_for_greedy(model_dir):
    llm = _llm(model_dir)
    g = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    gs = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True, seed=7)
    assert (
        llm.generate([PROMPT], g)[0]["token_ids"]
        == llm.generate([PROMPT], gs)[0]["token_ids"]
    )
