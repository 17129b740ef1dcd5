"""Overlap vs normal scheduling parity (the reference's ablation flag,
MINISGL_DISABLE_OVERLAP_SCHEDULING, env.py:69): both loops must emit
identical greedy tokens."""

import numpy as np
import pytest

from minisgl_tpu.core import SamplingParams
from minisgl_tpu.env import ENV, _Env
from minisgl_tpu.llm import LLM


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    from tests.helpers import save_tiny_hf_model

    d = str(tmp_path_factory.mktemp("ovl"))
    save_tiny_hf_model(d, "llama")
    return d


def _gen(model_dir):
    llm = LLM(
        model_dir,
        max_running_req=4,
        max_seq_len_override=128,
        num_page_override=128,
        page_size=4,
        cache_type="naive",
    )
    return llm.generate(
        [[5, 6, 7], [20, 21, 22, 23]],
        SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True),
    )


def test_normal_loop_matches_overlap(model_dir, monkeypatch):
    ref = _gen(model_dir)
    # class access triggers the descriptor; reach the field via __dict__
    field = _Env.__dict__["DISABLE_OVERLAP_SCHEDULING"]
    monkeypatch.setattr(field, "_cache", True)
    monkeypatch.setattr(field, "_read", True)
    assert ENV.DISABLE_OVERLAP_SCHEDULING is True
    got = _gen(model_dir)
    assert [r["token_ids"] for r in got] == [r["token_ids"] for r in ref]
