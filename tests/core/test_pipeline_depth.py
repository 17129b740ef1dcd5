"""Pipelined result fetch (pipeline_depth > 1): results processed N
iterations behind dispatch with N D2H fetches in flight. Deeper pipelines
must not change emitted tokens — only EOS *detection* lags, and the extra
speculatively-decoded tokens are dropped exactly like the reference's
one-behind overlap drop (reference scheduler.py:159)."""

import numpy as np
import pytest

from minisgl_tpu.core import SamplingParams
from minisgl_tpu.llm import LLM


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    from tests.helpers import save_tiny_hf_model

    d = str(tmp_path_factory.mktemp("pipe"))
    save_tiny_hf_model(d, "llama")
    return d


def _llm(model_dir, **kw):
    base = dict(
        use_dummy_weight=False,
        max_running_req=4,
        max_seq_len_override=128,
        num_page_override=256,
        page_size=4,
        cache_type="radix",
    )
    base.update(kw)
    return LLM(model_dir, **base)


def test_depth2_token_exact_vs_depth1(model_dir):
    prompts = [list(range(10, 30)), list(range(40, 55)), [7, 8, 9]]
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    ref = _llm(model_dir, pipeline_depth=1).generate(prompts, sp)
    for depth in (2, 3):
        got = _llm(model_dir, pipeline_depth=depth).generate(prompts, sp)
        for r, g in zip(ref, got):
            assert r["token_ids"] == g["token_ids"], f"depth={depth}"


def test_depth2_multi_step_eos_truncation(model_dir):
    # EOS detection lags depth*K tokens; emitted output must still stop
    # exactly at the first EOS
    llm = _llm(model_dir)
    sp = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True)
    ref = llm.generate([[5, 6, 7]], sp)[0]["token_ids"]
    eos = ref[3]
    llm_p = _llm(model_dir, pipeline_depth=2, decode_steps=4)
    llm_p.eos_token_ids = {eos}
    sp2 = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=False)
    out = llm_p.generate([[5, 6, 7]], sp2)[0]["token_ids"]
    assert out == ref[: ref.index(eos)]
    llm_p.cache_manager.check_integrity()


def test_depth2_abort_no_double_free(model_dir):
    from minisgl_tpu.message import AbortBackendMsg

    from minisgl_tpu.llm.llm import RequestStatus

    llm = _llm(model_dir, pipeline_depth=2)
    free_before = len(llm.cache_manager.free_pages)
    llm.status_map[999] = RequestStatus(uid=999, input_ids=[], output_ids=[])
    llm.prefill_manager.add_one_req(
        uid=999,
        input_ids=np.arange(10, 40, dtype=np.int32),
        params=SamplingParams(max_tokens=50, ignore_eos=True),
    )
    rep = llm.replicas[0]
    # dispatch prefill + one decode batch, keeping both in flight (depth 2)
    for _ in range(2):
        (batch,) = llm._schedule_next_batches(rep)
        rep.inflight.append(llm._forward(rep, batch))
    # abort while two batches reference the req
    llm._process_one_msg(AbortBackendMsg(uid=999))
    assert rep.finished_reqs  # skip-countdown registered
    while rep.inflight:
        llm._process_last_data(rep.inflight.popleft())
    assert not rep.finished_reqs
    llm.cache_manager.check_integrity()
    assert (
        llm.cache_manager.available_size
        >= free_before * llm.config.page_size
    )


def test_depth2_radix_reuse_still_exact(model_dir):
    llm = _llm(model_dir, pipeline_depth=2)
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    shared = list(range(20, 60))
    first = llm.generate([shared + [61]], sp)
    second = llm.generate([shared + [61]], sp)
    assert first[0]["token_ids"] == second[0]["token_ids"]
    llm.cache_manager.check_integrity()
