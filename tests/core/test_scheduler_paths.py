"""Scheduler-brain paths driven end-to-end through the offline LLM on CPU:
chunked prefill, radix prefix reuse, aborts, and multi-step decode parity
(reference behavior: scheduler/prefill.py chunking, radix insert on prefill
completion, scheduler.py:190-195 abort)."""

import numpy as np
import pytest

from minisgl_tpu.core import SamplingParams
from minisgl_tpu.llm import LLM


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    from tests.helpers import save_tiny_hf_model

    d = str(tmp_path_factory.mktemp("sched"))
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


def test_chunked_prefill_matches_unchunked(model_dir):
    prompt = list(range(10, 90))  # 80 tokens
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    # budget 32 -> the 80-token prompt needs 3 chunks
    chunked = _llm(model_dir, max_extend_tokens=32).generate([prompt], sp)
    whole = _llm(model_dir, max_extend_tokens=8192).generate([prompt], sp)
    assert chunked[0]["token_ids"] == whole[0]["token_ids"]


def test_radix_prefix_reuse_same_tokens(model_dir):
    llm = _llm(model_dir)
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    shared = list(range(20, 60))
    first = llm.generate([shared + [61]], sp)
    # radix tree now holds the shared prefix; the second call must match an
    # aligned prefix and still produce exact greedy tokens
    second = llm.generate([shared + [61]], sp)
    assert first[0]["token_ids"] == second[0]["token_ids"]
    # different continuation after the shared prefix also correct
    third_a = llm.generate([shared + [70, 71]], sp)
    fresh = _llm(model_dir).generate([shared + [70, 71]], sp)
    assert third_a[0]["token_ids"] == fresh[0]["token_ids"]


def test_eviction_under_pressure(model_dir):
    # tiny pool: 24 pages of 4 tokens; several distinct prompts force radix
    # eviction; integrity check runs when idle
    llm = _llm(model_dir, num_page_override=24)
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    for seed in range(4):
        rng = np.random.default_rng(seed)
        prompts = [rng.integers(5, 250, 20).tolist() for _ in range(3)]
        out = llm.generate(prompts, sp)
        assert all(len(r["token_ids"]) == 4 for r in out)
    llm.cache_manager.check_integrity()


def test_abort_releases_resources(model_dir):
    from minisgl_tpu.message import AbortBackendMsg, UserMsg

    from minisgl_tpu.llm.llm import RequestStatus

    llm = _llm(model_dir)
    free_before = len(llm.cache_manager.free_pages)
    # enqueue a request then abort it before/while it runs (registering the
    # offline bookkeeping the virtual receive hook would normally create)
    llm.status_map[999] = RequestStatus(uid=999, input_ids=[], output_ids=[])
    llm.prefill_manager.add_one_req(
        uid=999,
        input_ids=np.arange(10, 40, dtype=np.int32),
        params=SamplingParams(max_tokens=50, ignore_eos=True),
    )
    rep = llm.replicas[0]
    (batch,) = llm._schedule_next_batches(rep)
    assert batch.is_prefill
    llm._process_last_data(llm._forward(rep, batch))
    llm._process_one_msg(AbortBackendMsg(uid=999))
    llm.cache_manager.check_integrity()
    # all pages back (free list + radix-owned evictables)
    assert llm.cache_manager.available_size >= free_before * llm.config.page_size


def test_multi_step_decode_eos_truncation(model_dir):
    # force an artificial EOS: pick the token the model actually generates
    llm = _llm(model_dir)
    sp = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True)
    ref = llm.generate([[5, 6, 7]], sp)[0]["token_ids"]
    eos = ref[3]  # 4th generated token
    llm_k = _llm(model_dir, decode_steps=4)
    llm_k.eos_token_ids = {eos}
    sp2 = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=False)
    out = llm_k.generate([[5, 6, 7]], sp2)[0]["token_ids"]
    # stops exactly at the first eos occurrence (eos token dropped by the
    # offline collector), even mid-burst
    first_eos = ref.index(eos)
    assert out == ref[:first_eos]
    llm_k.cache_manager.check_integrity()


def test_stop_token_ids(model_dir):
    from minisgl_tpu.llm import LLM

    llm = LLM(
        model_dir,
        use_dummy_weight=False,
        max_running_req=4,
        max_seq_len_override=128,
        num_page_override=128,
        page_size=4,
    )
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    ref = llm.generate([[5, 6, 7]], sp)[0]["token_ids"]
    stop_tok = ref[4]
    sp2 = SamplingParams(
        temperature=0.0, max_tokens=12, ignore_eos=True,
        stop_token_ids=[stop_tok],
    )
    out = llm.generate([[5, 6, 7]], sp2)[0]["token_ids"]
    # finishes AT the stop token (inclusive), like an EOS hit
    assert out == ref[: ref.index(stop_tok) + 1]
    llm.cache_manager.check_integrity()
