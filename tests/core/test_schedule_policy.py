"""Interleave scheduling policy: one decode step between consecutive
prefill chunks (ITL bound during long chunked prefills), token-exact vs the
default prefill-first policy."""

import numpy as np
import pytest

from minisgl_tpu.core import SamplingParams
from minisgl_tpu.llm import LLM


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    from tests.helpers import save_tiny_hf_model

    d = str(tmp_path_factory.mktemp("policy"))
    save_tiny_hf_model(d, "llama")
    return d


def _llm(model_dir, **kw):
    base = dict(
        use_dummy_weight=False,
        max_running_req=4,
        max_seq_len_override=256,
        num_page_override=256,
        page_size=4,
        cache_type="radix",
        max_extend_tokens=32,  # force chunking of long prompts
    )
    base.update(kw)
    return LLM(model_dir, **base)


def _phase_trace(llm):
    phases = []
    orig = llm._forward

    def spy(rep, batch):
        phases.append(batch.phase)
        return orig(rep, batch)

    llm._forward = spy
    return phases


def test_interleave_decodes_between_chunks(model_dir):
    llm = _llm(model_dir, schedule_policy="interleave")
    phases = _phase_trace(llm)
    # short prompt starts decoding; long prompt arrives chunked (120/32 ->
    # 4 chunks). Offline feed admits both up front; under interleave each
    # prefill chunk must be followed by a decode step once decoding started.
    short = list(range(10, 16))
    long = list(range(100, 220))
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    llm.generate([short, long], sp)
    # find consecutive prefill pairs: interleave forbids them while a
    # decode req is runnable. The first chunk train may be all-prefill
    # (nothing decodes yet); after the first decode appears, prefill
    # steps must alternate with decode steps.
    first_decode = phases.index("decode")
    tail = phases[first_decode:]
    for a, b in zip(tail, tail[1:]):
        assert not (a == "prefill" and b == "prefill"), phases


def test_interleave_token_exact_vs_prefill_first(model_dir):
    prompts = [list(range(10, 16)), list(range(100, 220)), [7, 8, 9]]
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    ref = _llm(model_dir, schedule_policy="prefill-first").generate(prompts, sp)
    got = _llm(model_dir, schedule_policy="interleave").generate(prompts, sp)
    for r, g in zip(ref, got):
        assert r["token_ids"] == g["token_ids"]


def test_prefill_first_unchanged(model_dir):
    llm = _llm(model_dir)  # default policy
    phases = _phase_trace(llm)
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    llm.generate([list(range(10, 16)), list(range(100, 220))], sp)
    # default policy: the chunk train runs back-to-back (consecutive
    # prefill steps exist)
    assert any(
        a == "prefill" and b == "prefill" for a, b in zip(phases, phases[1:])
    ), phases


def test_full_k_burst_while_prefill_blocked(model_dir):
    """A prefill waiting on a request slot (max_running=1) must not pin
    decode to single-step dispatches: the blocked prefill can't start until
    the running request finishes either way, so decode bursts the full K."""
    llm = _llm(
        model_dir,
        max_running_req=1,
        decode_steps=4,
        max_extend_tokens=64,
    )
    ks = []
    orig = llm._forward

    def spy(rep, batch):
        if batch.is_decode:
            ks.append(batch.decode_steps)
        return orig(rep, batch)

    llm._forward = spy
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    llm.generate([list(range(10, 20)), list(range(30, 40))], sp)
    # while req 2 waits in the pending queue, req 1's decode must burst
    # K=4 (the old policy pinned it to 1); the K=1 entries are each
    # request's budget tail (remain < K falls back to single-step)
    assert ks and ks[0] == 4, ks
    assert ks.count(4) >= 4, ks
