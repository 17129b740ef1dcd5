"""Prompt-lookup speculative decoding (spec/lookup.py + the verify phase):
draft proposal, token-exact greedy parity vs plain decode, full-acceptance
with an oracle proposer, stop-token truncation inside an accepted window,
and mixed greedy/sampled batches. No reference counterpart (the reference
has no speculative decoding); the parity oracle is this repo's own plain
greedy path."""

import numpy as np
import pytest

from minisgl_tpu.core import SamplingParams
from minisgl_tpu.llm import LLM
from minisgl_tpu.spec import propose_lookup_drafts


# ------------------------------------------------------------- proposer unit


def test_propose_basic_match():
    ids = np.array([5, 6, 7, 8, 9, 1, 2, 5, 6, 7], np.int32)
    # suffix 3-gram [5,6,7] occurs at position 0 -> continuation [8, 9, 1, 2]
    out = propose_lookup_drafts(ids, 4, ngram_max=3, ngram_min=2)
    assert out.tolist() == [8, 9, 1, 2]


def test_propose_prefers_longer_ngram_and_recency():
    # suffix [1,2,3] matches twice; the LATER occurrence (followed by 9) wins
    ids = np.array([1, 2, 3, 7, 1, 2, 3, 9, 8, 1, 2, 3], np.int32)
    out = propose_lookup_drafts(ids, 2, ngram_max=3, ngram_min=2)
    assert out.tolist() == [9, 8]


def test_propose_no_match_and_limits():
    ids = np.array([1, 2, 3, 4, 5, 6], np.int32)
    assert propose_lookup_drafts(ids, 4).size == 0  # no repeat anywhere
    assert propose_lookup_drafts(ids[:2], 4).size == 0  # too short
    # trivial self-match (suffix matching itself) must not propose
    rep = np.array([1, 2, 1, 2], np.int32)
    out = propose_lookup_drafts(rep, 4, ngram_max=2, ngram_min=2)
    assert out.tolist() == [1, 2]  # matched at 0, continuation = tokens 2..
    assert propose_lookup_drafts(np.array([3, 4], np.int32), 4).size == 0


def test_propose_clips_at_history_end():
    ids = np.array([1, 2, 3, 4, 1, 2, 3], np.int32)
    out = propose_lookup_drafts(ids, 8, ngram_max=3, ngram_min=2)
    assert out.tolist() == [4, 1, 2, 3]  # only 4 known continuation tokens


# ----------------------------------------------------------------------- e2e


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    from tests.helpers import save_tiny_hf_model

    d = str(tmp_path_factory.mktemp("spec"))
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
    )
    base.update(kw)
    return LLM(model_dir, **base)


REPETITIVE = ([17, 23, 31, 47, 53] * 6)[:28]  # suffix n-gram recurs
RANDOM = list(np.random.default_rng(7).integers(5, 250, 24))


def test_spec_matches_plain_greedy(model_dir):
    sp = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True)
    plain = _llm(model_dir).generate([REPETITIVE, RANDOM], sp)
    # ngram_min=1 so the generated tail (which breaks longer suffix n-grams
    # on a random tiny model) still proposes: any recurring token drafts.
    # Greedy + fixed fixture weights make this deterministic.
    llm = _llm(
        model_dir, spec_algo="lookup", spec_draft_tokens=4, spec_ngram_min=1
    )
    spec = llm.generate([REPETITIVE, RANDOM], sp)
    for p, s in zip(plain, spec):
        assert p["token_ids"] == s["token_ids"]
    assert llm.metrics.spec_steps > 0
    assert llm.metrics.spec_draft_tokens > 0
    llm.cache_manager.check_integrity()


def test_spec_oracle_full_acceptance(model_dir, monkeypatch):
    """With a perfect draft oracle every verify step accepts its full draft
    window: outputs stay token-exact and total dispatches drop well below
    one-per-token."""
    sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    prompt = RANDOM
    plain_llm = _llm(model_dir)
    plain = plain_llm.generate([prompt], sp)[0]["token_ids"]
    full = np.asarray(list(prompt) + list(plain), np.int32)

    def oracle(ids, max_drafts, ngram_max, ngram_min):
        n = len(ids)
        assert np.array_equal(np.asarray(ids), full[:n])
        return full[n : n + max_drafts]

    import minisgl_tpu.scheduler.scheduler as sched_mod

    monkeypatch.setattr(sched_mod, "propose_lookup_drafts", oracle)
    llm = _llm(model_dir, spec_algo="lookup", spec_draft_tokens=6)
    out = llm.generate([prompt], sp)[0]["token_ids"]
    assert out == plain
    m = llm.metrics
    # full acceptance except the final window, where the max_tokens budget
    # may clamp the bonus token before the last drafts count as accepted
    assert m.spec_draft_tokens > 0
    assert m.spec_accepted_tokens >= m.spec_draft_tokens - 1
    # 24 tokens in ~24/7 verify steps (+1 prefill) instead of 24 decodes
    assert m.spec_steps + m.decode_steps <= 6
    llm.cache_manager.check_integrity()


def test_spec_stop_token_inside_window(model_dir, monkeypatch):
    """A stop token emitted mid-acceptance-window must truncate the output
    exactly where the plain path stops."""
    sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    prompt = REPETITIVE
    plain = _llm(model_dir).generate([prompt], sp)[0]["token_ids"]
    stop_tok = plain[9]  # stop in the middle of the output
    sp_stop = SamplingParams(
        temperature=0.0, max_tokens=24, ignore_eos=True,
        stop_token_ids=[int(stop_tok)],
    )
    plain_stop = _llm(model_dir).generate([prompt], sp_stop)[0]["token_ids"]

    full = np.asarray(list(prompt) + list(plain), np.int32)

    def oracle(ids, max_drafts, ngram_max, ngram_min):
        n = len(ids)
        return full[n : n + max_drafts]

    import minisgl_tpu.scheduler.scheduler as sched_mod

    monkeypatch.setattr(sched_mod, "propose_lookup_drafts", oracle)
    llm = _llm(model_dir, spec_algo="lookup", spec_draft_tokens=6)
    spec_stop = llm.generate([prompt], sp_stop)[0]["token_ids"]
    assert spec_stop == plain_stop
    llm.cache_manager.check_integrity()


def test_spec_mixed_greedy_and_sampled(model_dir):
    """Sampled requests bypass the verify path (greedy-only) but both kinds
    complete, and the greedy one stays token-exact vs plain."""
    g = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    s = SamplingParams(temperature=0.8, max_tokens=12, ignore_eos=True, seed=3)
    plain = _llm(model_dir).generate([REPETITIVE], g)[0]["token_ids"]
    llm = _llm(model_dir, spec_algo="lookup", spec_draft_tokens=4)
    res = llm.generate([REPETITIVE, RANDOM], [g, s])
    assert res[0]["token_ids"] == plain
    assert len(res[1]["token_ids"]) == 12
    llm.cache_manager.check_integrity()


def test_spec_max_tokens_clamp(model_dir, monkeypatch):
    """Acceptance window crossing the max_tokens budget truncates exactly."""
    sp = SamplingParams(temperature=0.0, max_tokens=7, ignore_eos=True)
    prompt = RANDOM
    plain = _llm(model_dir).generate([prompt], sp)[0]["token_ids"]
    sp_long = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    ref_long = _llm(model_dir).generate([prompt], sp_long)[0]["token_ids"]
    full = np.asarray(list(prompt) + list(ref_long), np.int32)

    def oracle(ids, max_drafts, ngram_max, ngram_min):
        n = len(ids)
        return full[n : n + max_drafts]

    import minisgl_tpu.scheduler.scheduler as sched_mod

    monkeypatch.setattr(sched_mod, "propose_lookup_drafts", oracle)
    llm = _llm(model_dir, spec_algo="lookup", spec_draft_tokens=5)
    out = llm.generate([prompt], sp)[0]["token_ids"]
    assert out == plain and len(out) == 7
    llm.cache_manager.check_integrity()


def test_spec_rejection_at_output_limit(model_dir, monkeypatch):
    """Drafts staged right up to a request's output limit advance
    device_len to max (filter_reqs drops the row from the running set at
    dispatch); when the verify REJECTS drafts, the settle rewind puts the
    request back under its limit — it must be re-admitted to decode, not
    stranded with its slot and pages leaked (found by the on-chip spec
    bench: the run deadlocked and idle integrity flagged 2 leaked pages)."""
    import threading

    import minisgl_tpu.scheduler.scheduler as sched_mod

    def garbage(ids, max_drafts, ngram_max, ngram_min):
        # always propose, always wrong: every verify rejects at position 0
        return np.full((max_drafts,), 3, np.int32)

    monkeypatch.setattr(sched_mod, "propose_lookup_drafts", garbage)
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    plain = _llm(model_dir).generate([RANDOM], sp)[0]["token_ids"]

    llm = _llm(model_dir, spec_algo="lookup", spec_draft_tokens=6)
    result = {}

    def run():
        result["out"] = llm.generate([RANDOM], sp)[0]["token_ids"]

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout=120)
    assert not t.is_alive(), "request stranded after near-limit rejection"
    assert result["out"] == plain
    llm.cache_manager.check_integrity()


def test_spec_auto_gate_by_batch_size(model_dir):
    """spec_max_batch bypasses drafting while the running set exceeds it
    (measured crossover, BENCHLOG round 3: lookup wins at small batch,
    loses ~3x at bs=32): with 4 repetitive prompts and spec_max_batch=2 no
    proposals fire, outputs match plain greedy, and the flag stays safe to
    leave enabled. spec_max_batch=0 disables the gate (drafting resumes)."""
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    prompts = [REPETITIVE] * 4
    plain = _llm(model_dir).generate(prompts, sp)

    gated = _llm(
        model_dir, spec_algo="lookup", spec_draft_tokens=4,
        spec_ngram_min=1, spec_max_batch=2,
    )
    out = gated.generate(prompts, sp)
    for p, s in zip(plain, out):
        assert p["token_ids"] == s["token_ids"]
    assert gated.metrics.spec_steps == 0  # gate held: no verify dispatched
    gated.cache_manager.check_integrity()

    ungated = _llm(
        model_dir, spec_algo="lookup", spec_draft_tokens=4,
        spec_ngram_min=1, spec_max_batch=0,
    )
    out2 = ungated.generate(prompts, sp)
    for p, s in zip(plain, out2):
        assert p["token_ids"] == s["token_ids"]
    assert ungated.metrics.spec_steps > 0
    ungated.cache_manager.check_integrity()


def test_verify_rides_combined_dispatch(model_dir):
    """A staged spec proposal must be scheduled as a verify batch even when
    a prefill dispatches the same iteration (combined dispatch): verify
    rows were previously excluded from the decode stream AND never
    scheduled while prefills kept coming, stranding spec-reserved rows for
    the whole prefill train (round-4 advisor finding)."""
    llm = _llm(
        model_dir, spec_algo="lookup", spec_draft_tokens=4, spec_ngram_min=1
    )
    rep = llm.replicas[0]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    # one running request with a staged proposal
    llm.generate([REPETITIVE], sp)  # drains fully; now craft state by hand
    from minisgl_tpu.core import Req

    req = Req(
        input_ids=np.asarray(REPETITIVE, np.int32),
        table_idx=rep.table_manager.allocate(),
        cached_len=len(REPETITIVE) - 1,
        output_len=8,
        uid=991,
        cache_handle=rep.cache_manager.match_req_ids(
            np.asarray(REPETITIVE[:-1], np.int32)
        )
        if hasattr(rep.cache_manager, "match_req_ids")
        else None,
        sampling_params=sp,
    )
    # make it a running decode row with resources
    rep.cache_manager.allocate_paged([req])
    rep.decode_manager.filter_reqs([req])
    req.spec_proposal = np.asarray([17, 23, 31], np.int32)
    # and a pending prefill
    rep.prefill_manager.add_one_req(
        992, np.asarray(RANDOM, np.int32), sp
    )
    batches = llm._schedule_next_batches(rep)
    phases = [b.phase for b in batches]
    assert "prefill" in phases, phases
    assert "verify" in phases, phases
