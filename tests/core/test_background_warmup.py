"""Background AOT warmup (round-2 VERDICT #10): every step-variant compile
that would ambush live traffic is done ahead of time on a daemon thread via
``lower().compile()`` — no device state touched. The Compiled executables
are installed into the engine's step table and must serve byte-identically
to the jit path."""

import numpy as np

from minisgl_tpu.core import SamplingParams


def _make_llm(model_dir, background: bool):
    from minisgl_tpu.llm import LLM

    return LLM(
        model_dir,
        use_dummy_weight=True,
        max_running_req=4,
        max_seq_len_override=128,
        num_page_override=64,
        page_size=4,
        attention_backend="xla",
        decode_steps=2,
        background_warmup=background,
    )


def test_aot_variants_serve_identically(tmp_path):
    import os

    from tests.helpers import save_tiny_hf_model

    model_dir = str(tmp_path / "m")
    os.makedirs(model_dir)
    save_tiny_hf_model(model_dir, "llama")

    prompts = [[3, 5, 7, 9, 11], [13, 17]]
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)

    ref = _make_llm(model_dir, background=False).generate(prompts, sp)

    llm = _make_llm(model_dir, background=True)
    eng = llm.engine
    # run the warmup synchronously so the test is deterministic
    eng._warm_all_variants()
    n_compiled = len(eng._step_fns)
    assert n_compiled > 2, eng._step_fns.keys()
    got = llm.generate(prompts, sp)
    for r, g in zip(ref, got):
        assert r["token_ids"] == g["token_ids"]
    # serving reused the precompiled table (no new variants were built for
    # the buckets this workload hits)
    greedy_keys = [k for k in eng._step_fns if k[1] is True]
    assert len(greedy_keys) >= 2


def test_agree_alloc_outcome_collective(monkeypatch):
    """The KV-pool allocation retry decision is collective: every host
    all-gathers (ok, proposal) and takes min over both — a host that OOMed
    while others succeeded must drive ALL hosts to retry at its smaller
    proposal (round-4 advisor: a subset-failure previously hung the job in
    mismatched collectives)."""
    import numpy as np

    import minisgl_tpu.engine.engine as E

    eng = object.__new__(E.Engine)  # no device init needed

    # single process: identity
    assert eng._agree_alloc_outcome(True, 100) == (True, 100)
    assert eng._agree_alloc_outcome(False, 85) == (False, 85)

    # simulate 3 hosts: this host ok@100, another failed and proposes 85
    import jax

    monkeypatch.setattr(jax, "process_count", lambda: 3)
    from jax.experimental import multihost_utils

    gathered = np.asarray(
        [[1, 100], [0, 85], [1, 100]], dtype=np.int64
    ).reshape(-1)

    monkeypatch.setattr(
        multihost_utils, "process_allgather", lambda x: gathered
    )
    ok, pages = eng._agree_alloc_outcome(True, 100)
    assert ok is False and pages == 85

    # all ok -> proceed at the smallest (they should already agree)
    gathered = np.asarray(
        [[1, 100], [1, 100], [1, 100]], dtype=np.int64
    ).reshape(-1)
    ok, pages = eng._agree_alloc_outcome(True, 100)
    assert ok is True and pages == 100
