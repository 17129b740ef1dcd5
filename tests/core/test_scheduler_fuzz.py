"""Randomized scheduler stress: random request lengths, mid-flight aborts,
pipeline depths and decode bursts — after every run the allocator and radix
tree must pass integrity, no request may exceed its token budget, and
non-aborted requests must complete exactly."""

import numpy as np
import pytest

from minisgl_tpu.core import SamplingParams
from minisgl_tpu.llm import LLM
from minisgl_tpu.message import AbortBackendMsg


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    from tests.helpers import save_tiny_hf_model

    d = str(tmp_path_factory.mktemp("fuzz"))
    save_tiny_hf_model(d, "llama")
    return d


@pytest.mark.parametrize(
    "depth,decode_steps,seed", [(1, 1, 0), (2, 4, 1), (3, 2, 2)]
)
def test_fuzz_aborts_and_integrity(model_dir, depth, decode_steps, seed):
    rng = np.random.default_rng(seed)
    llm = LLM(
        model_dir,
        use_dummy_weight=False,
        max_running_req=6,
        max_seq_len_override=128,
        num_page_override=96,  # tight: forces eviction under load
        page_size=4,
        cache_type="radix",
        pipeline_depth=depth,
        decode_steps=decode_steps,
        max_extend_tokens=48,  # chunks the longer prompts
    )
    n = 14
    prompts = [
        rng.integers(5, 200, int(rng.integers(3, 60))).astype(np.int32).tolist()
        for _ in range(n)
    ]
    budgets = [int(rng.integers(1, 20)) for _ in range(n)]
    params = [
        SamplingParams(temperature=0.0, max_tokens=b, ignore_eos=True)
        for b in budgets
    ]

    # inject aborts for a random subset of uids at random loop iterations
    abort_uids = set(int(u) for u in rng.choice(n, size=4, replace=False))
    abort_at = {u: int(rng.integers(1, 25)) for u in abort_uids}
    it = {"i": 0}
    orig = llm.overlap_loop

    def chaotic():
        it["i"] += 1
        for u, at in list(abort_at.items()):
            if it["i"] == at:
                llm._process_one_msg(AbortBackendMsg(uid=u))
                del abort_at[u]
        orig()

    llm.overlap_loop = chaotic
    try:
        results = llm.generate(prompts, params)
    finally:
        llm.overlap_loop = orig

    for rep in llm.replicas:
        rep.cache_manager.check_integrity()
        assert not rep.inflight
        assert not rep.finished_reqs
        assert not rep.decode_manager.running_reqs
    for uid, (res, b) in enumerate(zip(results, budgets)):
        got = len(res["token_ids"])
        if uid in abort_uids:
            assert got <= b  # aborted: possibly truncated, never over
        else:
            assert got == b, (uid, got, b)
