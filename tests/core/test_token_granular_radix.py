"""Token-granular radix matching + copy-on-extend (round-2 VERDICT #3).

The reference matches at page_size=1 (kvcache/radix_cache.py:219,233-236);
our DMA page is up to 128 tokens, so the tree matches token-granular over
physical pages: a match may end mid-page, the boundary page is adopted
read-only and copied into the adopter's own page before its first write
(scheduler/prefill.py + engine.copy_partial_pages). These tests cover the
tree mechanics (mid-page insert/split/evict with shared boundary pages) and
the end-to-end guarantee: a request admitted off a partial-page prefix hit
generates EXACTLY the tokens of an uncached run.
"""

import numpy as np
import pytest

from minisgl_tpu.core import SamplingParams
from minisgl_tpu.kvcache.radix_cache import RadixPrefixCache

PS = 4


def _pages(n, start=1):
    return np.arange(start, start + n, dtype=np.int32)


def test_partial_page_insert_and_match():
    c = RadixPrefixCache(PS)
    ids = np.arange(10, dtype=np.int32)  # 2.5 pages
    dup, h = c.insert_prefix(ids, _pages(3))
    assert dup == 0 and h.cached_len == 10
    assert c.size_info.evictable_size == 10
    assert c.size_info.evictable_pages == 3  # partial last page owned
    m = c.match_prefix(np.arange(7, dtype=np.int32)).handle
    assert m.cached_len == 7  # mid-page match
    np.testing.assert_array_equal(m.get_matched_page_ids(), [1, 2])
    c.check_integrity()


def test_self_extension_shares_boundary_page():
    """A request that inserted a partial page and keeps decoding into the
    SAME page re-inserts a longer prefix at finish: the extension node's
    first page is the same physical page (first_shared) — owned once."""
    c = RadixPrefixCache(PS)
    ids = np.arange(10, dtype=np.int32)
    c.insert_prefix(ids, _pages(3))
    longer = np.arange(15, dtype=np.int32)  # same pages + page 4
    dup, h = c.insert_prefix(longer, _pages(4))
    assert dup == 10
    assert c.size_info.evictable_size == 15
    # pages 1..4 owned once despite page 3 backing both nodes
    assert c.size_info.evictable_pages == 4
    c.check_integrity()
    # eviction frees each page exactly once
    freed = c.evict(4)
    assert sorted(int(p) for p in freed) == [1, 2, 3, 4]
    assert c.size_info.evictable_pages == 0
    c.check_integrity()


def test_copy_on_extend_branch_owns_boundary():
    """A DIFFERENT request diverging after a mid-page match inserts its own
    boundary page (its copy): both branches' pages are owned separately."""
    c = RadixPrefixCache(PS)
    a = np.arange(10, dtype=np.int32)
    c.insert_prefix(a, _pages(3))  # pages 1,2,3
    # b shares 7 tokens, then diverges; its pages are its own (4,5,6) —
    # page 4 is its copy of page 2's first 3 rows (7 % 4) + its own rows
    b = np.concatenate([a[:7], np.asarray([100, 101, 102], np.int32)])
    dup, h = c.insert_prefix(b, np.asarray([1, 4, 5], np.int32))
    assert dup == 7
    assert c.size_info.evictable_pages == 3 + 2  # a: 3; b: pages 4,5 owned
    c.check_integrity()
    # matching b again finds the full 10 tokens; the boundary dedupe rule
    # picks b's own page (richer copy) at index 1
    m = c.match_prefix(b).handle
    assert m.cached_len == 10
    np.testing.assert_array_equal(m.get_matched_page_ids(), [1, 4, 5])
    # the original branch still matches with ITS pages
    m2 = c.match_prefix(a).handle
    assert m2.cached_len == 10
    np.testing.assert_array_equal(m2.get_matched_page_ids(), [1, 2, 3])
    c.check_integrity()


def test_mid_page_split_shares_page():
    """Divergence inside a node at a mid-page position splits it; the two
    halves reference the same boundary page, owned by the upper half."""
    c = RadixPrefixCache(PS)
    a = np.arange(12, dtype=np.int32)
    c.insert_prefix(a, _pages(3))
    probe = np.concatenate([a[:6], np.asarray([50, 51], np.int32)])
    m = c.match_prefix(probe).handle
    assert m.cached_len == 6  # split [0,12) -> [0,6) + [6,12) sharing page 2
    assert c.size_info.evictable_pages == 3  # still owned once
    c.check_integrity()
    # evicting the lower half must NOT free the shared page 2
    freed = c.evict(1)
    assert sorted(int(p) for p in freed) == [3]
    m = c.match_prefix(a).handle
    assert m.cached_len == 6  # upper half (incl. page 2's rows) survives
    c.check_integrity()


def test_admission_under_full_radix_retention(tmp_path):
    """Re-running a workload whose prefixes fully populate the radix tree
    must not over-admit: every admitted request locks its matched path
    (removing it from the evictable pool), and the admission reservation
    must charge page rounding + K-burst lookahead + the boundary-copy rows
    — under-charging strands admitted requests that cannot allocate
    (caught as an eviction shortfall by the round-3 chip spec bench)."""
    import os

    from tests.helpers import save_tiny_hf_model
    from minisgl_tpu.llm import LLM

    model_dir = str(tmp_path / "m")
    os.makedirs(model_dir)
    save_tiny_hf_model(model_dir, "llama", max_position_embeddings=512)

    rng = np.random.default_rng(0)
    prompts = []
    for _ in range(16):
        block = rng.integers(100, 150, 12).tolist()
        body = []
        for i in range(6):
            body += block + [200 + i]
        prompts.append(body)

    # pool sized so wave 2's radix retention + 16 admissions contend hard
    llm = LLM(
        model_dir,
        use_dummy_weight=True,
        max_running_req=16,
        max_seq_len_override=256,
        num_page_override=400,
        page_size=4,
        attention_backend="xla",
        cache_type="radix",
        decode_steps=8,
        pipeline_depth=4,
    )
    sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    w1 = llm.generate([p[:] for p in prompts], sp)
    w2 = llm.generate(prompts, sp)  # identical ids: tree fully hot
    for r1, r2 in zip(w1, w2):
        assert r1["token_ids"] == r2["token_ids"]
    for rep in llm.replicas:
        rep.cache_manager.check_integrity()


@pytest.mark.parametrize("shared_len", [96, 37])
def test_e2e_partial_prefix_exact_tokens(tmp_path, shared_len):
    """Two prompts sharing a sub-page prefix: the second is admitted off a
    token-granular hit + boundary copy and must generate exactly the tokens
    of an uncached (naive) run. page_size 64 makes shared_len=96 a 1.5-page
    hit; 37 stays below one page entirely (whole-page adoption would be 0)."""
    from tests.helpers import save_tiny_hf_model
    from minisgl_tpu.llm import LLM

    model_dir = str(tmp_path / "model")
    import os

    os.makedirs(model_dir)
    save_tiny_hf_model(model_dir, "llama", max_position_embeddings=512)

    rng = np.random.default_rng(0)
    shared = rng.integers(5, 250, shared_len).tolist()
    p1 = shared + rng.integers(5, 250, 40).tolist()
    p2 = shared + rng.integers(5, 250, 40).tolist()
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)

    def run(cache_type):
        llm = LLM(
            model_dir,
            max_running_req=4,
            max_seq_len_override=256,
            num_page_override=64,
            page_size=64,
            cache_type=cache_type,
            attention_backend="xla",
        )
        # sequential: p1 finishes (inserted into the radix incl. its
        # partial page) before p2 is admitted off the partial hit
        out1 = llm.generate([p1], params)
        out2 = llm.generate([p2], params)
        if cache_type == "radix":
            m = llm.metrics
            assert m.prefill_cached_tokens > 0, "expected a radix hit"
            if shared_len == 96:
                # token-granular: the hit must exceed whole-page matching
                assert m.prefill_cached_tokens > 64
        return out1[0]["token_ids"], out2[0]["token_ids"]

    naive = run("naive")
    radix = run("radix")
    assert radix[0] == naive[0]
    assert radix[1] == naive[1]
