"""Property tests for the page allocator + radix prefix cache.

Device-free scheduler-brain tests mirroring the reference's only fixture-based
suite (/root/reference/tests/core/test_cache_allocate.py): page-aligned
allocation with eviction, no overlap, lock/unlock size accounting, and the
free+cached==total integrity invariant through alloc/evict cycles.
"""

import numpy as np
import pytest

from minisgl_tpu.core import Req, SamplingParams
from minisgl_tpu.scheduler.cache import CacheManager
from minisgl_tpu.scheduler.table import TableManager

NUM_PAGES = 16
PAGE_SIZE = 4


@pytest.fixture
def mgr():
    table = TableManager(max_running_reqs=8)
    cache = CacheManager(NUM_PAGES, PAGE_SIZE, table, cache_type="radix")
    return table, cache


def make_req(table, ids, table_idx=None, cached_len=0, output_len=4, uid=0):
    if table_idx is None:
        table_idx = table.allocate()
    from minisgl_tpu.kvcache.radix_cache import RadixCacheHandle

    return Req(
        input_ids=np.asarray(ids, dtype=np.int32),
        table_idx=table_idx,
        cached_len=cached_len,
        output_len=output_len,
        uid=uid,
        sampling_params=SamplingParams(max_tokens=output_len),
    )


def test_basic_allocate(mgr):
    table, cache = mgr
    req = make_req(table, list(range(10)))
    cache.allocate_paged([req])
    pages = table.page_lists[req.table_idx]
    assert len(pages) == 3  # ceil(10/4)
    assert len(set(pages)) == 3
    assert 0 not in pages  # dummy page never allocated
    assert len(cache.free_pages) == NUM_PAGES - 3


def test_allocate_extends_only(mgr):
    table, cache = mgr
    req = make_req(table, list(range(10)))
    cache.allocate_paged([req])
    before = list(table.page_lists[req.table_idx])
    # decode: one more token fits in the partial page
    req.complete_one()
    cache.allocate_paged([req])
    assert table.page_lists[req.table_idx] == before
    # two more tokens cross the page boundary
    req.complete_one()
    req.complete_one()
    cache.allocate_paged([req])
    assert len(table.page_lists[req.table_idx]) == 4
    assert table.page_lists[req.table_idx][:3] == before


def test_no_overlap_many_reqs(mgr):
    table, cache = mgr
    reqs = [make_req(table, list(range(i, i + 8)), uid=i) for i in range(4)]
    cache.allocate_paged(reqs)
    all_pages = []
    for r in reqs:
        all_pages += table.page_lists[r.table_idx]
    assert len(all_pages) == len(set(all_pages)) == 8


def test_cache_and_reuse(mgr):
    table, cache = mgr
    ids = list(range(12))
    req = make_req(table, ids)
    # simulate prefill bookkeeping: lock the (empty) match first
    from minisgl_tpu.scheduler.prefill import PendingReq

    pending = PendingReq(0, np.asarray(ids, np.int32), SamplingParams())
    handle = cache.match_req(pending).handle
    assert handle.cached_len == 0
    cache.lock(handle)
    req.cache_handle = handle
    cache.allocate_paged([req])
    req.cached_len = 12  # prefill complete
    cache.cache_req(req, finished=True)
    cache.check_integrity()
    # 12 tokens = 3 pages now live in the radix cache, evictable
    assert cache.prefix_cache.size_info.evictable_size == 12
    assert len(cache.free_pages) == NUM_PAGES - 3

    # same prompt: token-granular match = everything except the last token
    # (recomputed for logits); the partial third page is adoptable read-only
    pending2 = PendingReq(1, np.asarray(ids, np.int32), SamplingParams())
    m = cache.match_req(pending2).handle
    assert m.cached_len == 11
    assert len(m.get_matched_page_ids()) == 3  # ceil(11/4), last partial
    plan = cache.adopt_plan(m)
    assert len(plan.whole_pages) == 2
    assert plan.boundary_rows == 3  # 11 % 4
    assert plan.boundary_src == int(m.get_matched_page_ids()[2])


def test_eviction_on_demand(mgr):
    table, cache = mgr
    # fill the cache with two finished requests
    for uid, base in enumerate((0, 100)):
        ids = list(range(base, base + 24))
        req = make_req(table, ids, uid=uid)
        from minisgl_tpu.kvcache.naive_cache import _NaiveHandle  # noqa

        handle = cache.prefix_cache.match_prefix(np.asarray(ids[:1], np.int32)).handle
        cache.lock(handle)
        req.cache_handle = handle
        cache.allocate_paged([req])
        req.cached_len = 24
        cache.cache_req(req, finished=True)
        table.free(req.table_idx)
    cache.check_integrity()
    assert len(cache.free_pages) == NUM_PAGES - 12
    assert cache.prefix_cache.size_info.evictable_size == 48

    # allocating more than free forces LRU eviction
    big = make_req(table, list(range(200, 200 + 40)), uid=9)
    cache.allocate_paged([big])
    assert len(table.page_lists[big.table_idx]) == 10
    # integrity (idle invariant) holds again once the request's pages return
    cache._free(table.page_lists[big.table_idx])
    table.free(big.table_idx)
    cache.check_integrity()


def test_lock_prevents_eviction(mgr):
    table, cache = mgr
    ids = list(range(16))
    req = make_req(table, ids)
    handle0 = cache.prefix_cache.match_prefix(np.asarray(ids, np.int32)).handle
    cache.lock(handle0)
    req.cache_handle = handle0
    cache.allocate_paged([req])
    req.cached_len = 16
    cache.cache_req(req, finished=False)  # stays locked
    info = cache.prefix_cache.size_info
    assert info.protected_size == 16 and info.evictable_size == 0
    with pytest.raises(AssertionError):
        cache.prefix_cache.evict(4)
    # unlock -> evictable
    cache.unlock(req.cache_handle)
    info = cache.prefix_cache.size_info
    assert info.evictable_size == 16
    freed = cache.prefix_cache.evict(4)
    assert len(freed) >= 1


def test_shared_prefix_dedup(mgr):
    """Two requests sharing a prefix: the second's duplicate pages for the
    already-cached region are freed by cache_req."""
    table, cache = mgr
    ids_a = list(range(8)) + [100, 101, 102, 103]
    ids_b = list(range(8)) + [200, 201, 202, 203]

    def run_one(uid, ids):
        from minisgl_tpu.scheduler.prefill import PendingReq

        pending = PendingReq(uid, np.asarray(ids, np.int32), SamplingParams())
        handle = cache.match_req(pending).handle
        cache.lock(handle)
        cached = handle.cached_len
        req = make_req(table, ids, cached_len=cached if cached else 0, uid=uid)
        req.cache_handle = handle
        if cached:
            table.page_lists[req.table_idx] = [
                int(p) for p in handle.get_matched_page_ids()
            ]
        cache.allocate_paged([req])
        req.cached_len = len(ids)
        cache.cache_req(req, finished=True)
        table.free(req.table_idx)
        return req

    run_one(0, ids_a)
    used_after_a = NUM_PAGES - len(cache.free_pages)
    assert used_after_a == 3
    run_one(1, ids_b)
    cache.check_integrity()
    # shared prefix (2 pages) stored once + 1 unique suffix page each
    assert NUM_PAGES - len(cache.free_pages) == 4


def test_radix_node_split(mgr):
    table, cache = mgr
    prefix = list(range(8))

    def insert(ids, uid):
        from minisgl_tpu.scheduler.prefill import PendingReq

        pending = PendingReq(uid, np.asarray(ids, np.int32), SamplingParams())
        handle = cache.match_req(pending).handle
        cache.lock(handle)
        req = make_req(table, ids, cached_len=handle.cached_len, uid=uid)
        req.cache_handle = handle
        if handle.cached_len:
            table.page_lists[req.table_idx] = [
                int(p) for p in handle.get_matched_page_ids()
            ]
        cache.allocate_paged([req])
        req.cached_len = len(ids)
        cache.cache_req(req, finished=True)
        table.free(req.table_idx)

    insert(prefix + [50, 51, 52, 53, 60, 61, 62, 63], 0)
    # diverges at page 3 -> forces a split of the 4-page node
    insert(prefix + [50, 51, 52, 53, 70, 71, 72, 73], 1)
    cache.check_integrity()
    m = cache.prefix_cache.match_prefix(
        np.asarray(prefix + [50, 51, 52, 53], np.int32)
    ).handle
    assert m.cached_len == 12


def test_dup_region_repointed_to_canonical(mgr):
    """Two identical prefixes prefilled concurrently: when the second
    finishes prefill, its duplicate pages are freed AND its live page list
    is repointed at the tree's canonical pages — otherwise a later
    reallocation of the freed pages corrupts the second request's decode
    reads (hazard present in the reference, cache.py:74)."""
    table, cache = mgr
    shared = list(range(8))
    ids_a = shared + [100, 101, 102, 103]
    ids_b = shared + [200, 201, 202, 203]

    def admit(uid, ids):
        from minisgl_tpu.scheduler.prefill import PendingReq

        pending = PendingReq(uid, np.asarray(ids, np.int32), SamplingParams())
        handle = cache.match_req(pending).handle
        cache.lock(handle)
        req = make_req(table, ids, cached_len=handle.cached_len, uid=uid)
        req.cache_handle = handle
        cache.allocate_paged([req])
        return req

    # both admitted before either caches: no prefix match for either
    req_a = admit(0, ids_a)
    req_b = admit(1, ids_b)
    pages_b_before = list(table.page_lists[req_b.table_idx])

    req_a.cached_len = len(ids_a)
    cache.cache_req(req_a, finished=False)
    canonical = [int(p) for p in table.page_lists[req_a.table_idx][:2]]

    req_b.cached_len = len(ids_b)
    cache.cache_req(req_b, finished=False)
    pages_b = table.page_lists[req_b.table_idx]
    # shared region (2 pages) now points at A's canonical pages
    assert pages_b[:2] == canonical
    # B's own duplicate pages were freed
    assert all(p in cache.free_pages for p in pages_b_before[:2])
    # unique suffix untouched
    assert pages_b[2:] == pages_b_before[2:]
    # cleanup keeps the allocator consistent
    cache.free_req_pages(req_a)
    table.free(req_a.table_idx)
    cache.free_req_pages(req_b)
    table.free(req_b.table_idx)
    cache.check_integrity()


def test_page_array_cache_sees_repoint(mgr):
    """The TableManager's cached numpy page arrays must be invalidated by
    the dup-region repoint (same list object, same length, new contents) —
    otherwise the next decode step's metadata ships the freed pages."""
    table, cache = mgr
    shared = list(range(8))

    def admit(uid, ids):
        from minisgl_tpu.scheduler.prefill import PendingReq

        pending = PendingReq(uid, np.asarray(ids, np.int32), SamplingParams())
        handle = cache.match_req(pending).handle
        cache.lock(handle)
        req = make_req(table, ids, cached_len=handle.cached_len, uid=uid)
        req.cache_handle = handle
        cache.allocate_paged([req])
        return req

    req_a = admit(0, shared + [100, 101, 102, 103])
    req_b = admit(1, shared + [200, 201, 202, 203])
    # warm the cache the way build_batch_metadata does
    stale = table.page_array(req_b.table_idx).copy()
    req_a.cached_len = 12
    cache.cache_req(req_a, finished=False)
    req_b.cached_len = 12
    cache.cache_req(req_b, finished=False)
    fresh = table.page_array(req_b.table_idx)
    assert fresh.tolist() == table.page_lists[req_b.table_idx]
    assert fresh[:2].tolist() != stale[:2].tolist()
    for r in (req_a, req_b):
        cache.free_req_pages(r)
        table.free(r.table_idx)
    cache.check_integrity()
