"""Page allocator + prefix-cache owner, token-granular prefix reuse.

Behavioral counterpart of /root/repo/../reference scheduler/cache.py —
/root/reference/python/minisgl/scheduler/cache.py (free list, eviction-on-
demand, the documented region diagram of cache_req, and the
free+cached==total integrity check) — with two TPU-build departures:

- PAGE-granular allocation (the free list holds page ids; page 0 is the
  reserved dummy and never circulates) while prefix matching is
  TOKEN-granular (kvcache/radix_cache.py): a match may end mid-page. The
  adopter reads the boundary page's matched rows and must copy them into a
  fresh page before writing (copy-on-extend; the plan is produced here and
  executed by the engine as a device-side page copy).
- no lazy_free_region: the reference defers frees to avoid CUDA stream
  use-after-free during overlap scheduling (cache.py:93-104); under XLA,
  steps are dispatch-ordered on the device queue and every batch ships its
  own page-table snapshot, so a page freed while step N is in flight can
  only be *written* by step N+1's scatter, which executes after N.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import TYPE_CHECKING, List, Optional

import numpy as np

from minisgl_tpu.core import Req
from minisgl_tpu.kvcache import MatchResult, create_prefix_cache
from minisgl_tpu.kvcache.base import BaseCacheHandle
from minisgl_tpu.utils import div_ceil

if TYPE_CHECKING:
    from minisgl_tpu.scheduler.prefill import PendingReq
    from minisgl_tpu.scheduler.table import TableManager


@dataclass(frozen=True)
class AdoptPlan:
    """How an admitted request takes over a matched prefix: whole pages go
    straight into its page table; a mid-page boundary is adopted by copying
    the matched rows of ``boundary_src`` into the request's own fresh page
    (allocated like any other) before its first prefill step."""

    whole_pages: List[int]
    boundary_src: int = -1  # matched page to copy from (-1: none)
    boundary_rows: int = 0  # valid rows in it (= cached_len % page_size)


class CacheManager:
    def __init__(
        self,
        num_pages: int,
        page_size: int,
        table_manager: "TableManager",
        cache_type: str = "radix",
    ):
        # page 0 reserved as dummy: usable pages are 1..num_pages
        self.num_pages = num_pages
        self.page_size = page_size
        self.free_pages: List[int] = list(range(1, num_pages + 1))
        self.prefix_cache = create_prefix_cache(cache_type, page_size)
        self.table_manager = table_manager

    def match_req(self, req: "PendingReq") -> MatchResult:
        input_len = req.input_len
        assert input_len > 0
        # exclude the last token: it must be recomputed to produce logits
        # (reference cache.py:27-31)
        return self.prefix_cache.match_prefix(req.input_ids[: input_len - 1])

    def adopt_plan(self, handle: BaseCacheHandle) -> AdoptPlan:
        """Adoption plan for a locked match (see AdoptPlan)."""
        ps = self.page_size
        matched = handle.get_matched_page_ids()
        whole = handle.cached_len // ps
        rows = handle.cached_len % ps
        return AdoptPlan(
            whole_pages=[int(p) for p in matched[:whole]],
            boundary_src=int(matched[whole]) if rows else -1,
            boundary_rows=rows,
        )

    @property
    def available_size(self) -> int:  # tokens
        return (
            len(self.free_pages) + self.prefix_cache.size_info.evictable_pages
        ) * self.page_size

    def lock(self, handle: BaseCacheHandle) -> None:
        self.prefix_cache.lock_handle(handle, unlock=False)

    def unlock(self, handle: BaseCacheHandle) -> None:
        self.prefix_cache.lock_handle(handle, unlock=True)

    def allocate_paged(self, reqs: List[Req], lookahead: int = 0) -> None:
        """Extend each req's page list to cover [cached_len, device_len +
        lookahead) — lookahead covers multi-step decode bursts."""
        for req in reqs:
            pages = self.table_manager.page_lists[req.table_idx]
            need = (
                div_ceil(req.device_len + lookahead, self.page_size)
                - len(pages)
            )
            if need > 0:
                pages.extend(self._allocate(need))

    def cache_req(self, req: Req, *, finished: bool) -> None:
        # Region diagram (tokens; ALL boundaries may be mid-page under
        # token-granular matching — mirrors reference cache.py:55-79 at its
        # page_size=1 default):
        #   [0, old.cached_len)            was already locked in the cache;
        #                                  our pages below idx0 are adopted
        #                                  tree pages, the boundary page at
        #                                  idx0 is our copy-on-extend page
        #   [old.cached_len, dup_len)      cached by OTHER reqs meanwhile ->
        #                                  our WHOLE pages in that span are
        #                                  duplicates (same tokens => same
        #                                  KV) and are freed
        #   [dup_len, new.cached_len)      newly inserted (pages now owned
        #                                  by the prefix cache, incl. a
        #                                  partial last page — append-only
        #                                  rows make that safe while this
        #                                  request keeps decoding into it)
        #   [new.cached_len, end)          uncacheable tail (decode
        #                                  reservation) -> freed on finish
        ps = self.page_size
        pages = self.table_manager.page_lists[req.table_idx]
        insert_ids = req.input_ids[: req.cached_len]
        insert_len = len(insert_ids)
        old_handle = req.cache_handle
        assert old_handle is not None
        dup_len, new_handle = self.prefix_cache.insert_prefix(
            insert_ids, np.asarray(pages, dtype=np.int32)
        )
        assert dup_len >= old_handle.cached_len, (dup_len, old_handle.cached_len)
        # our own pages start at idx0; below that the tree owns them
        idx0 = self._own_start(old_handle, pages)
        self.unlock(old_handle)
        dup_hi = dup_len // ps  # whole pages duplicated by others' inserts
        if dup_hi > idx0:
            ours = pages[idx0:dup_hi]
            if not finished:
                # The reference frees duplicates outright (cache.py:74) and
                # leaves the request's table row pointing at freed pages —
                # a stale-KV read if reallocated while this request still
                # decodes. Repoint the live request at the canonical pages
                # (same token content -> same KV) before freeing ours.
                canonical = new_handle.get_matched_page_ids()
                pages[idx0:dup_hi] = (int(p) for p in canonical[idx0:dup_hi])
                self.table_manager.invalidate(req.table_idx)
            self._free(ours)
        if finished:
            if dup_len < new_handle.cached_len:
                # our branch entered the tree with our pages
                # [dup_hi, ceil(cached/ps)); everything beyond is ours
                # (new_handle.cached_len == insert_len for the radix cache;
                # 0 for the naive cache, which takes no pages)
                tree_hi = div_ceil(new_handle.cached_len, ps)
            else:
                # fully duplicate (or naive): nothing of ours entered the
                # tree; our partial boundary page at dup_hi is ours to free
                tree_hi = dup_hi
            self._free(pages[max(tree_hi, idx0):])
        else:
            req.cache_handle = new_handle
            self.lock(new_handle)

    def _own_start(self, handle: Optional[BaseCacheHandle], pages) -> int:
        """First page index the REQUEST owns. Pages below the handle's span
        belong to the tree; the mid-page boundary page is the request's own
        copy-on-extend page after ADOPTION (table page != tree page) but
        tree-owned after an earlier token-granular INSERT (same physical
        page — freeing it would double-count)."""
        if handle is None:
            return 0
        ps = self.page_size
        idx0 = handle.cached_len // ps
        if handle.cached_len % ps != 0:
            matched = handle.get_matched_page_ids()
            if idx0 < len(pages) and int(matched[idx0]) == int(pages[idx0]):
                idx0 += 1  # boundary page is the tree's, not a copy
        return idx0

    def free_req_pages(self, req: Req) -> None:
        """Free all pages of an uncached (aborted) request beyond its locked
        prefix."""
        pages = self.table_manager.page_lists[req.table_idx]
        handle = req.cache_handle
        self._free(pages[self._own_start(handle, pages):])
        if handle is not None:
            self.unlock(handle)

    def check_integrity(self) -> None:
        self.prefix_cache.check_integrity()
        cache_pages = self.prefix_cache.size_info.total_pages
        if len(self.free_pages) + cache_pages != self.num_pages:
            raise RuntimeError(
                "CacheManager integrity check failed: "
                f"free({len(self.free_pages)}) + cached({cache_pages}) "
                f"!= total({self.num_pages})"
            )

    def _allocate(self, needed_pages: int) -> List[int]:
        if needed_pages > len(self.free_pages):
            evicted = self.prefix_cache.evict(
                needed_pages - len(self.free_pages)
            )
            self.free_pages.extend(int(p) for p in evicted)
            assert len(self.free_pages) >= needed_pages, "eviction fell short"
        allocated = self.free_pages[:needed_pages]
        del self.free_pages[:needed_pages]
        return allocated

    def _free(self, pages) -> None:
        self.free_pages.extend(int(p) for p in pages)
