"""Page allocator + prefix-cache owner.

Behavioral counterpart of /root/reference/python/minisgl/scheduler/cache.py
(free list, eviction-on-demand, the documented region diagram of cache_req,
and the free+cached==total integrity check), page-granular:

- the free list holds PAGE IDS (page 0 is the reserved dummy page and never
  enters circulation),
- ``allocate_paged`` appends pages to the TableManager's host page list
  instead of scattering token slots into a GPU table,
- there is no lazy_free_region: the reference defers frees to avoid CUDA
  stream use-after-free during overlap scheduling (cache.py:93-104); under
  XLA, steps are dispatch-ordered on the device queue and every batch ships
  its own page-table snapshot, so a page freed while step N is in flight can
  only be *written* by step N+1's scatter, which executes after N completes.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, List

import numpy as np

from minisgl_tpu.core import Req
from minisgl_tpu.kvcache import MatchResult, create_prefix_cache
from minisgl_tpu.kvcache.base import BaseCacheHandle
from minisgl_tpu.utils import div_ceil

if TYPE_CHECKING:
    from minisgl_tpu.scheduler.prefill import PendingReq
    from minisgl_tpu.scheduler.table import TableManager


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

    @property
    def available_size(self) -> int:  # tokens
        return (
            self.prefix_cache.size_info.evictable_size
            + len(self.free_pages) * self.page_size
        )

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
        # Region diagram (tokens; all boundaries except req.cached_len are
        # page-aligned — mirrors reference cache.py:55-79):
        #   [0, old.cached_len)            was already locked in the cache
        #   [old.cached_len, dup_len)      cached by OTHER reqs meanwhile ->
        #                                  our duplicate pages must be freed
        #   [dup_len, new.cached_len)      newly inserted (pages now owned by
        #                                  the prefix cache)
        #   [new.cached_len, end)          uncacheable tail (partial page /
        #                                  decode reservation) -> freed when
        #                                  the request finishes
        pages = self.table_manager.page_lists[req.table_idx]
        insert_ids = req.input_ids[: req.cached_len]
        old_handle = req.cache_handle
        assert old_handle is not None
        dup_len, new_handle = self.prefix_cache.insert_prefix(
            insert_ids, np.asarray(pages, dtype=np.int32)
        )
        self.unlock(old_handle)
        ps = self.page_size
        # duplicate region: tokens [old.cached_len, dup_len) were cached by
        # OTHER requests while we prefilled, so the tree kept its canonical
        # pages and ours are redundant. The reference frees them outright
        # (cache.py:74) and leaves the request's table row pointing at the
        # freed pages — a stale-KV read if they get reallocated while this
        # request still decodes. Repoint the live request at the canonical
        # pages (same token content) before freeing ours.
        dup_lo, dup_hi = old_handle.cached_len // ps, dup_len // ps
        if dup_hi > dup_lo:
            ours = pages[dup_lo:dup_hi]
            if not finished:
                canonical = new_handle.get_matched_page_ids()
                pages[dup_lo:dup_hi] = (int(p) for p in canonical[dup_lo:dup_hi])
                # same-length in-place mutation: drop the table's cached
                # numpy mirror of this slot
                self.table_manager.invalidate(req.table_idx)
            self._free(ours)
        if finished:
            # everything beyond what the radix tree owns, including the
            # decode-reservation page that may extend past cached_len (the
            # old handle's prefix stays radix-owned even when the request
            # aborted before inserting anything)
            radix_owned = max(new_handle.cached_len, old_handle.cached_len)
            self._free(pages[radix_owned // ps :])
        else:
            req.cache_handle = new_handle
            self.lock(new_handle)

    def free_req_pages(self, req: Req) -> None:
        """Free all pages of an uncached (aborted) request beyond its locked
        prefix."""
        pages = self.table_manager.page_lists[req.table_idx]
        handle = req.cache_handle
        locked = 0 if handle is None else handle.cached_len // self.page_size
        self._free(pages[locked:])
        if handle is not None:
            self.unlock(handle)

    def check_integrity(self) -> None:
        self.prefix_cache.check_integrity()
        cache_pages = self.prefix_cache.size_info.total_size // self.page_size
        if len(self.free_pages) + cache_pages != self.num_pages:
            raise RuntimeError(
                "CacheManager integrity check failed: "
                f"free({len(self.free_pages)}) + cached({cache_pages}) "
                f"!= total({self.num_pages})"
            )

    def _allocate(self, needed_pages: int) -> List[int]:
        if needed_pages > len(self.free_pages):
            evicted = self.prefix_cache.evict(
                (needed_pages - len(self.free_pages)) * self.page_size
            )
            self.free_pages.extend(int(p) for p in evicted)
            assert len(self.free_pages) >= needed_pages, "eviction fell short"
        allocated = self.free_pages[:needed_pages]
        del self.free_pages[:needed_pages]
        return allocated

    def _free(self, pages) -> None:
        self.free_pages.extend(int(p) for p in pages)
