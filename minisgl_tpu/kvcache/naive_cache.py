"""No-op prefix cache (always 0 match; nothing evictable).

Parity with /root/reference/python/minisgl/kvcache/naive_cache.py:16-45.
"""

from __future__ import annotations

import numpy as np

from minisgl_tpu.kvcache.base import (
    BaseCacheHandle,
    BasePrefixCache,
    InsertResult,
    MatchResult,
    SizeInfo,
)

_EMPTY = np.empty(0, dtype=np.int32)


class _NaiveHandle(BaseCacheHandle):
    def get_matched_page_ids(self) -> np.ndarray:
        return _EMPTY


_HANDLE = _NaiveHandle(cached_len=0)


class NaivePrefixCache(BasePrefixCache):
    def __init__(self, page_size: int):
        self.page_size = page_size

    def lock_handle(self, handle: BaseCacheHandle, unlock: bool = False) -> None:
        pass

    def match_prefix(self, input_ids: np.ndarray) -> MatchResult:
        return MatchResult(_HANDLE)

    def insert_prefix(self, input_ids: np.ndarray, page_ids: np.ndarray) -> InsertResult:
        return InsertResult(0, _NaiveHandle(cached_len=0))

    def evict(self, num_pages: int) -> np.ndarray:
        if num_pages > 0:
            raise RuntimeError("NaivePrefixCache cannot evict")
        return _EMPTY

    def reset(self) -> None:
        pass

    @property
    def size_info(self) -> SizeInfo:
        return SizeInfo(0, 0)

    def check_integrity(self) -> None:
        pass
