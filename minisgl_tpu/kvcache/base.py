"""Prefix-cache interfaces (page-granular).

Counterpart of /root/reference/python/minisgl/kvcache/base.py:10-135. The
reference tracks token-slot tensors (page_size defaults to 1 there); the TPU
build is page-granular end to end: values are numpy arrays of PAGE IDS, and
all public sizes stay in TOKEN units so the scheduler's budget math matches
the reference exactly.

The KV pool itself has no class here — it is a pair of jnp arrays owned by the
engine's DeviceState (ops/kv.py documents the layout); these interfaces cover
only the host-side prefix-reuse brain.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import NamedTuple

import numpy as np


@dataclass(frozen=True)
class BaseCacheHandle(ABC):
    # token count of the cached prefix this handle pins (token-granular)
    cached_len: int

    @abstractmethod
    def get_matched_page_ids(self) -> np.ndarray:
        """Page ids backing the matched prefix ([ceil(cached_len /
        page_size)]); a partial last page is READ-ONLY for the adopter
        (copy-on-extend before writing)."""


class SizeInfo(NamedTuple):
    evictable_size: int  # tokens
    protected_size: int  # tokens
    # OWNED pages (a mid-split boundary page shared by two nodes counts
    # once, at the parent) — the allocator's capacity unit; token counts no
    # longer imply page counts under token-granular matching
    evictable_pages: int = 0
    protected_pages: int = 0

    @property
    def total_size(self) -> int:
        return self.evictable_size + self.protected_size

    @property
    def total_pages(self) -> int:
        return self.evictable_pages + self.protected_pages


class InsertResult(NamedTuple):
    # token length already present in the cache before this insertion — the
    # caller owns duplicate pages for that region and must free them
    cached_len: int
    handle: BaseCacheHandle


class MatchResult(NamedTuple):
    handle: BaseCacheHandle


class BasePrefixCache(ABC):
    @abstractmethod
    def lock_handle(self, handle: BaseCacheHandle, unlock: bool = False) -> None:
        """(Un)pin a handle's path; locked nodes cannot be evicted. A match's
        page ids are only safe to use while locked."""

    @abstractmethod
    def match_prefix(self, input_ids: np.ndarray) -> MatchResult:
        """Longest cached prefix of input_ids (TOKEN-granular — it may end
        mid-page; the boundary page is then read-only for the adopter);
        does not modify the cache."""

    @abstractmethod
    def insert_prefix(self, input_ids: np.ndarray, page_ids: np.ndarray) -> InsertResult:
        """Insert a prefix backed by page_ids ([>= ceil(len/page_size)])."""

    @abstractmethod
    def evict(self, num_pages: int) -> np.ndarray:
        """Evict unlocked entries until >= num_pages owned pages are freed;
        returns the freed page ids."""

    @abstractmethod
    def reset(self) -> None: ...

    @property
    @abstractmethod
    def size_info(self) -> SizeInfo: ...

    @abstractmethod
    def check_integrity(self) -> None: ...
