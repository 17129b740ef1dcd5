"""Radix-tree prefix cache over token-id pages.

Behavioral parity with /root/reference/python/minisgl/kvcache/radix_cache.py
(node split, page-aligned matching, LRU eviction via a timestamp min-heap of
ref_count==0 leaves, lock/unlock walking to the root adjusting
evictable/protected sizes) — re-keyed for the TPU build's page-granular
bookkeeping: node keys are token-id arrays whose length is a multiple of
page_size, node values are PAGE-ID arrays of length len(key)//page_size.
"""

from __future__ import annotations

import heapq
import time
from dataclasses import dataclass
from typing import Any, Dict, List, Tuple

import numpy as np

from minisgl_tpu.kvcache.base import (
    BaseCacheHandle,
    BasePrefixCache,
    InsertResult,
    MatchResult,
    SizeInfo,
)
from minisgl_tpu.utils import align_down
from minisgl_tpu.utils.compare import first_mismatch

_EMPTY = np.empty(0, dtype=np.int32)


class RadixTreeNode:
    __slots__ = (
        "page_size",
        "children",
        "_parent",
        "ref_count",
        "timestamp",
        "_key",
        "_pages",
    )

    def __init__(self, page_size: int, tic: int | None = None) -> None:
        self.page_size = page_size
        self.children: Dict[Any, RadixTreeNode] = {}
        self._parent: RadixTreeNode | None = None
        self.ref_count = 0
        self.timestamp = tic if tic is not None else time.monotonic_ns()
        self._key: np.ndarray = _EMPTY  # token ids, multiple of page_size
        self._pages: np.ndarray = _EMPTY  # page ids, len(key) // page_size

    def _child_key(self, key: np.ndarray) -> Any:
        if self.page_size == 1:
            return int(key[0])
        # raw little-endian bytes of the first page's token ids: hashable,
        # content-equal like the tuple form but built in one C call (the
        # per-token tuple genexpr was ~8 ms per radix insert at page 128)
        return key[: self.page_size].tobytes()

    def set_key_value(self, key: np.ndarray, pages: np.ndarray) -> None:
        assert len(key) == len(pages) * self.page_size
        self._key = key
        self._pages = pages

    def set_parent(self, parent: "RadixTreeNode") -> None:
        self._parent = parent
        parent.children[self._child_key(self._key)] = self

    @property
    def length(self) -> int:  # tokens
        return len(self._key)

    @property
    def pages(self) -> np.ndarray:
        return self._pages

    @property
    def parent(self) -> "RadixTreeNode":
        assert self._parent is not None
        return self._parent

    def is_root(self) -> bool:
        return self._parent is None

    def is_leaf(self) -> bool:
        return len(self.children) == 0

    def get_match_len(self, input_ids: np.ndarray) -> int:
        return first_mismatch(self._key, input_ids)

    def split_at(self, pos: int) -> "RadixTreeNode":
        """Split so the first `pos` tokens become a new parent node; `pos`
        must be page-aligned and strictly inside the node."""
        assert 0 < pos < self.length and pos % self.page_size == 0
        parent = self.parent
        new_node = RadixTreeNode(self.page_size, self.timestamp)
        p = pos // self.page_size
        new_node.set_key_value(self._key[:pos], self._pages[:p])
        new_node.set_parent(parent)
        new_node.ref_count = self.ref_count
        self.set_key_value(self._key[pos:], self._pages[p:])
        self.set_parent(new_node)
        return new_node

    def __lt__(self, other: "RadixTreeNode") -> bool:
        return self.timestamp < other.timestamp


@dataclass(frozen=True)
class RadixCacheHandle(BaseCacheHandle):
    node: RadixTreeNode

    def get_matched_page_ids(self) -> np.ndarray:
        node = self.node
        chunks: List[np.ndarray] = []
        while not node.is_root():
            chunks.append(node.pages)
            node = node.parent
        chunks.reverse()
        if not chunks:
            return _EMPTY
        return np.concatenate(chunks)


class RadixPrefixCache(BasePrefixCache):
    def __init__(self, page_size: int):
        self.page_size = page_size
        self.evictable_size = 0  # tokens
        self.protected_size = 0  # tokens
        self.root_node = RadixTreeNode(page_size)
        self.root_node.ref_count = 1  # root is never evictable

    def lock_handle(self, handle: BaseCacheHandle, unlock: bool = False) -> None:
        assert isinstance(handle, RadixCacheHandle)
        node = handle.node
        if unlock:
            while not node.is_root():
                node.ref_count -= 1
                assert node.ref_count >= 0
                if node.ref_count == 0:
                    self.evictable_size += node.length
                    self.protected_size -= node.length
                node = node.parent
        else:
            while not node.is_root():
                if node.ref_count == 0:
                    self.evictable_size -= node.length
                    self.protected_size += node.length
                node.ref_count += 1
                node = node.parent

    def match_prefix(self, input_ids: np.ndarray) -> MatchResult:
        node, prefix_len = self._tree_walk(np.asarray(input_ids, dtype=np.int32))
        return MatchResult(RadixCacheHandle(prefix_len, node))

    def insert_prefix(self, input_ids: np.ndarray, page_ids: np.ndarray) -> InsertResult:
        input_ids = np.asarray(input_ids, dtype=np.int32)
        insert_len = align_down(len(input_ids), self.page_size)
        input_ids = input_ids[:insert_len]
        pages = np.asarray(page_ids, dtype=np.int32)[: insert_len // self.page_size]
        node, prefix_len = self._tree_walk(input_ids)
        if prefix_len != insert_len:  # prefix_len < insert_len
            new_node = RadixTreeNode(self.page_size)
            p = prefix_len // self.page_size
            new_node.set_key_value(input_ids[prefix_len:], pages[p:].copy())
            new_node.set_parent(node)
            self.evictable_size += new_node.length
            node = new_node
        return InsertResult(prefix_len, RadixCacheHandle(insert_len, node))

    def evict(self, size: int) -> np.ndarray:
        if size == 0:
            return _EMPTY
        assert size <= self.evictable_size, (
            f"cannot evict {size}, only {self.evictable_size} evictable"
        )
        leaves = self._collect_evictable_leaves()
        heapq.heapify(leaves)
        evicted_pages: List[np.ndarray] = []
        evicted = 0
        while evicted < size:
            assert leaves, f"need {size} tokens, only evicted {evicted}"
            node = heapq.heappop(leaves)
            assert node.ref_count == 0 and node.is_leaf() and not node.is_root()
            evicted += node.length
            evicted_pages.append(node.pages)
            self.evictable_size -= node.length
            parent = node.parent
            del parent.children[parent._child_key(node._key)]
            if parent.is_leaf() and parent.ref_count == 0 and not parent.is_root():
                heapq.heappush(leaves, parent)
        return np.concatenate(evicted_pages)

    def reset(self) -> None:
        self.evictable_size = 0
        self.protected_size = 0
        self.root_node = RadixTreeNode(self.page_size)
        self.root_node.ref_count = 1

    @property
    def size_info(self) -> SizeInfo:
        return SizeInfo(self.evictable_size, self.protected_size)

    def check_integrity(self) -> None:
        """Recount sizes from the tree and verify the incremental counters."""
        evictable = protected = 0
        stack = list(self.root_node.children.values())
        while stack:
            node = stack.pop()
            if node.ref_count == 0:
                evictable += node.length
            else:
                protected += node.length
            stack.extend(node.children.values())
        if evictable != self.evictable_size or protected != self.protected_size:
            raise RuntimeError(
                f"radix integrity: counted (e={evictable}, p={protected}) != "
                f"tracked (e={self.evictable_size}, p={self.protected_size})"
            )

    def _collect_evictable_leaves(self) -> List[RadixTreeNode]:
        leaves: List[RadixTreeNode] = []
        stack = [self.root_node]
        while stack:
            node = stack.pop()
            if node.is_leaf():
                if node.ref_count == 0 and not node.is_root():
                    leaves.append(node)
            else:
                stack.extend(node.children.values())
        return leaves

    def _tree_walk(self, input_ids: np.ndarray) -> Tuple[RadixTreeNode, int]:
        prefix_len = 0
        total = len(input_ids)
        node = self.root_node
        tic = time.monotonic_ns()
        while prefix_len + self.page_size <= total:
            rest = input_ids[prefix_len:]
            child = node.children.get(node._child_key(rest)) if len(rest) >= self.page_size else None
            if child is None:
                return node, prefix_len
            node = child
            match_len = align_down(node.get_match_len(rest), self.page_size)
            prefix_len += match_len
            if match_len != node.length:
                if match_len == 0:
                    # same first page key but diverges within the first page
                    return node.parent, prefix_len
                node = node.split_at(match_len)
                return node, prefix_len
            node.timestamp = tic
        return node, prefix_len
