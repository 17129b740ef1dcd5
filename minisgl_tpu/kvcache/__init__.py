"""Prefix cache factory (counterpart of reference kvcache/__init__.py:24-58)."""

from __future__ import annotations

from typing import Callable

from minisgl_tpu.kvcache.base import (
    BaseCacheHandle,
    BasePrefixCache,
    InsertResult,
    MatchResult,
    SizeInfo,
)
from minisgl_tpu.kvcache.naive_cache import NaivePrefixCache
from minisgl_tpu.kvcache.radix_cache import RadixPrefixCache
from minisgl_tpu.utils import Registry

SUPPORTED_CACHE_MANAGER: Registry[Callable[[int], BasePrefixCache]] = Registry(
    "prefix cache"
)
SUPPORTED_CACHE_MANAGER.register("radix", RadixPrefixCache)
SUPPORTED_CACHE_MANAGER.register("naive", NaivePrefixCache)


def create_prefix_cache(type: str, page_size: int) -> BasePrefixCache:
    return SUPPORTED_CACHE_MANAGER.get(type)(page_size)


__all__ = [
    "BaseCacheHandle",
    "BasePrefixCache",
    "InsertResult",
    "MatchResult",
    "NaivePrefixCache",
    "RadixPrefixCache",
    "SizeInfo",
    "SUPPORTED_CACHE_MANAGER",
    "create_prefix_cache",
]
