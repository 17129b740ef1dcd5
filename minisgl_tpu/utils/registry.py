"""Generic name -> factory registry.

Counterpart of /root/reference/python/minisgl/utils/registry.py:6-37; makes
attention backends, cache managers, and MoE backends pluggable by CLI name.
"""

from __future__ import annotations

from typing import Callable, Dict, Generic, List, TypeVar

T = TypeVar("T")


class Registry(Generic[T]):
    def __init__(self, kind: str):
        self.kind = kind
        self._entries: Dict[str, T] = {}

    def register(self, name: str, value: T | None = None):
        if value is not None:
            self._entries[name] = value
            return value

        def deco(v: T) -> T:
            self._entries[name] = v
            return v

        return deco

    def get(self, name: str) -> T:
        if name not in self._entries:
            raise KeyError(
                f"unknown {self.kind} '{name}'; supported: {sorted(self._entries)}"
            )
        return self._entries[name]

    def supported_names(self) -> List[str]:
        return sorted(self._entries)

    def __contains__(self, name: str) -> bool:
        return name in self._entries
