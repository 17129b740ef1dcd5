"""Request-slot allocator + per-slot page lists.

Counterpart of /root/reference/python/minisgl/scheduler/table.py:4-21. The
reference keeps a GPU ``[max_req, max_seq]`` token-slot table plus a mirrored
token_pool; the TPU build keeps the authoritative page table on the HOST as a
python list of page ids per slot (the engine derives each batch's dense
[B, pages_cap] device array from these), and the only device-resident mirror
is the last-sampled-token ring inside DeviceState. Slot 0 is reserved as the
dummy row for batch padding (reference engine.py:89-98).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


class TableManager:
    def __init__(self, max_running_reqs: int) -> None:
        self._max_running_reqs = max_running_reqs
        # slot 0 is the dummy/padding slot; real requests use 1..max
        self._free_slots = list(range(1, max_running_reqs + 1))
        self.page_lists: List[List[int]] = [
            [] for _ in range(max_running_reqs + 1)
        ]
        # per-slot numpy mirror of page_lists, rebuilt only when a slot's
        # list object or length changes: decode steps re-ship every row's
        # page table, and list->ndarray conversion per row per step was the
        # metadata builder's hot spot. In-place SAME-LENGTH mutations (the
        # dup-region repoint in cache.py) must call invalidate().
        self._arr_cache: Dict[int, Tuple[np.ndarray, List[int]]] = {}

    @property
    def available_size(self) -> int:
        return len(self._free_slots)

    def allocate(self) -> int:
        slot = self._free_slots.pop()
        self.page_lists[slot] = []
        return slot

    def free(self, slot: int) -> None:
        assert slot != 0
        self.page_lists[slot] = []
        self._free_slots.append(slot)

    def page_array(self, slot: int) -> np.ndarray:
        """Cached int32 array view of ``page_lists[slot]``."""
        lst = self.page_lists[slot]
        hit = self._arr_cache.get(slot)
        if hit is not None and hit[1] is lst and len(hit[0]) == len(lst):
            return hit[0]
        arr = np.asarray(lst, dtype=np.int32)
        self._arr_cache[slot] = (arr, lst)
        return arr

    def invalidate(self, slot: int) -> None:
        self._arr_cache.pop(slot, None)
