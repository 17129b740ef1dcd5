"""Prefill admission control + chunked prefill.

Behavioral parity with /root/reference/python/minisgl/scheduler/prefill.py:
budget loop over pending requests (radix match -> lock -> double-check
available size -> slot allocation -> chunk split when the remaining prompt
exceeds the token budget), with the reserved-size accounting that protects
in-flight decode demand (prefill.py:131-136 + decode.py:27-30). Chunked
requests re-enter the pending queue ahead of everything else (Sarathi-style
chunked prefill, docs/features.md:29-31).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import TYPE_CHECKING, List, Optional, Tuple

import numpy as np

from minisgl_tpu.core import Batch, Req, SamplingParams
from minisgl_tpu.utils import init_logger

if TYPE_CHECKING:
    from minisgl_tpu.kvcache.base import BaseCacheHandle
    from minisgl_tpu.scheduler.cache import CacheManager
    from minisgl_tpu.scheduler.decode import DecodeManager
    from minisgl_tpu.scheduler.table import TableManager

logger = init_logger(__name__)


@dataclass
class PendingReq:
    uid: int
    input_ids: np.ndarray
    sampling_params: SamplingParams
    chunked_req: Optional["ChunkedReq"] = None

    @property
    def input_len(self) -> int:
        return len(self.input_ids)

    @property
    def output_len(self) -> int:
        return self.sampling_params.max_tokens


class ChunkedReq(Req):
    """A non-final chunk of a long prompt: never sampled, never decoded."""

    def append_host(self, next_token: int) -> None:
        raise NotImplementedError("ChunkedReq should not be sampled")

    @property
    def can_decode(self) -> bool:
        return False


@dataclass
class PrefillAdder:
    token_budget: int
    reserved_size: int
    cache_manager: "CacheManager"
    table_manager: "TableManager"
    # query tokens are charged in q_align units so the padded batch the
    # engine builds (Pallas block alignment, attention/pallas_backend.py)
    # still fits the largest token bucket
    q_align: int = 1
    metrics: object = None  # SchedulerMetrics (optional)

    def _try_allocate_one(
        self, req: PendingReq
    ) -> Optional[Tuple["BaseCacheHandle", int]]:
        if self.table_manager.available_size == 0:
            return None

        handle = self.cache_manager.match_req(req).handle
        cached_len = handle.cached_len
        extend_len = req.input_len - cached_len
        estimated_len = extend_len + req.output_len

        if estimated_len + self.reserved_size > self.cache_manager.available_size:
            return None
        self.cache_manager.lock(handle)
        # locking may not change availability, but re-check after it does
        # (matches reference prefill.py:52-55 double-check)
        if estimated_len + self.reserved_size > self.cache_manager.available_size:
            self.cache_manager.unlock(handle)
            return None

        table_idx = self.table_manager.allocate()
        if self.metrics is not None:
            # north-star radix accounting: counted once per admission
            self.metrics.count_prefill_admission(cached_len, extend_len)
        if cached_len > 0:
            # adopt the matched pages (shared with the radix tree; safe while
            # the handle stays locked)
            self.table_manager.page_lists[table_idx] = [
                int(p) for p in handle.get_matched_page_ids()
            ]
        return handle, table_idx

    def _add_one_req(
        self,
        pending_req: PendingReq,
        cache_handle: "BaseCacheHandle",
        table_idx: int,
        cached_len: int,
    ) -> Req:
        remain_len = pending_req.input_len - cached_len
        chunk_size = min(self.token_budget, remain_len)
        is_chunked = chunk_size < remain_len
        cls = ChunkedReq if is_chunked else Req
        aligned = -(-chunk_size // self.q_align) * self.q_align
        self.token_budget -= aligned
        self.reserved_size += remain_len + pending_req.output_len
        return cls(
            input_ids=pending_req.input_ids[: cached_len + chunk_size],
            table_idx=table_idx,
            cached_len=cached_len,
            output_len=pending_req.output_len,
            uid=pending_req.uid,
            cache_handle=cache_handle,
            sampling_params=pending_req.sampling_params,
        )

    def try_add_one(self, pending_req: PendingReq) -> Optional[Req]:
        if self.token_budget <= 0:
            return None

        if (chunked_req := pending_req.chunked_req) is not None:
            return self._add_one_req(
                pending_req,
                cache_handle=chunked_req.cache_handle,
                table_idx=chunked_req.table_idx,
                cached_len=chunked_req.cached_len,
            )

        if resource := self._try_allocate_one(pending_req):
            cache_handle, table_idx = resource
            return self._add_one_req(
                pending_req,
                cache_handle=cache_handle,
                table_idx=table_idx,
                cached_len=cache_handle.cached_len,
            )
        return None


@dataclass
class PrefillManager:
    cache_manager: "CacheManager"
    table_manager: "TableManager"
    decode_manager: "DecodeManager"
    pending_list: List[PendingReq] = field(default_factory=list)

    def add_one_req(self, uid: int, input_ids: np.ndarray, params: SamplingParams) -> None:
        self.pending_list.append(
            PendingReq(uid, np.asarray(input_ids, dtype=np.int32), params)
        )

    def schedule_next_batch(
        self, prefill_budget: int, q_align: int = 1, metrics=None
    ) -> Optional[Batch]:
        if not self.pending_list:
            return None
        adder = PrefillAdder(
            token_budget=prefill_budget,
            reserved_size=self.decode_manager.inflight_tokens,
            cache_manager=self.cache_manager,
            table_manager=self.table_manager,
            q_align=q_align,
            metrics=metrics,
        )
        reqs: List[Req] = []
        chunked_list: List[PendingReq] = []
        for pending_req in self.pending_list:
            if req := adder.try_add_one(pending_req):
                pending_req.chunked_req = None
                if isinstance(req, ChunkedReq):
                    pending_req.chunked_req = req
                    chunked_list.append(pending_req)
                reqs.append(req)
            else:
                break  # in-order admission (FCFS)
        if not reqs:
            return None
        self.pending_list = chunked_list + self.pending_list[len(reqs):]
        return Batch(reqs=reqs, phase="prefill")

    def abort_req(self, uid: int) -> Optional[Req]:
        for i, req in enumerate(self.pending_list):
            if req.uid == uid:
                self.pending_list.pop(i)
                return req.chunked_req
        return None

    @property
    def runnable(self) -> bool:
        return len(self.pending_list) > 0
