"""Prefill admission + chunking: one budgeted FCFS loop.

Same admission CONTRACT as the reference scheduler
(/root/reference/python/minisgl/scheduler/prefill.py: FCFS order, radix
match -> lock -> capacity double-check -> slot allocation, chunk split when
the remaining prompt exceeds the token budget, reserved-size accounting
protecting in-flight decode demand, Sarathi-style chunk re-entry at the
queue head) — restructured as a single budgeted loop owned by the manager
rather than the reference's adder/manager split, and extended with
TOKEN-granular prefix adoption: a match may end mid-page, in which case the
matched boundary page's rows are copied into the request's own fresh page
before its first prefill step (copy-on-extend; CacheManager.adopt_plan).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import TYPE_CHECKING, List, Optional

import numpy as np

from minisgl_tpu.core import Batch, Req, SamplingParams
from minisgl_tpu.utils import init_logger

if TYPE_CHECKING:
    from minisgl_tpu.scheduler.cache import CacheManager
    from minisgl_tpu.scheduler.decode import DecodeManager
    from minisgl_tpu.scheduler.table import TableManager

logger = init_logger(__name__)

# a partial-page prefix shorter than this is recomputed rather than adopted:
# the copy-on-extend dispatch isn't worth a handful of cached tokens
MIN_BOUNDARY_ADOPT = 16


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
        """Admit pending requests in FCFS order until the token budget or a
        capacity limit stops the scan (head-of-line blocking is the
        reference policy: a request that doesn't fit parks the queue)."""
        if not self.pending_list:
            return None
        budget = prefill_budget
        # in-flight decode demand that admission must not starve
        reserved = self.decode_manager.inflight_tokens
        reqs: List[Req] = []
        chunked: List[PendingReq] = []
        for pending in self.pending_list:
            if budget <= 0:
                break
            req = self._admit_one(pending, budget, reserved, metrics)
            if req is None:
                break  # FCFS: the head request parks the queue
            # budget is charged in q_align units so the padded batch the
            # engine builds (Pallas block alignment) still fits the largest
            # token bucket; reserved grows by the admitted request's full
            # future demand
            budget -= -(-req.extend_len // q_align) * q_align
            reserved += self._demand(pending, req.cached_len)
            pending.chunked_req = req if isinstance(req, ChunkedReq) else None
            if pending.chunked_req is not None:
                chunked.append(pending)
            reqs.append(req)
        if not reqs:
            return None
        # chunk continuations re-enter at the head (Sarathi chunked prefill)
        self.pending_list = chunked + self.pending_list[len(reqs):]
        return Batch(reqs=reqs, phase="prefill")

    def _demand(self, pending: PendingReq, cached_len: int) -> int:
        """Worst-case token-slot demand an admission adds to the pool:
        uncached prompt + full output budget, plus the slack the allocator
        can actually consume — page rounding (ps - 1), the K-burst
        over-generation lookahead (allocate_paged covers decode_steps - 1
        extra positions), and the copy-on-extend boundary page's rows below
        cached_len (they live in the request's OWN fresh page). Matching
        DecodeManager.inflight_tokens' discipline for running requests;
        under-charging here over-admits and strands requests that cannot
        allocate (pool near-full under token-granular radix retention)."""
        ps = self.cache_manager.page_size
        return (
            pending.input_len - cached_len
            + pending.output_len
            + cached_len % ps
            + (ps - 1)
            + (self.decode_manager.decode_steps - 1)
        )

    def _admit_one(
        self, pending: PendingReq, budget: int, reserved: int, metrics
    ) -> Optional[Req]:
        """One admission attempt: continuation chunks keep their resources;
        new requests run match -> lock -> capacity check -> slot + adoption."""
        cm = self.cache_manager
        if (prev := pending.chunked_req) is not None:
            # continuation of a chunked prompt: resources already held
            return self._make_req(
                pending, budget,
                cache_handle=prev.cache_handle,
                table_idx=prev.table_idx,
                cached_len=prev.cached_len,
            )

        if self.table_manager.available_size == 0:
            return None
        handle = cm.match_req(pending).handle
        cached_len = handle.cached_len
        if (
            cached_len % cm.page_size != 0
            and cached_len % cm.page_size < MIN_BOUNDARY_ADOPT
        ):
            # not worth a copy-on-extend dispatch: recompute the partial
            # page (whole matched pages are still adopted)
            cached_len -= cached_len % cm.page_size
        demand = self._demand(pending, cached_len)
        if demand + reserved > cm.available_size:
            return None
        cm.lock(handle)
        # locking may evict-protect pages; re-check capacity after it does
        # (the reference's double-check, prefill.py:52-55)
        if demand + reserved > cm.available_size:
            cm.unlock(handle)
            return None

        table_idx = self.table_manager.allocate()
        if metrics is not None:
            # north-star radix accounting: counted once per admission
            metrics.count_prefill_admission(
                cached_len, pending.input_len - cached_len
            )
        boundary_src = boundary_rows = 0
        if cached_len > 0:
            plan = cm.adopt_plan(handle)
            if cached_len % cm.page_size == 0:
                # partial page skipped above: adopt whole pages only
                self.table_manager.page_lists[table_idx] = plan.whole_pages
            else:
                self.table_manager.page_lists[table_idx] = plan.whole_pages
                boundary_src = plan.boundary_src
                boundary_rows = plan.boundary_rows
        req = self._make_req(
            pending, budget,
            cache_handle=handle,
            table_idx=table_idx,
            cached_len=cached_len,
        )
        if boundary_rows:
            req.boundary_src = boundary_src
            req.boundary_rows = boundary_rows
        return req

    def _make_req(
        self, pending: PendingReq, budget: int, *,
        cache_handle, table_idx: int, cached_len: int,
    ) -> Req:
        remain = pending.input_len - cached_len
        chunk = min(budget, remain)
        cls = ChunkedReq if chunk < remain else Req
        return cls(
            input_ids=pending.input_ids[: cached_len + chunk],
            table_idx=table_idx,
            cached_len=cached_len,
            output_len=pending.output_len,
            uid=pending.uid,
            cache_handle=cache_handle,
            sampling_params=pending.sampling_params,
        )

    def abort_req(self, uid: int) -> Optional[Req]:
        for i, req in enumerate(self.pending_list):
            if req.uid == uid:
                self.pending_list.pop(i)
                return req.chunked_req
        return None

    @property
    def runnable(self) -> bool:
        return len(self.pending_list) > 0
