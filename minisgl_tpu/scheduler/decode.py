"""Running-set manager for decode batches.

Parity with /root/reference/python/minisgl/scheduler/decode.py:9-39 including
the per-req (page_size - 1) slack in the in-flight token reservation.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterable, List, Optional, Set

from minisgl_tpu.core import Batch, Req


@dataclass
class DecodeManager:
    page_size: int
    # hard per-row KV bound: positions must stay below this so page-table
    # indices (width ceil(max_seq_len / page_size)) and the rope cache are
    # never exceeded by a multi-step burst's over-generated tokens
    max_seq_len: int = 1 << 30
    # steady-state burst length (config.decode_steps): reservation accounting
    # must cover the over-generation a burst can add past a row's remain_len
    decode_steps: int = 1
    running_reqs: Set[Req] = field(default_factory=set)

    def filter_reqs(self, reqs: Iterable[Req]) -> None:
        self.running_reqs = {
            req for req in self.running_reqs.union(reqs) if req.can_decode
        }

    def remove_req(self, req: Req) -> None:
        self.running_reqs.discard(req)

    def abort_req(self, uid: int) -> Optional[Req]:
        for req in self.running_reqs:
            if req.uid == uid:
                self.running_reqs.remove(req)
                return req
        return None

    @property
    def inflight_tokens(self) -> int:
        reserved = (self.page_size - 1) * len(self.running_reqs)
        # a K-step burst over-generates up to K tokens past a row's
        # remain_len (dropped at result processing but still written to KV),
        # so each row's future demand is at least one burst
        k = self.decode_steps
        return sum(max(req.remain_len, k) for req in self.running_reqs) + reserved

    def schedule_next_batch(
        self, decode_steps: int = 1, exclude: Optional[Set[Req]] = None
    ) -> Optional[Batch]:
        if not self.runnable:
            return None
        # reqs with staged speculative drafts in flight (spec_drafts set)
        # violate the decode invariant cached_len == device_len - 1; reqs
        # with a pending draft proposal are reserved for the verify phase;
        # ``exclude`` withholds rows the scheduler wants to let settle
        # (speculative hint, scheduler._hint_spec)
        reqs: List[Req] = sorted(
            (
                r
                for r in self.running_reqs
                if r.spec_drafts is None
                and r.spec_proposal is None
                and (exclude is None or r not in exclude)
            ),
            key=lambda r: r.table_idx,
        )
        if not reqs:
            return None
        # A K-step burst runs for EVERY row even when a row's remaining
        # output budget is smaller: the over-generated tokens land in pages
        # the allocator covers (lookahead + the inflight_tokens burst floor)
        # and are dropped at result processing — the same over-generate-and-
        # drop discipline overlap scheduling already applies to mid-burst
        # EOS finishes (reference scheduler.py:159). Collapsing to K=1
        # whenever ANY row neared its limit multiplied dispatch count ~4x on
        # staggered-finish workloads (round-3 BENCHLOG). Only the hard KV
        # bound collapses the burst (keeps the compiled variant set at
        # {1, K}): positions must stay under max_seq_len so the page table
        # and rope cache are never indexed out of range.
        k = decode_steps
        if k > 1 and any(r.device_len + k > self.max_seq_len for r in reqs):
            k = 1
        return Batch(reqs=reqs, phase="decode", decode_steps=k)

    @property
    def runnable(self) -> bool:
        return len(self.running_reqs) > 0
