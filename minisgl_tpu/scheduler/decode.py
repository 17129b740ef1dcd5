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
        return sum(req.remain_len for req in self.running_reqs) + reserved

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
        # a K-step burst needs K tokens of budget on every row; otherwise
        # fall back to single-step (keeps the compiled variant set at {1, K})
        k = decode_steps
        if k > 1 and any(r.remain_len < k for r in reqs):
            k = 1
        return Batch(reqs=reqs, phase="decode", decode_steps=k)

    @property
    def runnable(self) -> bool:
        return len(self.running_reqs) > 0
