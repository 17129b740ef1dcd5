"""Core request/batch vocabulary shared by scheduler, engine, and server.

TPU-native redesign of /root/reference/python/minisgl/core.py:15-137. Key
departures from the reference:

- ``Req.input_ids`` is a host numpy array (no torch; the device never owns
  request token history — only the paged KV and the per-slot last-token ring).
- There is no process-global mutable ``Context``: all device state (KV pool,
  token slots, RNG) lives in an explicit ``DeviceState`` pytree threaded
  through jitted step functions (see minisgl_tpu.engine.step), which is the
  XLA-friendly formulation of the reference's ``Context`` + CUDA-stream
  mutation model.
- Per-request KV placement is a ``page_ids`` list (page granularity), not a
  ``[max_req, max_seq]`` token-slot table row; the engine derives the dense
  ``[B, pages_per_seq]`` device page table per batch from these lists.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import TYPE_CHECKING, List, Literal, Optional

import numpy as np

if TYPE_CHECKING:
    from minisgl_tpu.kvcache.base import BaseCacheHandle


@dataclass
class SamplingParams:
    temperature: float = 0.0
    top_k: int = -1
    top_p: float = 1.0
    # keep candidates with prob >= min_p * max_prob (0 disables)
    min_p: float = 0.0
    ignore_eos: bool = False
    max_tokens: int = 1024
    # extra per-request finish tokens, checked alongside the model's EOS
    # set (unaffected by ignore_eos, which only disables the MODEL's EOS)
    stop_token_ids: Optional[List[int]] = None
    # return per-token logprobs: 0 = off, N>0 = sampled-token logprob plus
    # the top-N alternatives (N capped at engine/step.py LOGPROBS_K)
    logprobs: int = 0
    # 0 = unseeded (global stream). Non-zero: this request's sampling
    # stream derives only from (seed, token position) — reproducible
    # regardless of batch composition or scheduling order
    seed: int = 0

    @property
    def is_greedy(self) -> bool:
        return (self.temperature <= 0.0 or self.top_k == 1) and self.top_p == 1.0


@dataclass(eq=False)
class Req:
    """One in-flight request.

    Length bookkeeping follows the reference semantics exactly
    (core.py:28-68): ``cached_len`` tokens already have KV in the pool,
    ``device_len`` tokens will have KV after the currently-scheduled forward,
    and ``max_device_len`` bounds total growth by ``max_tokens``.
    """

    input_ids: np.ndarray  # int32 host array, grows as tokens are sampled
    table_idx: int  # slot in the engine's token-slot ring / page-list table
    cached_len: int
    output_len: int
    uid: int
    sampling_params: SamplingParams
    cache_handle: Optional["BaseCacheHandle"] = None

    def __post_init__(self) -> None:
        prompt = np.asarray(self.input_ids, dtype=np.int32)
        self.device_len = int(len(prompt))
        self.max_device_len = self.device_len + self.output_len
        # Token storage is preallocated at full capacity (prompt +
        # max_tokens, both known at admission); ``input_ids`` stays a cheap
        # O(1) view so appends never copy the history (np.append per token
        # is O(n) and dominated the host loop at bs*K appends/iteration).
        # Appends only ever write past every previously exposed view, so
        # slices handed out earlier (radix node keys, metadata builds)
        # remain valid.
        self._ids_buf = np.empty(self.max_device_len, dtype=np.int32)
        self._ids_buf[: self.device_len] = prompt
        self._num_ids = self.device_len
        self.input_ids = self._ids_buf[: self._num_ids]
        # staged speculative draft tokens (spec/lookup.py) awaiting a verify
        # step's result; non-None only between stage_drafts and settle_verify
        self.spec_drafts: Optional[np.ndarray] = None
        # drafts proposed at result-processing time (the only moment the
        # request is settled under overlap scheduling), consumed by the next
        # verify dispatch; while set, plain decode skips this request
        self.spec_proposal: Optional[np.ndarray] = None
        # prompt length at admission; output count = len(input_ids) - this.
        # (The reference infers finish from device_len, which under overlap
        # scheduling advances one dispatch ahead of processed results and
        # finishes one token early; counting appended outputs is exact.)
        self.prompt_len = self.device_len
        # copy-on-extend adoption of a mid-page prefix match (token-granular
        # radix): before this request's first prefill step the engine copies
        # boundary_rows rows of page boundary_src into the request's own
        # page at index cached_len // page_size. Set by admission
        # (scheduler/prefill.py), consumed once at dispatch.
        self.boundary_src = -1
        self.boundary_rows = 0
        assert 0 <= self.cached_len < self.device_len <= self.max_device_len

    @property
    def remain_len(self) -> int:
        return self.max_device_len - self.device_len

    @property
    def extend_len(self) -> int:
        return self.device_len - self.cached_len

    def complete_one(self) -> None:
        """Advance bookkeeping after a forward is *dispatched*: everything up
        to device_len now has KV; next decode appends one more token."""
        self.cached_len = self.device_len
        self.device_len += 1

    def complete_k(self, k: int) -> None:
        """complete_one applied k times (multi-step decode: the device loop
        ran k decode iterations inside one dispatch)."""
        self.cached_len = self.device_len + k - 1
        self.device_len += k

    def clamp_to_host(self) -> None:
        """After a mid-burst finish, discard bookkeeping for device-side
        tokens the host rejected (tokens past EOS/limit in a multi-step
        burst): lengths must not exceed what input_ids actually holds."""
        n = len(self.input_ids)
        self.device_len = min(self.device_len, n)
        self.cached_len = min(self.cached_len, n)

    def append_host(self, next_token: int) -> None:
        self._ids_buf[self._num_ids] = next_token
        self._num_ids += 1
        self.input_ids = self._ids_buf[: self._num_ids]

    def append_host_many(self, next_tokens: np.ndarray) -> None:
        """Bulk append of one multi-step burst's accepted tokens."""
        n = len(next_tokens)
        self._ids_buf[self._num_ids : self._num_ids + n] = next_tokens
        self._num_ids += n
        self.input_ids = self._ids_buf[: self._num_ids]

    def feed_tokens(self) -> np.ndarray:
        """Tokens fed to the next forward: [cached_len, device_len). For
        prefill this equals the input_ids slice; for a speculative verify
        step it additionally covers the draft tokens staged past
        ``input_ids`` (stage_drafts) — accepted tokens only ever land in
        ``input_ids`` after verification."""
        return self._ids_buf[self.cached_len : self.device_len]

    def stage_drafts(self, drafts: np.ndarray) -> None:
        """Stage speculative draft tokens for ONE verify forward: writes
        them past the accepted history (without advancing ``input_ids``)
        and claims their KV positions via ``device_len``. Requires no
        in-flight tokens (len(input_ids) == device_len)."""
        h = self._num_ids
        d = len(drafts)
        assert self.device_len == h and self.cached_len == h - 1, (
            "stage_drafts needs settled bookkeeping"
        )
        assert h + d <= self.max_device_len
        self._ids_buf[h : h + d] = drafts
        self.spec_drafts = drafts
        self.device_len = h + d

    def settle_verify(self) -> None:
        """After a verify result's accepted tokens were appended: rewind KV
        bookkeeping past the rejected drafts. KV is valid through the
        second-to-last accepted token (the last emitted token's KV is
        computed by the NEXT forward), restoring the decode invariant
        cached_len == device_len - 1."""
        self.spec_drafts = None
        self.cached_len = self._num_ids - 1
        self.device_len = self._num_ids

    @property
    def num_output_tokens(self) -> int:
        return self._num_ids - self.prompt_len

    @property
    def can_decode(self) -> bool:
        return self.remain_len > 0

    def __repr__(self) -> str:
        return (
            f"Req(uid={self.uid}, table_idx={self.table_idx}, "
            f"cached_len={self.cached_len}, device_len={self.device_len}, "
            f"max_device_len={self.max_device_len})"
        )


Phase = Literal["prefill", "decode", "verify"]


@dataclass
class BatchMetadata:
    """Host-built numpy metadata for one forward step, already padded to the
    engine's static bucket shapes. This is what crosses the host->device
    boundary every iteration (the TPU analogue of the reference's pinned-host
    staging buffers, scheduler.py:236-267)."""

    phase: Phase
    # [B_pad] slot id per batch row (padding rows -> dummy slot 0)
    slot_ids: np.ndarray
    # [T_pad] token-slot destination for each new token's KV (dummy slot 0 pads)
    out_slots: np.ndarray
    # [T_pad] absolute position of each new token
    positions: np.ndarray
    # [B_pad, PAGES_CAP] page ids backing each row's KV (dummy page 0 pads)
    page_table: np.ndarray
    # [B_pad] total KV length per row *after* this step's tokens are written
    seq_lens: np.ndarray
    # prefill only: [T_pad] token ids (decode gathers them device-side)
    input_ids: Optional[np.ndarray]
    # prefill only: [T_pad] row index each query token belongs to
    q_req_ids: Optional[np.ndarray]
    # prefill only: [B_pad] flat index of each row's last query token
    last_q_index: Optional[np.ndarray]
    # [B_pad + 1] cumulative query lens (ragged-attention row starts)
    cu_q_lens: np.ndarray
    # [B_pad] sampling tensors
    temperature: np.ndarray
    top_k: np.ndarray
    top_p: np.ndarray
    # true (unpadded) sizes
    num_reqs: int
    num_tokens: int
    # [B_pad] f32; None packs as zeros (min_p disabled)
    min_p: Optional[np.ndarray] = None
    # [B_pad] int32; None packs as zeros (unseeded)
    seed: Optional[np.ndarray] = None
    # verify phase only: [B_pad] number of staged draft tokens per row (the
    # flat sampling-gather indices ride in last_q_index, widened to
    # [B_pad * (1 + D)]; see engine/step.py verify path)
    draft_len: Optional[np.ndarray] = None


@dataclass
class Batch:
    """A scheduled set of requests plus its device-ready metadata."""

    reqs: List[Req]
    phase: Phase
    metadata: Optional[BatchMetadata] = field(default=None)
    # decode only: number of device-side decode iterations fused into this
    # dispatch (engine/step.py multi-step loop)
    decode_steps: int = 1

    @property
    def is_prefill(self) -> bool:
        return self.phase == "prefill"

    @property
    def is_decode(self) -> bool:
        return self.phase == "decode"

    @property
    def size(self) -> int:
        return len(self.reqs)
