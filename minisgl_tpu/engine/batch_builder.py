"""Host-side batch metadata construction + bucket padding.

Counterpart of the reference's host index builders
(/root/reference/python/minisgl/scheduler/scheduler.py:236-267
_make_positions/_make_input_tuple/_make_write_tuple) plus the CUDA-graph
pad_batch (engine/graph.py:160-166): one pass over the scheduled requests
produces every padded numpy array the jitted step consumes. Padding targets
static bucket shapes so XLA compiles each (phase, B, T, pages) combination
exactly once.

Padding conventions (reference engine.py:89-98 dummy req/page trick):
- batch rows -> slot 0 (dummy), seq_len 1, page row all-zero (dummy page 0)
- query tokens -> out_slot 0 (scatter into the garbage page), position 0,
  q_req_id pointing at the last (padded) row when one exists
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from minisgl_tpu.core import Batch, BatchMetadata, Req
from minisgl_tpu.utils import next_power_of_2


def pick_bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"size {n} exceeds largest bucket {buckets[-1]}")


def pages_bucket(n: int, cap: int, floor: int = 8) -> int:
    return min(cap, max(floor, next_power_of_2(n)))


# prefill batch-row buckets: the row count only sizes small metadata arrays
# (and skipped kernel programs), so a coarse ladder keeps the number of
# compiled (B_pad, T_pad) prefill variants tiny
PREFILL_BS_BUCKETS = (4, 16, 64, 256)


def build_batch_metadata(
    batch: Batch,
    page_lists: List[List[int]],
    page_size: int,
    bs_buckets: Sequence[int],
    token_buckets: Sequence[int],
    pages_cap: int,
    q_align: int = 1,
    fixed_pages: bool = False,
    spec_cols: int = 0,
) -> BatchMetadata:
    # q_align > 1 pads every request query segment to that multiple so the
    # Pallas kernel block index maps stay expressible
    # (attention/pallas_backend.py QUERY_ALIGN)
    reqs = batch.reqs
    B = len(reqs)

    # accept a TableManager (cached per-slot numpy page arrays — the fast
    # path the scheduler uses every step) or a plain list-of-lists
    if hasattr(page_lists, "page_array"):
        table = page_lists
        page_lists = table.page_lists
        get_page_arr = table.page_array
    else:
        _pl = page_lists

        def get_page_arr(slot: int) -> np.ndarray:
            return np.asarray(_pl[slot], dtype=np.int32)

    def aligned(n: int) -> int:
        return -(-n // q_align) * q_align

    if batch.is_decode:
        T = B
        B_pad = pick_bucket(B, bs_buckets)
        T_pad = B_pad
    else:
        T = sum(aligned(r.extend_len) for r in reqs)
        cap = max(len(page_lists), B)  # max_running_req bounds batch rows
        row_buckets = [b for b in PREFILL_BS_BUCKETS if b < cap] + [cap]
        B_pad = pick_bucket(B, row_buckets)
        T_pad = pick_bucket(T, token_buckets)

    if fixed_pages:
        # one executable per (phase, B_pad, T_pad): the page-table width is
        # pinned to the (pow2-padded) cap — the Pallas kernels scan only to
        # each row's kv bound, so width costs metadata bytes, not compute
        # (the role CUDA graphs' static max-shape buffers play in the
        # reference, engine/graph.py:20-46)
        PB = next_power_of_2(pages_cap)
    else:
        max_pages = max((len(page_lists[r.table_idx]) for r in reqs), default=1)
        PB = pages_bucket(max_pages, pages_cap)

    slot_ids = np.zeros(B_pad, np.int32)
    seq_lens = np.ones(B_pad, np.int32)
    page_table = np.zeros((B_pad, PB), np.int32)
    out_slots = np.zeros(T_pad, np.int32)
    positions = np.zeros(T_pad, np.int32)
    # -1 marks padding query rows: the Pallas kernel masks them out and the
    # XLA backend gathers simply wrap to the last row (garbage rows that no
    # consumer reads)
    q_req_ids = np.full(T_pad, -1, np.int32)
    last_q_index = np.zeros(B_pad, np.int32)
    cu_q_lens = np.zeros(B_pad + 1, np.int32)
    temperature = np.zeros(B_pad, np.float32)
    top_k = np.full(B_pad, -1, np.int32)
    top_p = np.ones(B_pad, np.float32)
    min_p = np.zeros(B_pad, np.float32)
    seed = np.zeros(B_pad, np.int32)
    input_ids = np.zeros(T_pad, np.int32) if not batch.is_decode else None
    # verify phase: [B_pad, C] flat sampling-gather indices (every fed
    # token's logit is needed for draft acceptance) + per-row draft count
    is_verify = batch.phase == "verify"
    if is_verify:
        assert spec_cols > 0
        verify_gather = np.zeros((B_pad, spec_cols), np.int32)
        draft_len = np.zeros(B_pad, np.int32)
    else:
        draft_len = None

    if batch.is_decode:
        # fully vectorized: one query token per row (ext == 1 by the
        # complete_k bookkeeping), so positions/out-slots derive from the
        # assembled page table in one gather — this runs every iteration
        # at bs rows and was the scheduler's hot spot as a python loop
        for i, req in enumerate(reqs):
            arr = get_page_arr(req.table_idx)
            page_table[i, : len(arr)] = arr
            sp = req.sampling_params
            temperature[i] = sp.temperature
            top_k[i] = sp.top_k
            top_p[i] = sp.top_p
            min_p[i] = sp.min_p
            seed[i] = sp.seed
        slot_ids[:B] = np.fromiter(
            (r.table_idx for r in reqs), np.int32, count=B
        )
        device_lens = np.fromiter(
            (r.device_len for r in reqs), np.int32, count=B
        )
        seq_lens[:B] = device_lens
        pos = device_lens - 1  # == cached_len: decode extends by one
        assert all(r.cached_len == r.device_len - 1 for r in reqs)
        rows = np.arange(B, dtype=np.int32)
        out_slots[:B] = (
            page_table[rows, pos // page_size] * page_size + pos % page_size
        )
        positions[:B] = pos
        q_req_ids[:B] = rows
        last_q_index[:B] = rows
        cu_q_lens[1 : B + 1] = rows + 1
        offset = B
    else:
        offset = 0
        for i, req in enumerate(reqs):
            slot_ids[i] = req.table_idx
            seq_lens[i] = req.device_len
            sp = req.sampling_params
            temperature[i] = sp.temperature
            top_k[i] = sp.top_k
            top_p[i] = sp.top_p
            min_p[i] = sp.min_p
            seed[i] = sp.seed

            ext = req.extend_len
            pos = np.arange(req.cached_len, req.device_len, dtype=np.int32)
            page_arr = get_page_arr(req.table_idx)
            page_table[i, : len(page_arr)] = page_arr
            slots = page_arr[pos // page_size] * page_size + pos % page_size
            positions[offset : offset + ext] = pos
            out_slots[offset : offset + ext] = slots
            q_req_ids[offset : offset + ext] = i
            # feed_tokens == the input_ids slice for prefill; for verify it
            # additionally covers the staged draft tokens (core.py)
            input_ids[offset : offset + ext] = req.feed_tokens()
            last_q_index[i] = offset + ext - 1
            if is_verify:
                verify_gather[i] = offset + np.minimum(
                    np.arange(spec_cols, dtype=np.int32), ext - 1
                )
                draft_len[i] = ext - 1
            offset += aligned(ext)
            cu_q_lens[i + 1] = offset

    assert offset == T, (offset, T)
    cu_q_lens[B + 1 :] = offset
    # padded batch rows gather their "last token" from flat index 0 — their
    # logits are discarded anyway
    if is_verify:
        # the LM-head gather widens to every fed position of every row
        last_q_index = verify_gather.reshape(-1)

    return BatchMetadata(
        phase=batch.phase,
        slot_ids=slot_ids,
        out_slots=out_slots,
        positions=positions,
        page_table=page_table,
        seq_lens=seq_lens,
        input_ids=input_ids,
        q_req_ids=q_req_ids,
        last_q_index=last_q_index,
        cu_q_lens=cu_q_lens,
        temperature=temperature,
        top_k=top_k,
        top_p=top_p,
        min_p=min_p,
        seed=seed,
        num_reqs=B,
        num_tokens=T,
        draft_len=draft_len,
    )


def all_greedy(batch: Batch) -> bool:
    return all(r.sampling_params.is_greedy for r in batch.reqs)
