"""Bucket selection edge cases in the host batch builder (regression: a
prefill batch of 24 rows with max_running_req=32 must find a row bucket)."""

import numpy as np
import pytest

from minisgl_tpu.core import Batch, Req, SamplingParams
from minisgl_tpu.engine.batch_builder import build_batch_metadata


def _req(i, n_tokens, page_size):
    r = Req(
        input_ids=np.arange(n_tokens, dtype=np.int32),
        table_idx=i,
        cached_len=0,
        output_len=4,
        uid=i,
        sampling_params=SamplingParams(max_tokens=4),
    )
    return r


def _build(B, max_running, n_tokens=5, page_size=4, q_align=1):
    reqs = [_req(i, n_tokens, page_size) for i in range(B)]
    pages_per = -(-(n_tokens + 4) // page_size)
    page_lists = [
        list(range(1 + i * pages_per, 1 + (i + 1) * pages_per))
        for i in range(max_running)
    ]
    batch = Batch(reqs=reqs, phase="prefill")
    return build_batch_metadata(
        batch,
        page_lists,
        page_size,
        bs_buckets=[1, 4, 16, max_running],
        token_buckets=[128, 256, 8192],
        pages_cap=16,
        q_align=q_align,
    )


@pytest.mark.parametrize("B,max_running", [(1, 8), (5, 8), (24, 32), (17, 17), (64, 64), (200, 256)])
def test_prefill_row_bucket_always_found(B, max_running):
    m = _build(B, max_running)
    assert len(m.seq_lens) >= B
    assert m.num_reqs == B


def test_q_align_pads_segments():
    m = _build(3, 8, n_tokens=5, q_align=64)
    assert m.num_tokens == 3 * 64
    # each segment starts at a 64-aligned offset
    assert all(int(c) % 64 == 0 for c in m.cu_q_lens)
    # pad rows are marked -1
    assert (m.q_req_ids[5:64] == -1).all()
