"""Packed step-metadata wire format: host pack -> device unpack must be the
identity on every field (attention/metadata.py)."""

import jax.numpy as jnp
import numpy as np

from minisgl_tpu.attention.metadata import (
    pack_step_meta,
    packed_len,
    unpack_step_meta,
)
from minisgl_tpu.core import BatchMetadata


def _mk(phase, B, T, PB, rng):
    return BatchMetadata(
        phase=phase,
        slot_ids=rng.integers(0, 9, B).astype(np.int32),
        out_slots=rng.integers(0, 999, T).astype(np.int32),
        positions=rng.integers(0, 99, T).astype(np.int32),
        page_table=rng.integers(0, 50, (B, PB)).astype(np.int32),
        seq_lens=rng.integers(1, 100, B).astype(np.int32),
        input_ids=(
            rng.integers(0, 1000, T).astype(np.int32)
            if phase == "prefill"
            else None
        ),
        q_req_ids=rng.integers(-1, B, T).astype(np.int32),
        last_q_index=rng.integers(0, T, B).astype(np.int32),
        cu_q_lens=np.cumsum(rng.integers(0, 4, B + 1)).astype(np.int32),
        temperature=rng.random(B).astype(np.float32),
        top_k=rng.integers(-1, 50, B).astype(np.int32),
        top_p=rng.random(B).astype(np.float32),
        num_reqs=B - 1,
        num_tokens=T,
    )


def _roundtrip(phase, B, T, PB):
    rng = np.random.default_rng(0)
    m = _mk(phase, B, T, PB, rng)
    packed = pack_step_meta(m)
    assert packed.dtype == np.int32
    assert len(packed) == packed_len(B, T, PB, phase == "prefill")
    out = unpack_step_meta(jnp.asarray(packed), B, T, PB, phase)

    np.testing.assert_array_equal(out.attn.out_slots, m.out_slots)
    np.testing.assert_array_equal(out.attn.positions, m.positions)
    np.testing.assert_array_equal(out.attn.page_table, m.page_table)
    np.testing.assert_array_equal(out.attn.seq_lens, m.seq_lens)
    np.testing.assert_array_equal(out.attn.q_req_ids, m.q_req_ids)
    np.testing.assert_array_equal(out.attn.last_q_index, m.last_q_index)
    np.testing.assert_array_equal(out.attn.cu_q_lens, m.cu_q_lens)
    assert int(out.attn.num_seqs[0]) == m.num_reqs
    np.testing.assert_array_equal(out.sampling.temperature, m.temperature)
    np.testing.assert_array_equal(out.sampling.top_k, m.top_k)
    np.testing.assert_array_equal(out.sampling.top_p, m.top_p)
    np.testing.assert_array_equal(out.slot_ids, m.slot_ids)
    if phase == "prefill":
        np.testing.assert_array_equal(out.input_ids, m.input_ids)
    else:
        assert out.input_ids is None


def test_roundtrip_decode():
    _roundtrip("decode", 8, 8, 16)


def test_roundtrip_prefill():
    _roundtrip("prefill", 4, 128, 8)


def test_roundtrip_single_row():
    _roundtrip("decode", 1, 1, 8)
