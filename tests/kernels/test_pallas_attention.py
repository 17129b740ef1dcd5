"""Parity tests: our Pallas ragged paged-attention kernel vs the XLA
reference backend (attention/xla_backend.py), across the three query modes
of the reference backends (/root/reference/python/minisgl/attention/fa.py
decode / full prefill / extend-after-prefix-hit). Runs the kernel in
interpreter mode on CPU; on a real TPU the same test compiles natively.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minisgl_tpu.attention.metadata import AttnMetadata
from minisgl_tpu.attention.pallas_backend import pallas_ragged_paged_attention
from minisgl_tpu.attention.xla_backend import xla_paged_attention
from minisgl_tpu.ops.kv import KV

def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# real-hardware lane tiling wants head_dim % 128 == 0; interpret mode is
# shape-agnostic so CPU runs use small fast shapes
HD = 128 if not _interpret() else 32
PS = 4  # page size


def _mk_case(rng, seqs, Hq, kvh, BQ, pages_cap=16, int8=False, ps=None):
    """seqs: list of (q_len, kv_len). Builds padded metadata + pool the way
    engine/batch_builder does, with q segments aligned to BQ."""
    PS = ps or globals()["PS"]
    B = len(seqs)
    N = B * pages_cap + 1
    raw = rng.standard_normal((N, PS, 2 * kvh, HD)).astype(np.float32)
    if int8:
        amax = np.abs(raw).max(axis=-1)  # [N, PS, 2kvh]
        sc = np.maximum(amax, 1e-8) / 127.0
        qdata = np.clip(np.rint(raw / sc[..., None]), -127, 127).astype(np.int8)
        # flat decode sidecar [N, 2, PS*kvh] (lane = off*kvh + h) and
        # prefill sidecar [N, PS, 128] (head scales in lanes) — ops/kv.py
        flat = sc.reshape(N, PS, 2, kvh).transpose(0, 2, 1, 3).reshape(
            N, 2, PS * kvh
        )
        sc_p = np.zeros((N, PS, 128), np.float32)
        sc_p[:, :, : 2 * kvh] = sc
        kv_pool = KV(
            jnp.asarray(qdata),
            jnp.asarray(flat, jnp.float32),
            jnp.asarray(sc_p),
        )
    else:
        kv_pool = KV(jnp.asarray(raw, jnp.float32))

    page_table = np.zeros((B, pages_cap), np.int32)
    seq_lens = np.zeros((B,), np.int32)
    positions, q_req_ids, cu = [], [], [0]
    for b, (q_len, kv_len) in enumerate(seqs):
        assert q_len <= kv_len <= pages_cap * PS
        page_table[b] = 1 + b * pages_cap + np.arange(pages_cap)
        seq_lens[b] = kv_len
        pos = list(range(kv_len - q_len, kv_len))
        pad = (-q_len) % BQ
        positions += pos + [0] * pad
        q_req_ids += [b] * q_len + [-1] * pad
        cu.append(cu[-1] + q_len + pad)
    T = cu[-1]
    q = jnp.asarray(rng.standard_normal((T, Hq, HD)), jnp.float32)

    meta = AttnMetadata(
        out_slots=jnp.zeros((T,), jnp.int32),
        positions=jnp.asarray(positions, jnp.int32),
        page_table=jnp.asarray(page_table),
        seq_lens=jnp.asarray(seq_lens),
        q_req_ids=jnp.asarray(q_req_ids, jnp.int32),
        last_q_index=jnp.zeros((B,), jnp.int32),
        cu_q_lens=jnp.asarray(cu, jnp.int32),
        num_seqs=jnp.asarray([B], jnp.int32),
    )
    return q, kv_pool, meta


# interpret mode is exact f32; real MXU runs f32 via bf16 passes
TOL = dict(rtol=2e-5, atol=2e-5) if _interpret() else dict(rtol=2e-2, atol=2e-2)


def _check(q, kv_pool, meta, BQ):
    scale = HD**-0.5
    got = pallas_ragged_paged_attention(
        q, kv_pool, meta, scale=scale, block_q=BQ, pages_per_chunk=2,
        interpret=_interpret(),
    )
    # xla reference masks nothing by q_req_id == -1; compare only real rows
    ref_meta = meta._replace(
        q_req_ids=jnp.maximum(meta.q_req_ids, 0)
    )
    want = xla_paged_attention(q, kv_pool, ref_meta, PS, scale)
    real = np.asarray(meta.q_req_ids) >= 0
    np.testing.assert_allclose(
        np.asarray(got)[real], np.asarray(want)[real], **TOL
    )


def test_decode_batch():
    rng = np.random.default_rng(0)
    seqs = [(1, 1), (1, 7), (1, 33), (1, 64)]
    q, kv, meta = _mk_case(rng, seqs, Hq=4, kvh=2, BQ=1)
    _check(q, kv, meta, BQ=1)


def test_decode_with_padding_rows():
    rng = np.random.default_rng(1)
    seqs = [(1, 13), (1, 27), (1, 5), (1, 9)]
    q, kv, meta = _mk_case(rng, seqs, Hq=4, kvh=2, BQ=1)
    meta = meta._replace(num_seqs=jnp.asarray([2], jnp.int32))
    scale = HD**-0.5
    got = pallas_ragged_paged_attention(
        q, kv, meta, scale=scale, block_q=1, pages_per_chunk=2,
        interpret=_interpret(),
    )
    want = xla_paged_attention(q, kv, meta, PS, scale)
    # only the first num_seqs rows are defined
    np.testing.assert_allclose(
        np.asarray(got)[:2], np.asarray(want)[:2], **TOL
    )


def test_full_prefill():
    rng = np.random.default_rng(2)
    seqs = [(24, 24), (8, 8)]
    q, kv, meta = _mk_case(rng, seqs, Hq=4, kvh=2, BQ=8)
    _check(q, kv, meta, BQ=8)


def test_extend_after_prefix_hit():
    rng = np.random.default_rng(3)
    seqs = [(10, 40), (3, 17), (16, 16)]
    q, kv, meta = _mk_case(rng, seqs, Hq=4, kvh=2, BQ=8)
    _check(q, kv, meta, BQ=8)


def test_mha_no_gqa():
    rng = np.random.default_rng(4)
    seqs = [(12, 20), (5, 5)]
    q, kv, meta = _mk_case(rng, seqs, Hq=2, kvh=2, BQ=4)
    _check(q, kv, meta, BQ=4)


def test_long_multi_chunk():
    rng = np.random.default_rng(5)
    # kv spans many chunks (pages_cap 16 pages * 4 tok, chunk = 2 pages)
    seqs = [(60, 64)]
    q, kv, meta = _mk_case(rng, seqs, Hq=4, kvh=2, BQ=4)
    _check(q, kv, meta, BQ=4)


# ---- int8 KV pool (per-(token, head) scales, ops/kv.py) --------------------


def _dequant(kv: KV) -> KV:
    data, sc = kv.data, kv.scale
    N, PS_, kvh2, _ = data.shape
    kvh = kvh2 // 2
    sc_full = (
        np.asarray(sc)
        .reshape(N, 2, PS_, kvh)
        .transpose(0, 2, 1, 3)
        .reshape(N, PS_, kvh2)
    )
    return KV(
        jnp.asarray(np.asarray(data, np.float32) * sc_full[..., None])
    )


# the pallas FLAT decode path requires ps * kvh % 128 == 0 on real
# hardware, and kvh % 4 == 0 for the int8 K/V plane-split DMA; other
# geometries auto-fall back to the general kernel (pallas_backend.py)
PS_INT8 = PS if _interpret() else 64


def test_int8_kv_decode_parity():
    """kvh=2 is NOT 4-aligned: int8 decode takes the general-kernel
    fallback (whole-page DMA + prefill-sidecar dequant)."""
    rng = np.random.default_rng(6)
    seqs = [(1, 3), (1, 29), (1, 64)]
    q, kv, meta = _mk_case(
        rng, seqs, Hq=4, kvh=2, BQ=1, int8=True, ps=PS_INT8
    )
    scale = HD**-0.5
    got = pallas_ragged_paged_attention(
        q, kv, meta, scale=scale, block_q=1, pages_per_chunk=2,
        interpret=_interpret(),
    )
    want = xla_paged_attention(q, _dequant(kv), meta, PS_INT8, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **TOL)
    # the xla backend's own int8 path must agree too
    want2 = xla_paged_attention(q, kv, meta, PS_INT8, scale)
    np.testing.assert_allclose(np.asarray(want2), np.asarray(want), **TOL)


def test_int8_kv_decode_flat_parity():
    """kvh=8 (sublane-tile aligned) with ps*kvh % 128 == 0: the FLAT
    decode kernel with score-row dequant from the flat sidecar."""
    rng = np.random.default_rng(16)
    ps = PS if _interpret() else 16  # 16 * 8 = 128 lanes
    seqs = [(1, 3), (1, 29), (1, 64)]
    q, kv, meta = _mk_case(rng, seqs, Hq=16, kvh=8, BQ=1, int8=True, ps=ps)
    scale = HD**-0.5
    got = pallas_ragged_paged_attention(
        q, kv, meta, scale=scale, block_q=1, pages_per_chunk=2,
        interpret=_interpret(),
    )
    want = xla_paged_attention(q, _dequant(kv), meta, ps, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **TOL)


def _to_plane_major(kv: KV) -> KV:
    """[N, ps, 2kvh, hd] -> [N, 2, ps*kvh, hd] (row t*kvh + h per plane)."""
    d = np.asarray(kv.data)
    N, ps, kvh2, hd = d.shape
    kvh = kvh2 // 2
    flat = np.stack(
        [
            d[:, :, :kvh, :].reshape(N, ps * kvh, hd),
            d[:, :, kvh:, :].reshape(N, ps * kvh, hd),
        ],
        axis=1,
    )
    return KV(jnp.asarray(flat), kv.scale, kv.scale_p)


@pytest.mark.parametrize("int8", [False, True], ids=["bf16", "int8"])
def test_plane_major_decode_parity(int8):
    """The experimental plane-major pool layout [N, 2, ps*kvh, hd] must be
    token-exact with the head-blocked layout (measured perf-neutral on v5e —
    benchmark/kernels/bench_decode_layout.py — but it lifts the kvh sublane
    alignment requirement, so it is the escape hatch for high-TP kvh_local
    geometries)."""
    rng = np.random.default_rng(23)
    ps = PS if _interpret() else 16
    seqs = [(1, 3), (1, 29), (1, 64)]
    q, kv, meta = _mk_case(
        rng, seqs, Hq=16, kvh=8, BQ=1, int8=int8, ps=ps
    )
    scale = HD**-0.5
    base = pallas_ragged_paged_attention(
        q, kv, meta, scale=scale, block_q=1, pages_per_chunk=2,
        interpret=_interpret(),
    )
    got = pallas_ragged_paged_attention(
        q, _to_plane_major(kv), meta, scale=scale, block_q=1,
        pages_per_chunk=2, interpret=_interpret(), plane_major_ps=ps,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(base), **TOL)


@pytest.mark.parametrize("int8", [False, True], ids=["bf16", "int8"])
def test_gated_dma_decode_parity(int8):
    """page_size >= 64 enables last-chunk DMA gating (pages past the
    sequence's true page count are never fetched). kv lens chosen so the
    final chunk holds FEWER real pages than pages_per_chunk — the gated
    region must contribute nothing (zero-init guards the 0*NaN hazard)."""
    rng = np.random.default_rng(29)
    ps = 64
    # cap 4 pages x 64 = 256 max; np_r = 3 of CP=2x2 chunks, 1 page gated
    seqs = [(1, 130), (1, 65), (1, 200)]
    q, kv, meta = _mk_case(
        rng, seqs, Hq=16, kvh=8, BQ=1, pages_cap=4, int8=int8, ps=ps
    )
    scale = HD**-0.5
    got = pallas_ragged_paged_attention(
        q, kv, meta, scale=scale, block_q=1, pages_per_chunk=2,
        interpret=_interpret(),
    )
    ref_kv = _dequant(kv) if int8 else kv
    want = xla_paged_attention(q, ref_kv, meta, ps, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **TOL)
    assert np.isfinite(np.asarray(got, np.float32)).all()


def test_bf16_odd_kvh_decode_parity():
    """kvh=1 bf16 is not 8-aligned for the plane-split DMA: decode
    auto-routes to the fused whole-page kernel (any-kvh path for unscaled
    pools; latent high-TP geometry, kvh_local=1). The f32 pool variant of
    the same geometry (packing 1) keeps the flat split kernel — both must
    agree with the XLA reference."""
    rng = np.random.default_rng(17)
    seqs = [(1, 7), (1, 33)]
    scale = HD**-0.5
    for cast in (jnp.bfloat16, jnp.float32):
        q, kv, meta = _mk_case(rng, seqs, Hq=4, kvh=1, BQ=1)
        # round through the storage dtype so pallas and the f32 XLA
        # reference see identical values
        kv = KV(kv.data.astype(cast).astype(jnp.float32))
        got = pallas_ragged_paged_attention(
            q, KV(kv.data.astype(cast)), meta, scale=scale, block_q=1,
            pages_per_chunk=2, interpret=_interpret(),
        )
        want = xla_paged_attention(q, kv, meta, PS, scale)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
        )


def test_int8_kv_prefill_parity():
    rng = np.random.default_rng(7)
    seqs = [(24, 24), (10, 40)]
    q, kv, meta = _mk_case(
        rng, seqs, Hq=4, kvh=2, BQ=8, int8=True, ps=PS_INT8
    )
    scale = HD**-0.5
    got = pallas_ragged_paged_attention(
        q, kv, meta, scale=scale, block_q=8, pages_per_chunk=2,
        interpret=_interpret(),
    )
    want = xla_paged_attention(q, _dequant(kv), meta, PS_INT8, scale)
    real = np.asarray(meta.q_req_ids) >= 0
    np.testing.assert_allclose(
        np.asarray(got)[real], np.asarray(want)[real], **TOL
    )


@pytest.mark.parametrize("int8", [False, True], ids=["bf16", "int8"])
def test_plane_major_prefill_parity(int8):
    """Plane-major pool through the GENERAL kernel (BQ > 1: full prefill +
    extend-after-prefix-hit): split per-plane DMA buffers, same per-head
    math — must match the head-blocked layout token-exactly."""
    from tests.helpers import to_plane_major

    rng = np.random.default_rng(41)
    ps = PS if _interpret() else 16
    seqs = [(10, 40), (3, 17), (16, 16)]
    q, kv, meta = _mk_case(rng, seqs, Hq=16, kvh=8, BQ=8, int8=int8, ps=ps)
    scale = HD**-0.5
    base = pallas_ragged_paged_attention(
        q, kv, meta, scale=scale, block_q=8, pages_per_chunk=2,
        interpret=_interpret(),
    )
    got = pallas_ragged_paged_attention(
        q, to_plane_major(kv), meta, scale=scale, block_q=8,
        pages_per_chunk=2, interpret=_interpret(), plane_major_ps=ps,
    )
    real = np.asarray(meta.q_req_ids) >= 0
    np.testing.assert_allclose(
        np.asarray(got)[real], np.asarray(base)[real], **TOL
    )


@pytest.mark.parametrize("int8", [False, True], ids=["bf16", "int8"])
def test_plane_major_xla_backend_parity(int8):
    """The XLA reference backend must read plane-major pools identically."""
    from tests.helpers import to_plane_major

    rng = np.random.default_rng(43)
    ps = PS if _interpret() else 16
    seqs = [(1, 13), (4, 20), (8, 8)]
    q, kv, meta = _mk_case(rng, seqs, Hq=16, kvh=8, BQ=4, int8=int8, ps=ps)
    scale = HD**-0.5
    base = xla_paged_attention(q, kv, meta, ps, scale)
    got = xla_paged_attention(q, to_plane_major(kv), meta, ps, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base), **TOL)
