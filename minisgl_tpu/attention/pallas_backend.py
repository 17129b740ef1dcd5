"""Our ragged paged-attention Pallas TPU kernel.

The TPU-native counterpart of the reference's attention kernels
(/root/reference/python/minisgl/attention/fa.py FlashAttention,
fi.py FlashInfer): one kernel serves all three query modes — decode
(q_len=1), full prefill, and extend-after-prefix-hit — against the combined
paged KV pool (ops/kv.py layout ``[N_pages, page_size, 2*kvh, hd]``, K/V
head-blocked on the heads axis, ``meta.page_table`` pre-offset to the layer).

Design:
- grid = (num_seqs_padded, max_q_blocks). Each program owns one ``BQ``-row
  query block of one sequence. The host builder aligns every sequence's query
  segment to ``BQ`` rows (engine/batch_builder.py), so block starts are
  expressible as BlockSpec index maps driven by the scalar-prefetched
  ``cu_q_lens`` — decode is simply BQ=1 where alignment is trivial.
- The KV pages of the owning sequence stream HBM -> VMEM with double-buffered
  per-page async DMA (page row = [page_size, 2*kvh, hd] is one contiguous
  DMA), overlapping the flash-attention inner loop.
- Online softmax (m, l, acc carries) in f32 over chunks of CP pages; per
  kv-head group the score matmul is [BQ*G, hd] x [hd, CP*page_size] — MXU
  shaped for prefill (128x128x128 at BQ=64, G=2, hd=128) while decode stays
  HBM-bandwidth bound as it must be.
- Causality comes from the explicit per-token ``positions`` (not derived from
  q_len), which is what makes prefix-extend and intra-segment padding rows
  work: padding rows mask to nothing and produce garbage rows no consumer
  reads (the LM head gathers ``last_q_index`` only).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from minisgl_tpu.attention.metadata import AttnMetadata

_NEG_INF = -1e30


def _attn_kernel(
    # scalar prefetch
    blk_seq_ref,  # [n_blocks] i32: owning seq of each q block (-1 padding)
    kv_lens_ref,  # [B] i32
    num_seqs_ref,  # [1] i32 (unused; shared prefetch signature)
    pt_ref,  # [B, PB] i32 page tables (scalar prefetch, SMEM)
    # then positionally: q_ref [BQ, Hq, hd], pos_ref [1, BQ, 1],
    # qrid_ref [1, BQ, 1], kv_hbm ANY [N, ps, 2*kvh, hd],
    # (sc_hbm ANY [N, ps, 128] prefill scale sidecar — int8 pools only),
    # output o_ref [BQ, Hq, hd],
    # scratch kv_buf [2, CP, ps, 2*kvh, hd], sems [2, CP],
    # (sc_buf [2, CP, ps, 128], sc_sems [2, CP] — int8 pools only)
    *refs,
    scale: float,
    block_q: int,
    pages_per_chunk: int,
    has_scale: bool = False,
    plane_major_ps: int = 0,
    diag: str = "",
):
    if plane_major_ps:
        # plane-major pool [N, 2, ps*kvh, hd]: K and V planes DMA into
        # SEPARATE whole-tile buffers [2, CP, ps*kvh, hd] (one contiguous
        # copy each); the per-head compute below slices the (Tc, kvh, hd)
        # view exactly like the head-blocked (Tc, 2kvh, hd) one
        if has_scale:
            (q_ref, pos_ref, qrid_ref, kv_hbm, sc_hbm,
             o_ref, k_buf, v_buf, sems, sc_buf, sc_sems) = refs
        else:
            (q_ref, pos_ref, qrid_ref, kv_hbm,
             o_ref, k_buf, v_buf, sems) = refs
            sc_hbm = sc_buf = sc_sems = None
        kv_buf = None
    elif has_scale:
        (q_ref, pos_ref, qrid_ref, kv_hbm, sc_hbm,
         o_ref, kv_buf, sems, sc_buf, sc_sems) = refs
    else:
        q_ref, pos_ref, qrid_ref, kv_hbm, o_ref, kv_buf, sems = refs
        sc_hbm = sc_buf = sc_sems = None
    if diag == "io":  # diagnostic: grid + q/o block pipeline only, no math
        o_ref[:] = q_ref[:]
        return
    # FLAT grid: one program per q BLOCK (not per (seq, block) pair). The
    # former (B_pad, max_q_blocks) grid launched B_pad x n_blocks programs
    # of which ~1/B were real — and every dead program still cycled its
    # 256 KB q/o blocks through the pipeline: an io-only diagnostic showed
    # the dead-block traffic alone was ~80% of the prefill step (BENCHLOG
    # round 3). Padding blocks (whole-block q padding) carry seq -1.
    i = pl.program_id(0)
    b = blk_seq_ref[i]
    BQ = block_q
    CP = pages_per_chunk
    _, Hq, hd = q_ref.shape
    if plane_major_ps:
        ps = plane_major_ps
        kvh = k_buf.shape[2] // ps
    else:
        ps = kv_buf.shape[2]
        kvh = kv_buf.shape[3] // 2
    G = Hq // kvh
    R = BQ * G
    Tc = CP * ps

    run = b >= 0

    @pl.when(run)
    def _():
        kv_len = kv_lens_ref[b]
        pos = pos_ref[0, :, 0]  # [BQ]
        # bound the kv scan by the largest position this block attends to
        bound = jnp.minimum(kv_len, jnp.max(pos) + 1)
        num_chunks = pl.cdiv(bound, Tc)

        def start_dma(slot, ci):
            for j in range(CP):
                page = pt_ref[b, ci * CP + j]
                if plane_major_ps:
                    pltpu.make_async_copy(
                        kv_hbm.at[page, 0], k_buf.at[slot, j],
                        sems.at[slot, j, 0],
                    ).start()
                    pltpu.make_async_copy(
                        kv_hbm.at[page, 1], v_buf.at[slot, j],
                        sems.at[slot, j, 1],
                    ).start()
                else:
                    pltpu.make_async_copy(
                        kv_hbm.at[page], kv_buf.at[slot, j], sems.at[slot, j]
                    ).start()
                if has_scale:
                    pltpu.make_async_copy(
                        sc_hbm.at[page], sc_buf.at[slot, j], sc_sems.at[slot, j]
                    ).start()

        def wait_dma(slot):
            for j in range(CP):
                if plane_major_ps:
                    pltpu.make_async_copy(
                        kv_hbm.at[0, 0], k_buf.at[slot, j],
                        sems.at[slot, j, 0],
                    ).wait()
                    pltpu.make_async_copy(
                        kv_hbm.at[0, 1], v_buf.at[slot, j],
                        sems.at[slot, j, 1],
                    ).wait()
                else:
                    pltpu.make_async_copy(
                        kv_hbm.at[0], kv_buf.at[slot, j], sems.at[slot, j]
                    ).wait()
                if has_scale:
                    pltpu.make_async_copy(
                        sc_hbm.at[0], sc_buf.at[slot, j], sc_sems.at[slot, j]
                    ).wait()

        start_dma(0, 0)

        pos_q = pos_ref[0]  # [BQ, 1]
        valid_row = qrid_ref[0] == b  # [BQ, 1]

        # NO f32 prologue: q stays in its native dtype and ``scale`` folds
        # into the f32 scores after each dot — casting/scaling the whole
        # [BQ, Hq, hd] block materialized ~1 MB of f32 per program and the
        # per-program prologue shuffling dominated prefill attention
        if BQ == 1:
            # decode fallback: group the G query heads of each kv head into
            # one [G, hd] block — one dot per kv head instead of G matvecs
            # (q_ref[0, a:b, :] is a clean 2D slice; no cross-row reshape)
            q_heads = [
                q_ref[0, h * G : (h + 1) * G, :] for h in range(kvh)
            ]
        else:
            # FLAT per-kv-head blocks: all G query heads of kv head h stack
            # into one [BQ*G, hd] operand ([BQ, G, hd] head slice, major-dim
            # merge). The former per-q-head loop issued Hq tiny [BQ, Tc]
            # dots + softmaxes per chunk (BENCHLOG round 3 prefill
            # ablation). No redundant FLOPs: each q head still attends only
            # its own kv head.
            q_heads = [
                q_ref[:, h * G : (h + 1) * G, :].reshape(BQ * G, hd)
                for h in range(kvh)
            ]

        def chunk_body(ci, carry):
            ms, ls, accs = carry

            @pl.when(ci + 1 < num_chunks)
            def _():
                start_dma((ci + 1) % 2, ci + 1)

            slot = ci % 2
            wait_dma(slot)
            if plane_major_ps:
                kf = k_buf[slot].reshape(Tc, kvh, hd)
                vf = v_buf[slot].reshape(Tc, kvh, hd)
            else:
                kv = kv_buf[slot].reshape(Tc, 2 * kvh, hd)
            if has_scale:
                # prefill sidecar [CP, ps, 128] -> [Tc, 128]: token rows in
                # sublanes, head scales in lanes (ops/kv.py layout). ONE
                # identity-selector dot extracts every head's K and V scale
                # row at once ([2kvh, Tc]; row h = K of head h, kvh + h =
                # V) — the former per-head one-hot dots issued 2*kvh tiny
                # MXU ops per chunk (a [:, h] lane slice is still not
                # Mosaic-lowerable; static ROW slices of the result are).
                sc_all = sc_buf[slot].reshape(Tc, 128)
                sel = (
                    jax.lax.broadcasted_iota(jnp.int32, (2 * kvh, 128), 1)
                    == jax.lax.broadcasted_iota(
                        jnp.int32, (2 * kvh, 128), 0
                    )
                ).astype(jnp.float32)
                sc_rows = jax.lax.dot_general(
                    sel, sc_all, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    # selection must reproduce the f32 scale bit-exactly
                    precision=jax.lax.Precision.HIGHEST,
                )  # [2kvh, Tc]

            kv_idx = ci * Tc + jax.lax.broadcasted_iota(
                jnp.int32, (BQ, Tc), dimension=1
            )
            mask = (kv_idx <= pos_q) & (kv_idx < kv_len) & valid_row
            if BQ > 1:
                # expand the [BQ, Tc] additive mask to flat rows [BQ*G, Tc]
                # with ONE one-hot MXU dot shared by every kv head (row
                # i*G+g -> q row i); a vector-unit reshape/broadcast to the
                # same shape is a G-sublane relayout that cost 10% of the
                # whole prefill step when tried. Finite _NEG_INF keeps
                # 0 * mask products at 0 (a true -inf would NaN them).
                amask = jnp.where(mask, 0.0, _NEG_INF)  # [BQ, Tc] f32
                rows_i = jax.lax.broadcasted_iota(
                    jnp.int32, (BQ * G, BQ), 0
                ) // G
                cols_i = jax.lax.broadcasted_iota(
                    jnp.int32, (BQ * G, BQ), 1
                )
                expand = (rows_i == cols_i).astype(jnp.float32)
                amask_R = jax.lax.dot_general(
                    expand, amask, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [BQ*G, Tc]

            new_ms, new_ls, new_accs = [], [], []
            for h in range(kvh):
                # cast up from the pool dtype (bf16/fp8/int8 KV) for the MXU
                if plane_major_ps:
                    k = kf[:, h, :].astype(q_ref.dtype)  # [Tc, hd]
                    v = vf[:, h, :].astype(q_ref.dtype)
                else:
                    k = kv[:, h, :].astype(q_ref.dtype)  # [Tc, hd]
                    v = kv[:, kvh + h, :].astype(q_ref.dtype)
                if has_scale:
                    # head h's per-token scales as [1, Tc] ROWS (static row
                    # slices of the chunk-wide selector dot above); dequant
                    # lands on the [*, Tc] scores/probabilities — hd x less
                    # work than scaling the chunk data, and row-shaped so
                    # it broadcasts along lanes with no transpose
                    sk_row = sc_rows[h : h + 1]  # [1, Tc]
                    sv_row = sc_rows[kvh + h : kvh + h + 1]
                if BQ == 1:
                    s = scale * jax.lax.dot_general(
                        q_heads[h], k, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [G, Tc]
                    if has_scale:
                        s = s * sk_row
                    s = jnp.where(mask, s, _NEG_INF)
                    m_new = jnp.maximum(ms[h], jnp.max(s, axis=1, keepdims=True))
                    p = jnp.exp(s - m_new)
                    alpha = jnp.exp(ms[h] - m_new)
                    l_new = ls[h] * alpha + jnp.sum(p, axis=1, keepdims=True)
                    if has_scale:
                        p = p * sv_row
                    pv = jax.lax.dot_general(
                        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [G, hd]
                    new_ms.append(m_new)
                    new_ls.append(l_new)
                    new_accs.append(accs[h] * alpha + pv)
                    continue
                s = scale * jax.lax.dot_general(
                    q_heads[h], k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [BQ*G, Tc]
                if has_scale:
                    s = s * sk_row
                s = s + amask_R
                m_new = jnp.maximum(ms[h], jnp.max(s, axis=1, keepdims=True))
                p = jnp.exp(s - m_new)  # [BQ*G, Tc]
                alpha = jnp.exp(ms[h] - m_new)
                l_new = ls[h] * alpha + jnp.sum(p, axis=1, keepdims=True)
                if has_scale:
                    p = p * sv_row
                pv = jax.lax.dot_general(
                    p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [BQ*G, hd]
                new_ms.append(m_new)
                new_ls.append(l_new)
                new_accs.append(accs[h] * alpha + pv)
            return tuple(new_ms), tuple(new_ls), tuple(new_accs)

        rows = G if BQ == 1 else BQ * G
        init = (
            tuple(
                jnp.full((rows, 1), _NEG_INF, jnp.float32)
                for _ in range(kvh)
            ),
            tuple(jnp.zeros((rows, 1), jnp.float32) for _ in range(kvh)),
            tuple(jnp.zeros((rows, hd), jnp.float32) for _ in range(kvh)),
        )
        ms, ls, accs = jax.lax.fori_loop(0, num_chunks, chunk_body, init)

        for h in range(kvh):
            o_h = accs[h] / jnp.maximum(ls[h], 1e-30)  # [rows, hd]
            if BQ == 1:
                o_ref[0, h * G : (h + 1) * G, :] = o_h.astype(o_ref.dtype)
            else:
                o_ref[:, h * G : (h + 1) * G, :] = o_h.reshape(
                    BQ, G, hd
                ).astype(o_ref.dtype)


def _decode_kernel(
    # scalar prefetch (same order as _attn_kernel)
    cu_q_blocks_ref,  # [B+1] i32 (decode: arange)
    kv_lens_ref,  # [B] i32
    num_seqs_ref,  # [1] i32
    pt_ref,  # [B, PB] i32 page tables (SMEM)
    # then positionally: q_ref [1, Hq, hd], pos_ref [1, 1, 1],
    # qrid_ref [1, 1, 1],
    # (fused_store: kvn_ref [1, 2*kvh, hd] pool-dtype new KV row,
    #  + int8: scn_ref [1, 2, 128] scale planes at lanes [0, kvh),
    #          spn_ref [1, 1, 128] prefill-sidecar scale row),
    # kv_hbm ANY [N, ps, 2*kvh, hd],
    # (sc_hbm ANY [N, 2, SW] decode scale sidecar, SW = ps*kvh — int8 only),
    # (fused_store int8: sp_hbm ANY [N, ps, 128]),
    # outputs: o_ref [1, Hq, hd]
    # (fused_store: + kvo_ref = kv_hbm aliased; int8: sco_ref, spo_ref),
    # scratch k_buf [2, CP, ps, kvh, hd], v_buf same, sems [2, CP, 2],
    # par_ref SMEM [1] i32 (buffer parity carried across grid programs),
    # (sc_buf [2, CP, 2, SW], sc_sems [2, CP] — int8 pools only)
    # (fused_store: w_sems DMA [3] write-back semaphores)
    *refs,
    scale: float,
    pages_per_chunk: int,
    diag: str = "",
    has_scale: bool = False,
    plane_major_ps: int = 0,
    fused_store: bool = False,
):
    kvn_ref = scn_ref = spn_ref = sp_hbm = None
    kvo_ref = sco_ref = spo_ref = w_sems = None
    if fused_store and has_scale:
        (q_ref, pos_ref, qrid_ref, kvn_ref, scn_ref, spn_ref,
         kv_hbm, sc_hbm, sp_hbm,
         o_ref, kvo_ref, sco_ref, spo_ref,
         k_buf, v_buf, sems, par_ref, sc_buf, sc_sems, w_sems) = refs
    elif fused_store:
        (q_ref, pos_ref, qrid_ref, kvn_ref, kv_hbm,
         o_ref, kvo_ref, k_buf, v_buf, sems, par_ref, w_sems) = refs
        sc_hbm = sc_buf = sc_sems = None
    elif has_scale:
        (q_ref, pos_ref, qrid_ref, kv_hbm, sc_hbm,
         o_ref, k_buf, v_buf, sems, par_ref, sc_buf, sc_sems) = refs
    else:
        (q_ref, pos_ref, qrid_ref, kv_hbm,
         o_ref, k_buf, v_buf, sems, par_ref) = refs
        sc_hbm = sc_buf = sc_sems = None
    """Decode (q_len=1) specialization: ALL kv heads in two matmuls/chunk.

    The per-head formulation (_attn_kernel) issues ~8 tiny VPU/MXU ops per
    kv head per chunk; at bs=128 that instruction overhead — not HBM
    bandwidth — dominated the decode step (benchmark/decode_ablation.py:
    attention 27 ms of a 30 ms step). Here the K and V planes of each page
    DMA into separate VMEM buffers (the pool's block head order makes the
    source a clean strided slice; an element shuffle in VMEM would be far
    worse), and scores for every (q head, kv head) pair are ONE
    [Hq, hd] x [hd, kvh*Tc] dot against the flattened K buffer. A mask
    -inf's the (q head, kv head) pairs that don't interact (8x redundant
    FLOPs on a ~2% utilized MXU — free), so softmax + PV collapse to one op
    each per chunk: the zero-elsewhere probabilities make p @ V_all exact.
    """
    b = pl.program_id(0)
    CP = pages_per_chunk
    NS = k_buf.shape[0]  # buffer slots (3: chunk double-buffer + one so the
    # NEXT sequence's chunk-0 prefetch can be issued a chunk ahead)
    _, Hq, hd = q_ref.shape
    if plane_major_ps:
        # plane-major pool [N, 2, ps*kvh, hd]: k_buf is [NS, CP, ps*kvh, hd]
        ps = plane_major_ps
        kvh = k_buf.shape[2] // ps
    else:
        ps = k_buf.shape[2]
        kvh = k_buf.shape[3]
    G = Hq // kvh
    Tc = CP * ps
    W = Tc * kvh  # flattened width; col c = token c//kvh, kv head c%kvh

    run = b < num_seqs_ref[0]

    @pl.when(run)
    def _():
        kv_len = kv_lens_ref[b]
        pos = pos_ref[0, 0, 0]
        bound = jnp.minimum(kv_len, pos + 1)
        num_chunks = pl.cdiv(bound, Tc)

        use_scale = has_scale and diag != "noscale"

        if fused_store:
            # Fused KV store: this program owns the row, so it writes the
            # current token's KV (and scales) itself — the separate store
            # kernel + XLA sidecar scatter cost ~3 ms/step at bs=128
            # (BENCHLOG round 3). HBM write-backs ride DMA queues under the
            # chunk loop; the VMEM chunk buffers are patched after the
            # owning chunk's read lands so the attention math sees the new
            # token without a read-after-write trip through HBM. The
            # current token is always in the row's LAST page (pos ==
            # kv_len - 1 in decode), which is exclusively owned by this
            # request — no cross-program write hazards.
            page_idx = pos // ps
            page_cur = pt_ref[b, page_idx]
            off = pos % ps
            chunk_cur = page_idx // CP
            j_cur = page_idx % CP
            if plane_major_ps:
                # plane pool: the token's K and V are contiguous [kvh, hd]
                # row blocks at off*kvh of each plane (row order t*kvh + h)
                pltpu.make_async_copy(
                    kvn_ref.at[0, pl.ds(0, kvh)],
                    kvo_ref.at[page_cur, 0, pl.ds(off * kvh, kvh)],
                    w_sems.at[0],
                ).start()
                pltpu.make_async_copy(
                    kvn_ref.at[0, pl.ds(kvh, kvh)],
                    kvo_ref.at[page_cur, 1, pl.ds(off * kvh, kvh)],
                    w_sems.at[3],
                ).start()
            else:
                pltpu.make_async_copy(
                    kvn_ref.at[0], kvo_ref.at[page_cur, off], w_sems.at[0]
                ).start()
            if has_scale:
                pltpu.make_async_copy(
                    spn_ref.at[0, 0], spo_ref.at[page_cur, off], w_sems.at[1]
                ).start()

        if plane_major_ps:
            # contiguous per-plane page rows: one straight-line DMA each
            k_src = lambda page: kv_hbm.at[page, 0]
            v_src = lambda page: kv_hbm.at[page, 1]
        else:
            # head-blocked layout: each plane is a strided second-minor slice
            k_src = lambda page: kv_hbm.at[page, :, 0:kvh, :]
            v_src = lambda page: kv_hbm.at[page, :, kvh : 2 * kvh, :]

        # Last-chunk DMA gating: chunk quantization would otherwise round
        # every sequence's reads up to Tc tokens (at Tc=512 a 513-token
        # sequence reads 1024 — the e2e regression that sank page_size 128
        # on first try). Gate each page's copies on the sequence's true page
        # count; start/wait guards match exactly, so semaphores stay
        # balanced. Slope-timed A/B (BENCHLOG round 2): wins at page_size
        # 128 (a gated page skips 64KB), LOSES at 16 (per-page scalar
        # branch costs more than a 2KB-run DMA — the round-1 revert) — so
        # gating is static on page size. Decode positions are seq_len-1, so
        # kv_len alone bounds the page count.
        gate_dma = ps >= 64
        if os.environ.get("MSLT_DECODE_GATE_DMA"):  # A/B experiments only
            gate_dma = os.environ["MSLT_DECODE_GATE_DMA"] == "1"

        def n_pages(row):
            return (kv_lens_ref[row] + ps - 1) // ps

        def start_dma(row, slot, ci):
            np_r = n_pages(row)

            def one(j):
                page = pt_ref[row, ci * CP + j]
                pltpu.make_async_copy(
                    k_src(page), k_buf.at[slot, j], sems.at[slot, j, 0]
                ).start()
                pltpu.make_async_copy(
                    v_src(page), v_buf.at[slot, j], sems.at[slot, j, 1]
                ).start()
                if use_scale:
                    pltpu.make_async_copy(
                        sc_hbm.at[page],
                        sc_buf.at[slot, j],
                        sc_sems.at[slot, j],
                    ).start()

            for j in range(CP):
                if gate_dma:
                    pl.when(ci * CP + j < np_r)(lambda j=j: one(j))
                else:
                    one(j)

        def wait_dma(row, slot, ci):
            np_r = n_pages(row)

            def one(j):
                pltpu.make_async_copy(
                    k_src(0), k_buf.at[slot, j], sems.at[slot, j, 0]
                ).wait()
                pltpu.make_async_copy(
                    v_src(0), v_buf.at[slot, j], sems.at[slot, j, 1]
                ).wait()
                if use_scale:
                    pltpu.make_async_copy(
                        sc_hbm.at[0],
                        sc_buf.at[slot, j],
                        sc_sems.at[slot, j],
                    ).wait()

            for j in range(CP):
                if gate_dma:
                    pl.when(ci * CP + j < np_r)(lambda j=j: one(j))
                else:
                    one(j)

        # Cross-sequence prefetch: program b-1 already issued THIS program's
        # chunk 0 into slot par_ref[0] (and set the parity), hiding the DMA
        # cold-start bubble that would otherwise be exposed at every sequence
        # boundary. Program 0 bootstraps itself.
        @pl.when(b == 0)
        def _():
            par_ref[0] = 0
            if gate_dma:
                # gating leaves never-written buffer regions; scratch VMEM
                # starts as undefined bits that could be NaN, and 0 * NaN =
                # NaN would poison the PV matmul (probabilities are zero at
                # gated columns, V values must be finite). Zero once per
                # call.
                v_buf[...] = jnp.zeros(v_buf.shape, v_buf.dtype)
                if use_scale:
                    sc_buf[...] = jnp.zeros(sc_buf.shape, jnp.float32)
            start_dma(0, 0, 0)

        p0 = par_ref[0]

        valid = qrid_ref[0, 0, 0] == b

        q_f = q_ref[0].astype(jnp.float32) * scale  # [Hq, hd]
        q_all = q_f.astype(q_ref.dtype)

        # HYBRID chunk/page compute (round 4): full chunks keep the wide
        # [Hq, W = CP*ps*kvh] formulation (one op set per chunk, no
        # token-bound mask — interior tokens are always valid), while the
        # final PARTIAL chunk computes page-by-page at [Hq, W1 = ps*kvh]
        # width over only its real pages. The round-3 all-wide kernel paid
        # a full chunk of fixed VPU softmax for one token past a chunk
        # boundary (kv=513 at Tc=512: 381 us/layer vs the ~200 us DMA
        # bound); an all-page-granular variant paid per-page loop overhead
        # on full chunks and measured SLOWER e2e (15.4 vs 13.6 ms/step) —
        # the hybrid takes each regime's cheaper path.
        W1 = ps * kvh  # one page's flattened (token, head) width
        row_kvh = jax.lax.broadcasted_iota(jnp.int32, (Hq, W), 0) // G
        col_h = jax.lax.broadcasted_iota(jnp.int32, (Hq, W), 1) % kvh
        head_ok = (col_h == row_kvh) & valid
        amask_head = jnp.where(head_ok, 0.0, _NEG_INF)  # [Hq, W] f32
        col_t1 = jax.lax.broadcasted_iota(jnp.int32, (Hq, W1), 1) // kvh
        amask_head1 = jnp.where(
            (jax.lax.broadcasted_iota(jnp.int32, (Hq, W1), 1) % kvh)
            == (jax.lax.broadcasted_iota(jnp.int32, (Hq, W1), 0) // G),
            0.0,
            _NEG_INF,
        )  # [Hq, W1]; `valid` folds into the tail's bound mask instead
        total_pages = pl.cdiv(bound, ps)
        num_full = bound // Tc  # full chunks; tail chunk iff < num_chunks

        def chunk_prologue(ci):
            """Per-chunk DMA pipeline + fused-store patch; returns the
            landed chunk's buffer slot. Shared by the wide full-chunk body
            and the page-granular tail.

            TRIPLE buffering (round 4): with 2 slots and a multi-chunk
            sequence, the NEXT sequence's chunk-0 DMA could only be issued
            at the current sequence's LAST chunk (its slot was still
            live), so the DMA engine idled during each program's compute
            and the wait exposed the whole transfer — measured as a
            dmaonly floor of 8.8 ms/step vs the 5.6 ms byte bound. With 3
            slots the cross-sequence prefetch is issued a full chunk ahead
            (slot (p0 + num_chunks) % NS frees from chunk
            max(num_chunks - (NS - 1), 0) onward), keeping the queue
            fed. NS=2 (MSLT_DECODE_NSLOTS A/B) degrades to the classic
            last-chunk prefetch: any earlier and the target slot is the
            one the current chunk is still reading."""

            @pl.when(ci + 1 < num_chunks)
            def _():
                start_dma(b, (p0 + ci + 1) % NS, ci + 1)

            @pl.when(
                jnp.logical_and(
                    ci == jnp.maximum(num_chunks - (NS - 1), 0),
                    b + 1 < num_seqs_ref[0],
                )
            )
            def _():
                start_dma(b + 1, (p0 + num_chunks) % NS, 0)

            slot = (p0 + ci) % NS
            wait_dma(b, slot, ci)
            return slot

        def chunk_patch(ci, slot):
            if fused_store:

                @pl.when(ci == chunk_cur)
                def _():
                    # patch the new token into the freshly-landed chunk
                    if plane_major_ps:
                        # plane buffers [.., ps*kvh, hd]: the token's rows
                        # are the contiguous block at off*kvh
                        k_buf[slot, j_cur, pl.ds(off * kvh, kvh)] = kvn_ref[
                            0, 0:kvh
                        ]
                        v_buf[slot, j_cur, pl.ds(off * kvh, kvh)] = kvn_ref[
                            0, kvh : 2 * kvh
                        ]
                    else:
                        k_buf[slot, j_cur, off] = kvn_ref[0, 0:kvh]
                        v_buf[slot, j_cur, off] = kvn_ref[0, kvh : 2 * kvh]
                    if use_scale:
                        SW = sc_buf.shape[3]
                        old = sc_buf[slot, j_cur]  # [2, SW]
                        # place the token's [2, kvh] scales at lanes
                        # off*kvh + h via a dynamic one-hot dot (a lane
                        # slice at a dynamic offset is not expressible)
                        src = jax.lax.broadcasted_iota(
                            jnp.int32, (scn_ref.shape[2], SW), 0
                        )
                        dst = jax.lax.broadcasted_iota(
                            jnp.int32, (scn_ref.shape[2], SW), 1
                        )
                        sel = (src + off * kvh == dst).astype(jnp.float32)
                        w = jax.lax.dot_general(
                            scn_ref[0], sel, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            # selection by a 0/1 matrix must reproduce the
                            # f32 scale bit-exactly; the MXU's default
                            # precision truncates f32 operands to bf16
                            precision=jax.lax.Precision.HIGHEST,
                        )  # [2, SW]
                        lane = jax.lax.broadcasted_iota(
                            jnp.int32, (2, SW), 1
                        )
                        win = (lane >= off * kvh) & (lane < off * kvh + kvh)
                        sc_buf[slot, j_cur] = jnp.where(win, w, old)
                        # write the patched row back (whole-row RMW: the
                        # page is exclusive to this request)
                        pltpu.make_async_copy(
                            sc_buf.at[slot, j_cur],
                            sco_ref.at[page_cur],
                            w_sems.at[2],
                        ).start()

        def wide_body(ci, carry):
            """Full chunk: one wide op set, no token-bound mask (every
            token of a full chunk is < bound)."""
            m, l, acc = carry
            slot = chunk_prologue(ci)
            chunk_patch(ci, slot)

            k_all = k_buf[slot].reshape(W, hd)
            v_all = v_buf[slot].reshape(W, hd)
            if k_all.dtype != q_ref.dtype:  # int8/fp8 pool: native upcast
                k_all = k_all.astype(q_ref.dtype)

            if diag == "dmaonly":  # diagnostic: DMA + loop floor, no attn
                touch = (
                    k_all[:Hq].astype(jnp.float32)
                    + v_all[:Hq].astype(jnp.float32)
                )
                return m, l, acc + touch

            s = jax.lax.dot_general(
                q_all, k_all, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Hq, W]
            if use_scale:
                # int8 pool: per-(token, head) dequant on the [Hq, W]
                # scores/probs — hd x less work than scaling the KV data.
                sc = sc_buf[slot]  # [CP, 2, SW]
                sck = jnp.concatenate(
                    [sc[j, 0:1] for j in range(CP)], axis=1
                )  # [1, W]
                scv = jnp.concatenate(
                    [sc[j, 1:2] for j in range(CP)], axis=1
                )
                s = s * sck
            s = s + amask_head
            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)  # zero off own-head columns
            alpha = jnp.exp(m - m_new)
            l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            if use_scale:
                p = p * scv
            pv = jax.lax.dot_general(
                p.astype(q_ref.dtype), v_all.astype(q_ref.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Hq, hd]: zero weights off-head make this exact
            return m_new, l_new, acc * alpha + pv

        init = (
            jnp.full((Hq, 1), _NEG_INF, jnp.float32),
            jnp.zeros((Hq, 1), jnp.float32),
            jnp.zeros((Hq, hd), jnp.float32),
        )
        carry = jax.lax.fori_loop(0, num_full, wide_body, init)

        # tail chunk (present iff bound % Tc != 0): run its DMA pipeline
        # once, then compute page-by-page over only the real pages
        tail_slot = (p0 + num_full) % NS

        @pl.when(num_full < num_chunks)
        def _():
            chunk_patch(num_full, chunk_prologue(num_full))

        def page_body(g, carry2):
            """g = global page index within [num_full*CP, total_pages)."""
            m, l, acc = carry2
            j = g - num_full * CP
            k_page = k_buf[tail_slot, j].reshape(W1, hd)
            v_page = v_buf[tail_slot, j].reshape(W1, hd)
            if k_page.dtype != q_ref.dtype:  # int8/fp8: native upcast
                k_page = k_page.astype(q_ref.dtype)
            s = jax.lax.dot_general(
                q_all, k_page, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Hq, W1]
            if use_scale:
                s = s * sc_buf[tail_slot, j, 0:1]
            # own-head mask + token bound + row validity in one pass (the
            # bound bites only on the final page)
            tok = g * ps + col_t1
            s = jnp.where(
                jnp.logical_and(tok < bound, valid),
                s + amask_head1,
                _NEG_INF,
            )
            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)  # zero off own-head columns
            alpha = jnp.exp(m - m_new)
            l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            if use_scale:
                p = p * sc_buf[tail_slot, j, 1:2]
            pv = jax.lax.dot_general(
                p.astype(q_ref.dtype), v_page.astype(q_ref.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Hq, hd]: zero weights off-head make this exact
            return m_new, l_new, acc * alpha + pv

        if diag != "dmaonly":
            carry = jax.lax.fori_loop(
                num_full * CP, total_pages, page_body, carry
            )
        m, l, acc = carry
        par_ref[0] = (p0 + num_chunks) % NS  # next program's chunk-0 slot
        if fused_store:
            # drain the write-backs before the program ends (the patched
            # sc_buf slot is reused by the next program's chunk DMAs)
            if plane_major_ps:
                pltpu.make_async_copy(
                    kvn_ref.at[0, pl.ds(0, kvh)],
                    kvo_ref.at[page_cur, 0, pl.ds(off * kvh, kvh)],
                    w_sems.at[0],
                ).wait()
                pltpu.make_async_copy(
                    kvn_ref.at[0, pl.ds(kvh, kvh)],
                    kvo_ref.at[page_cur, 1, pl.ds(off * kvh, kvh)],
                    w_sems.at[3],
                ).wait()
            else:
                pltpu.make_async_copy(
                    kvn_ref.at[0], kvo_ref.at[page_cur, off], w_sems.at[0]
                ).wait()
            if has_scale:
                pltpu.make_async_copy(
                    spn_ref.at[0, 0], spo_ref.at[page_cur, off], w_sems.at[1]
                ).wait()
                if use_scale:

                    @pl.when(chunk_cur < num_chunks)
                    def _():
                        slot_cur = (p0 + chunk_cur) % NS
                        pltpu.make_async_copy(
                            sc_buf.at[slot_cur, j_cur],
                            sco_ref.at[page_cur],
                            w_sems.at[2],
                        ).wait()
        o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _decode_kernel_fused(
    # scalar prefetch (same order as _attn_kernel)
    cu_q_blocks_ref,
    kv_lens_ref,
    num_seqs_ref,
    pt_ref,
    # then positionally: q_ref [1, Hq, hd], pos_ref [1, 1, 1],
    # qrid_ref [1, 1, 1], kv_hbm ANY [N, ps*2kvh, hd] (page rows flattened),
    # (sc_hbm ANY [N, 1, ps*2kvh] interleaved scale sidecar — int8 only),
    # output o_ref [1, Hq, hd],
    # scratch kv_buf [2, CP, ps*2kvh, hd], sems [2, CP], par_ref SMEM [1],
    # (sc_buf [2, CP, 1, ps*2kvh], sc_sems [2, CP] — int8 only)
    *refs,
    scale: float,
    pages_per_chunk: int,
    kvh: int,
    has_scale: bool = False,
):
    """Whole-page decode kernel: ONE contiguous DMA per page, both planes.

    The split-plane kernel (_decode_kernel) issues 2 strided DMAs per page
    (each internally ps separate 2KB runs) and its VMEM buffers' (kvh, hd)
    minor dims are sub-tile for bf16/int8. Here the pool page row is DMA'd
    whole — [ps*2kvh, hd] is contiguous in HBM and a whole number of Mosaic
    tiles for EVERY pool dtype and ANY kvh (so high-TP kvh_local geometries
    keep the flat formulation). Scores are one [Hq, hd] x [hd, W2] dot over
    BOTH planes; the head/plane mask -inf's V columns and foreign kv heads,
    and the probability mass is moved K-column -> V-column with a cyclic
    lane roll by kvh (col order t*2kvh + s puts each token's V slots kvh
    lanes after its K slots), making p @ KV_flat exact. 2x redundant MXU
    work on a ~2% utilized unit — free; DMA descriptor count is halved and
    every transfer is a single linear burst.
    """
    if has_scale:
        (q_ref, pos_ref, qrid_ref, kv_hbm, sc_hbm,
         o_ref, kv_buf, sems, par_ref, sc_buf, sc_sems) = refs
    else:
        (q_ref, pos_ref, qrid_ref, kv_hbm,
         o_ref, kv_buf, sems, par_ref) = refs
        sc_hbm = sc_buf = sc_sems = None
    b = pl.program_id(0)
    CP = pages_per_chunk
    _, Hq, hd = q_ref.shape
    R = kv_buf.shape[2]  # ps * 2 * kvh rows per page
    ps = R // (2 * kvh)
    G = Hq // kvh
    Tc = CP * ps
    W2 = CP * R  # both-plane width; col c = token c//(2kvh), slot c%(2kvh)

    run = b < num_seqs_ref[0]

    @pl.when(run)
    def _():
        kv_len = kv_lens_ref[b]
        pos = pos_ref[0, 0, 0]
        bound = jnp.minimum(kv_len, pos + 1)
        num_chunks = pl.cdiv(bound, Tc)

        def start_dma(row, slot, ci):
            for j in range(CP):
                page = pt_ref[row, ci * CP + j]
                pltpu.make_async_copy(
                    kv_hbm.at[page], kv_buf.at[slot, j], sems.at[slot, j]
                ).start()
                if has_scale:
                    pltpu.make_async_copy(
                        sc_hbm.at[page], sc_buf.at[slot, j], sc_sems.at[slot, j]
                    ).start()

        def wait_dma(slot):
            for j in range(CP):
                pltpu.make_async_copy(
                    kv_hbm.at[0], kv_buf.at[slot, j], sems.at[slot, j]
                ).wait()
                if has_scale:
                    pltpu.make_async_copy(
                        sc_hbm.at[0], sc_buf.at[slot, j], sc_sems.at[slot, j]
                    ).wait()

        @pl.when(b == 0)
        def _():
            par_ref[0] = 0
            start_dma(0, 0, 0)

        p0 = par_ref[0]
        valid = qrid_ref[0, 0, 0] == b

        q_f = q_ref[0].astype(jnp.float32) * scale  # [Hq, hd]
        q_all = q_f.astype(q_ref.dtype)

        # static masks: keep K columns (slot s < kvh) of the OWN kv head
        row_kvh = jax.lax.broadcasted_iota(jnp.int32, (Hq, W2), 0) // G
        col_s = jax.lax.broadcasted_iota(jnp.int32, (Hq, W2), 1) % (2 * kvh)
        col_t = jax.lax.broadcasted_iota(jnp.int32, (Hq, W2), 1) // (2 * kvh)
        k_ok = (col_s == row_kvh) & valid
        amask = jnp.where(k_ok, 0.0, _NEG_INF)  # [Hq, W2] f32

        def chunk_body(ci, carry):
            m, l, acc = carry

            @pl.when(ci + 1 < num_chunks)
            def _():
                start_dma(b, (p0 + ci + 1) % 2, ci + 1)

            @pl.when(
                jnp.logical_and(
                    ci + 1 == num_chunks, b + 1 < num_seqs_ref[0]
                )
            )
            def _():
                start_dma(b + 1, (p0 + ci + 1) % 2, 0)

            slot = (p0 + ci) % 2
            wait_dma(slot)
            kv_all = kv_buf[slot].reshape(W2, hd)
            if kv_all.dtype != q_ref.dtype:
                kv_all = kv_all.astype(q_ref.dtype)

            s = jax.lax.dot_general(
                q_all, kv_all, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Hq, W2]
            if has_scale:
                sc_row = jnp.concatenate(
                    [sc_buf[slot, j] for j in range(CP)], axis=1
                )  # [1, W2]; lane c = scale of (token, slot) col c
                s = s * sc_row
            s = s + amask
            s = jax.lax.cond(
                ci + 1 == num_chunks,
                lambda s: jnp.where(ci * Tc + col_t < bound, s, _NEG_INF),
                lambda s: s,
                s,
            )
            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)  # nonzero only at own-head K columns
            alpha = jnp.exp(m - m_new)
            l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            # move each token's probability from its K column to its V
            # column (kvh lanes later); V-column zeros roll harmlessly into
            # the next token's K slots
            p_v = pltpu.roll(p, kvh, 1)
            if has_scale:
                p_v = p_v * sc_row
            pv = jax.lax.dot_general(
                p_v.astype(q_ref.dtype), kv_all,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Hq, hd]; zero weight on K rows makes this exact
            return m_new, l_new, acc * alpha + pv

        init = (
            jnp.full((Hq, 1), _NEG_INF, jnp.float32),
            jnp.zeros((Hq, 1), jnp.float32),
            jnp.zeros((Hq, hd), jnp.float32),
        )
        m, l, acc = jax.lax.fori_loop(0, num_chunks, chunk_body, init)
        par_ref[0] = (p0 + num_chunks) % 2
        o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def pallas_ragged_paged_attention(
    q: jax.Array,  # [T, Hq, hd]
    kv,  # ops.kv.KV: pool [N, ps, 2*kvh, hd] (+ int8 scale sidecar)
    meta: AttnMetadata,
    *,
    scale: float,
    block_q: int,
    pages_per_chunk: int = 8,
    interpret: bool = False,
    plane_major_ps: int = 0,
    fused_page: bool = False,
    new_kv=None,  # (k [T,kvh,hd], v [T,kvh,hd], out_slots_abs [T]) or None
):
    """Returns o [T, Hq, hd]; with ``new_kv`` returns (o, kv) after storing
    the new tokens' KV — fused into the decode kernel when the flat
    split-plane path applies, via ops.kv.store_kv otherwise."""
    orig_kwargs = dict(
        scale=scale, block_q=block_q, pages_per_chunk=pages_per_chunk,
        interpret=interpret, plane_major_ps=plane_major_ps,
        fused_page=fused_page,
    )
    kv_pool = kv.data
    T, Hq, hd = q.shape
    if (
        not fused_page
        and not plane_major_ps
        and block_q == 1
        and kv_pool.ndim == 4
        and kv.scale is None
        and jnp.dtype(kv_pool.dtype).itemsize < 4
        and (kv_pool.shape[2] // 2) % 8 != 0
    ):
        # kvh_local not sublane-aligned for the split-plane DMA (high-TP
        # geometries): route decode to the fused whole-page kernel, which
        # works for any kvh, instead of the slow per-head general kernel.
        # (Scaled int8 pools still fall back: the fused kernel needs the
        # interleaved sidecar the engine does not store.)
        fused_page = True
    if fused_page:
        # whole-page kernel (_decode_kernel_fused): flatten page rows; the
        # reshape of a contiguous [N, ps, 2kvh, hd] pool is a free bitcast
        assert block_q == 1, "fused-page kernel is decode-only"
        N, ps, kvh2, _ = kv_pool.shape
        kv_pool = kv_pool.reshape(N, ps * kvh2, hd)
        use_flat_decode = True
    elif plane_major_ps:
        # plane-major flattened pool [N, 2, ps*kvh, hd]: K/V planes are
        # contiguous page rows and the VMEM buffers' minor dims (ps*kvh, hd)
        # are whole Mosaic tiles for every pool dtype. Decode takes the
        # flat kernel; prefill/extend (BQ > 1) take the general kernel
        # with split per-plane buffers.
        N, _two, S, _ = kv_pool.shape
        assert _two == 2 and S % plane_major_ps == 0, kv_pool.shape
        ps = plane_major_ps
        kvh2 = 2 * (S // ps)
        use_flat_decode = block_q == 1
    else:
        N, ps, kvh2, _ = kv_pool.shape
        # The flat decode kernel DMAs the K and V PLANES of each page
        # separately (kv_hbm.at[page, :, 0:kvh, :]): a slice along the pool's
        # second-minor dim, which Mosaic only lowers when offset/size land on
        # its sublane tile for that dim. Measured on v5e: f32 slices at any
        # kvh lower fine; bf16/int8 need kvh % 8 == 0 (int8 kvh=4 is rejected
        # with "must be aligned to tiling (8)"). Misaligned geometries (e.g.
        # small kvh_local at high TP) take the general kernel, which DMAs
        # whole pages and splits in VMEM.
        sub = 1 if jnp.dtype(kv_pool.dtype).itemsize == 4 else 8
        use_flat_decode = block_q == 1 and (kvh2 // 2) % sub == 0
    # the kernels consume different sidecar layouts (ops/kv.py): flat
    # decode scales the flattened score row, the general kernel dequantizes
    # the K/V chunk data via the 128-lane prefill sidecar, and the fused
    # whole-page kernel wants the interleaved [N, 1, ps*2kvh] row
    kv_scale = kv.scale if use_flat_decode else kv.scale_p
    has_scale = kv_scale is not None
    if fused_page and has_scale:
        assert kv_scale.ndim == 3 and kv_scale.shape[1] == 1, (
            "fused-page kernel needs the interleaved scale sidecar "
            "[N, 1, page_size*2*kvh]", kv_scale.shape,
        )
    elif has_scale and use_flat_decode and not interpret:
        SW = kv_scale.shape[-1]
        assert SW % 128 == 0, (
            f"int8 KV with the pallas decode kernel needs page_size * "
            f"kv_heads_local ({SW}) % 128 == 0; adjust --page-size"
        )
    store_fused = (
        new_kv is not None
        and use_flat_decode
        and not fused_page
        # plane pools: the fused store needs kvh-row-block writes at
        # sublane offsets off*kvh — aligned only when kvh is a whole
        # sublane tile
        and (not plane_major_ps or (kv_pool.shape[2] // plane_major_ps) % 8 == 0)
    )
    if new_kv is not None and not store_fused:
        # geometry outside the flat decode path (prefill/extend, fused-page,
        # plane-major, misaligned kvh): store first, attend after
        from minisgl_tpu.attention import _max_store_runs
        from minisgl_tpu.ops.kv import store_kv

        k_new, v_new, slots = new_kv
        kv = store_kv(
            kv, 0, 1, slots, k_new, v_new,
            max_runs=_max_store_runs(kv, meta, k_new),
        )
        o = pallas_ragged_paged_attention(q, kv, meta, **orig_kwargs)
        return o, kv

    B, PB = meta.page_table.shape
    BQ = block_q
    assert T % BQ == 0, (T, BQ)
    CP = min(pages_per_chunk, PB)
    assert PB % CP == 0, (PB, CP)
    n_blocks = T // BQ

    if use_flat_decode:
        # decode kernels: one program per (seq, 1) — every program is real
        max_q_blocks = 1 if BQ == 1 and T == B else n_blocks
        grid = (B, max_q_blocks)
        cu_q_blocks = meta.cu_q_lens // BQ  # [B+1], builder aligns segments
        first_prefetch = cu_q_blocks

        def _block_idx(b, iq, cu, kl, ns, pt):
            # skipped programs are routed to the trailing garbage block so
            # they never clobber real output when the pipeline flushes
            run = jnp.logical_and(b < ns[0], cu[b] + iq < cu[b + 1])
            return jnp.where(run, cu[b] + iq, n_blocks)

        def _blocked(*tail):
            return pl.BlockSpec(
                tail, lambda b, iq, cu, kl, ns, pt: (
                    (_block_idx(b, iq, cu, kl, ns, pt),) + (0,) * (len(tail) - 1)
                ),
            )
    else:
        # general (prefill/extend) kernel: FLAT grid, one program per q
        # block, block index == program id. The owning seq rides a
        # prefetched block->seq map (-1 for whole-block padding); the
        # former (B_pad, n_blocks) grid wasted ~(B-1)/B of all block
        # traffic on dead programs (io-only diagnostic, BENCHLOG round 3).
        # Segments are BQ-aligned by the builder, so a block never
        # straddles two segments and its first token names its seq.
        grid = (n_blocks,)
        first_prefetch = meta.q_req_ids[::BQ].astype(jnp.int32)

        def _blocked(*tail):
            return pl.BlockSpec(
                tail, lambda i, bs, kl, ns, pt: (i,) + (0,) * (len(tail) - 1)
            )

    _any = pl.BlockSpec(memory_space=pltpu.ANY)
    o_spec = _blocked(BQ, Hq, hd)

    # fused store (flat decode only): new-KV row inputs ride blocked specs;
    # the pools become aliased ANY outputs the kernel writes back into
    n_alias = 0
    fused_in_specs = []
    if store_fused:
        from minisgl_tpu.ops.kv import SCALE_P_LANES

        n_alias = 3 if has_scale else 1
        fused_in_specs = [_blocked(BQ, kvh2, hd)]
        if has_scale:
            fused_in_specs += [
                _blocked(1, 2, SCALE_P_LANES),
                _blocked(1, 1, SCALE_P_LANES),
            ]

    # buffer slot count: the split-plane decode kernel triple-buffers so the
    # next sequence's chunk-0 prefetch can be issued one chunk ahead (see
    # _decode_kernel chunk_prologue); other kernels keep classic double
    # buffering
    NSLOTS = 3 if (use_flat_decode and not fused_page) else 2
    if os.environ.get("MSLT_DECODE_NSLOTS"):  # A/B experiments only
        NSLOTS = int(os.environ["MSLT_DECODE_NSLOTS"])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=[
            _blocked(BQ, Hq, hd),
            _blocked(1, BQ, 1),
            _blocked(1, BQ, 1),
        ]
        + fused_in_specs
        + [_any]
        + ([_any] if has_scale else [])
        + ([_any] if store_fused and has_scale else []),
        out_specs=o_spec if n_alias == 0 else [o_spec] + [_any] * n_alias,
        scratch_shapes=(
            [  # fused-page decode: one whole-page buffer (tile-exact for
                # every dtype: minor dims (ps*2kvh, hd))
                pltpu.VMEM((2, CP) + kv_pool.shape[1:], kv_pool.dtype),
                pltpu.SemaphoreType.DMA((2, CP)),
                pltpu.SMEM((1,), jnp.int32),
            ]
            if fused_page
            else [  # decode: split K/V planes (see _decode_kernel)
                pltpu.VMEM(
                    (NSLOTS, CP, ps * (kvh2 // 2), hd)
                    if plane_major_ps
                    else (NSLOTS, CP, ps, kvh2 // 2, hd),
                    kv_pool.dtype,
                ),
                pltpu.VMEM(
                    (NSLOTS, CP, ps * (kvh2 // 2), hd)
                    if plane_major_ps
                    else (NSLOTS, CP, ps, kvh2 // 2, hd),
                    kv_pool.dtype,
                ),
                pltpu.SemaphoreType.DMA((NSLOTS, CP, 2)),
                pltpu.SMEM((1,), jnp.int32),
            ]
            if use_flat_decode
            else (
                [  # plane pool: split per-plane whole-tile buffers
                    pltpu.VMEM((2, CP, ps * (kvh2 // 2), hd), kv_pool.dtype),
                    pltpu.VMEM((2, CP, ps * (kvh2 // 2), hd), kv_pool.dtype),
                    pltpu.SemaphoreType.DMA((2, CP, 2)),
                ]
                if plane_major_ps
                else [
                    pltpu.VMEM((2, CP, ps, kvh2, hd), kv_pool.dtype),
                    pltpu.SemaphoreType.DMA((2, CP)),
                ]
            )
        )
        + (
            [  # int8 pool: per-page scale rows ride their own DMA queue
                pltpu.VMEM(
                    (NSLOTS, CP) + tuple(kv_scale.shape[1:]), jnp.float32
                ),
                pltpu.SemaphoreType.DMA((NSLOTS, CP)),
            ]
            if has_scale
            else []
        )
        + (
            # plane pools write K and V back separately (sem 3 = V)
            [pltpu.SemaphoreType.DMA((4 if plane_major_ps else 3,))]
            if store_fused
            else []
        ),
    )

    # One trailing garbage block absorbs skipped programs' flushes — but
    # ONLY the flat decode grid routes any program there (its _block_idx
    # maps non-runnable programs to block n_blocks). The general
    # (prefill/extend) grid indexes blocks by program id and never touches
    # a pad block, and its dead programs' flushes land in the q bucket's
    # own padding rows, which no consumer reads. Skipping the pad there
    # removes a concatenate + slice that COPIED the whole activation
    # twice per layer: measured round 4 as 428 of 461 ms/step of the
    # driver-shaped prefill (io-diagnostic floor, 14 x 584-token rows —
    # the entire prefill-vs-roofline gap VERDICT #3 chased).
    pad = BQ if use_flat_decode else 0
    if pad:
        q_in = jnp.concatenate(
            [q, jnp.zeros((pad, Hq, hd), q.dtype)], axis=0
        )
        pos_in = jnp.concatenate(
            [meta.positions, jnp.zeros((pad,), meta.positions.dtype)]
        ).reshape(n_blocks + 1, BQ, 1)
        qrid_in = jnp.concatenate(
            [meta.q_req_ids, jnp.full((pad,), -1, meta.q_req_ids.dtype)]
        ).reshape(n_blocks + 1, BQ, 1)
    else:
        q_in = q
        pos_in = meta.positions.reshape(n_blocks, BQ, 1)
        qrid_in = meta.q_req_ids.reshape(n_blocks, BQ, 1)

    fused_inputs = []
    if store_fused:
        from minisgl_tpu.ops.kv import SCALE_P_LANES, pack_kv, quantize_kv_rows

        k_new, v_new, _slots = new_kv
        kvn = pack_kv(k_new, v_new)
        if has_scale:
            kvn, nscale = quantize_kv_rows(kvn)  # int8 + [T, 2kvh] f32
            kvh = kvh2 // 2
            scn = jnp.zeros((T, 2, SCALE_P_LANES), jnp.float32)
            scn = jax.lax.dynamic_update_slice(
                scn, nscale.reshape(T, 2, kvh), (0, 0, 0)
            )
            spn = jnp.zeros((T, 1, SCALE_P_LANES), jnp.float32)
            spn = jax.lax.dynamic_update_slice(
                spn, nscale[:, None, :], (0, 0, 0)
            )
        else:
            kvn = kvn.astype(kv_pool.dtype)
        fused_inputs = [
            jnp.concatenate(
                [kvn, jnp.zeros((pad,) + kvn.shape[1:], kvn.dtype)]
            )
        ]
        if has_scale:
            fused_inputs += [
                jnp.concatenate([scn, jnp.zeros((pad, 2, SCALE_P_LANES), jnp.float32)]),
                jnp.concatenate([spn, jnp.zeros((pad, 1, SCALE_P_LANES), jnp.float32)]),
            ]

    if fused_page:
        kernel = functools.partial(
            _decode_kernel_fused,
            scale=scale,
            pages_per_chunk=CP,
            kvh=kvh2 // 2,
            has_scale=has_scale,
        )
    elif use_flat_decode:
        pass  # os imported at module top

        kernel = functools.partial(
            _decode_kernel,
            scale=scale,
            pages_per_chunk=CP,
            diag=os.environ.get("MSLT_DECODE_DIAG", ""),
            has_scale=has_scale,
            plane_major_ps=plane_major_ps,
            fused_store=store_fused,
        )
    else:
        pass  # os imported at module top

        kernel = functools.partial(
            _attn_kernel,
            scale=scale,
            block_q=BQ,
            pages_per_chunk=CP,
            has_scale=has_scale,
            plane_major_ps=plane_major_ps,
            diag=os.environ.get("MSLT_PREFILL_DIAG", ""),
        )
    o_shape = jax.ShapeDtypeStruct((T + pad, Hq, hd), q.dtype)
    if store_fused:
        out_shape = [o_shape, jax.ShapeDtypeStruct(kv_pool.shape, kv_pool.dtype)]
        pool_args = [kv_pool]
        # operand index of kv_pool counting the 4 scalar-prefetch args,
        # q/pos/qrid, and the fused new-KV inputs
        pool_op = 7 + len(fused_inputs)
        aliases = {pool_op: 1}
        if has_scale:
            out_shape += [
                jax.ShapeDtypeStruct(kv_scale.shape, kv_scale.dtype),
                jax.ShapeDtypeStruct(kv.scale_p.shape, kv.scale_p.dtype),
            ]
            pool_args += [kv_scale, kv.scale_p]
            aliases.update({pool_op + 1: 2, pool_op + 2: 3})
    else:
        out_shape = o_shape
        pool_args = [kv_pool] + ([kv_scale] if has_scale else [])
        aliases = {}
    # NB "parallel" dimension semantics for the general grid (independent
    # programs, distinct o blocks) was A/B'd in round 5 and measured
    # IDENTICAL to "arbitrary" (io-floor 151.3 both ways): the ~8 us/program
    # pipeline cost is not iteration fencing.
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * len(grid),
        ),
    )(
        first_prefetch,
        meta.seq_lens,
        meta.num_seqs,
        meta.page_table,
        q_in,
        pos_in,
        qrid_in,
        *fused_inputs,
        *pool_args,
    )
    if store_fused:
        from minisgl_tpu.ops.kv import KV

        if has_scale:
            o, new_pool, new_scale, new_scale_p = outs
            return o[:T], KV(new_pool, new_scale, new_scale_p)
        o, new_pool = outs
        return o[:T], KV(new_pool)
    return outs[:T]


# alignment the host batch builder must apply to each sequence's query
# segment for the prefill kernel's block index maps to be expressible
QUERY_ALIGN = {"pallas": 64, "rpa": 1, "xla": 1}


def default_pages_per_chunk(page_size: int, phase: str) -> int:
    """Per-phase DMA chunk sizing (tokens per double-buffered chunk).

    Slope-timed A/B on v5e (benchmark/kernels/bench_decode_layout.py,
    BENCHLOG round 2): decode wants ~512-token chunks — at page_size 128,
    cp=4 reads int8 KV at 599 GB/s vs 430 at cp=2 — while prefill keeps the
    round-1-tuned 128-token chunks (its VMEM budget is dominated by the
    [BQ, Hq, hd] query block and 2x wider whole-page buffers). Prefill
    never drops below 2 pages per chunk: cp=1 leaves a single DMA in
    flight and the e2e bench lost ~8% at page_size 128 to the exposed
    latency.

    Decode chunks are 512 tokens only where the DMA is page-GATED
    (ps >= 64): ungated small-page chunks round every sequence's reads up
    to Tc, so a 513-token row at Tc=512 fetches 1024 — measured round 4
    as 23.1 ms/step vs 16.7 at 128-token chunks (ps=16 int8, bs=128,
    kv=512; the small-page DMA stream is latency-bound anyway, so the
    coarser chunking buys no bandwidth back)."""
    if phase == "decode":
        if page_size >= 64:  # gated DMA: no rounding waste
            return max(1, 512 // page_size)
        return max(1, 128 // page_size)
    return max(2, 128 // page_size)


def make_pallas_attention(*, page_size: int, scale: float, phase: str):
    from minisgl_tpu.env import ENV

    block_q = QUERY_ALIGN["pallas"] if phase == "prefill" else 1
    cp = ENV.PAGES_PER_CHUNK or default_pages_per_chunk(page_size, phase)

    def impl(q, kv, meta: AttnMetadata, new_kv=None):
        # plane-major pools (ops/kv.py is_plane) carry the page size
        # implicitly; the engine's configured page_size closes over here
        plane_ps = page_size if kv.data.shape[1] == 2 else 0
        return pallas_ragged_paged_attention(
            q, kv, meta, scale=scale, block_q=block_q, pages_per_chunk=cp,
            new_kv=new_kv, plane_major_ps=plane_ps,
        )

    return impl
