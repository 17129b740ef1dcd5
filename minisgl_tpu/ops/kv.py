"""Paged KV pool layout and scatter update.

TPU-native equivalent of the reference's MHA pool + store.cu scatter kernel
(/root/reference/python/minisgl/kvcache/mha_pool.py:28-56,
kernel/csrc/jit/store.cu:28-53). Layout decisions:

- ONE combined pool for all layers, in one of two layouts (see the KV
  class docstring; ``is_plane`` tells them apart by shape):
  * plane-major ``[L * P, 2, page_size * kvh, hd]`` (serving default,
    round 4): each page's K (or V) plane is ONE contiguous DMA and a
    token's per-plane ``[kvh, hd]`` row block stays contiguous for the
    store paths;
  * head-blocked ``[L * P, page_size, 2 * kv_heads_eff, head_dim]``
    (legacy; rpa vendor backend): K/V occupy BLOCKS on the heads axis
    (K at ``[:kvh]``, V at ``[kvh:]``) so a page row is one contiguous
    DMA of every head's K AND V, but per-PLANE reads are strided.
  ``P`` is the per-layer page count (page 0 of each layer is the reserved
  dummy page); folding the layer into the page index means the per-layer
  "slice" is just an integer offset ``layer_id * P`` added to the page
  table, so the lax.scan over layers never slices (= never copies) the
  pool.
- Sharded P(None, None, "model", None): heads over the TP axis, each chip
  owning the full page space for its local heads (the same invariant as the
  reference's per-rank pool, mha_pool.py:27).
- Padded batch rows read page 0 and padded new tokens scatter into page 0's
  slot 0 (reference dummy req/page trick, engine.py:89-98).

int8 pools carry TWO per-(token, head) scale sidecars, because Mosaic DMA
slices must be 128-lane aligned and the decode vs prefill kernels consume
scales along opposite axes:

- ``scale``  [L*P, 2, SW]  with SW = page_size * kvh (planes K=0, V=1; lane
  ``off*kvh + h``).  The lane order IS the decode kernel's flattened score
  column order, so per-chunk dequant is a lane-concat of whole-page rows.
  On real TPU the pallas decode path requires SW % 128 == 0 (pick page_size
  so page_size * kvh_local is a lane multiple; 16 * 8 = 128 for the
  Llama/Qwen GQA geometry).  Under TP the GLOBAL lane dim is tp * SW_local
  sharded on the model axis — a per-shard container, not a globally
  meaningful order (only shard_map-local code ever reads it).
- ``scale_p`` [L*P, page_size, 128]  (token in SUBLANES, head in lanes:
  lane h = K-scale of head h, lane kvh + h = V-scale; rest zero).  The
  prefill kernel extracts head columns with a [Tc, 128] @ [128, 1] one-hot
  dot and multiplies them into the K/V chunk data.  Under TP the global
  lane dim is tp * 128, sharded on the model axis.

Write paths by size (store_kv):
- decode-sized (T <= 256): Pallas DMA store (store_pallas.py) or the
  in-kernel fused store (attention/pallas_backend.py);
- prefill-sized (T > 256, callers pass ``max_runs``): page-RUN batched
  store (_store_runs) — gather each touched page block once, merge, and
  scatter whole blocks back. The naive token scatter's cost scales with
  the POOL (XLA relayout-heavy updates: ~275 ms of a 459 ms prefill step,
  BENCHLOG round 5); the run store is O(pages touched) (~0.25 ms).
All updates run on donated pools, so XLA performs them in place.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

SCALE_P_LANES = 128  # lane width of the prefill scale sidecar


class KV(NamedTuple):
    """The paged KV pool as one pytree: data + (for int8 pools) the
    per-(token, head) scale sidecars. ``scale``/``scale_p`` are None for
    bf16/f32/fp8 pools, so the pytree structure itself encodes the storage
    mode and every jitted step specializes on it.

    ``data`` comes in one of two layouts (``plane_kvh`` tells them apart):

    - head-blocked ``[L*P, page_size, 2*kvh, hd]`` (legacy): one page row
      is one contiguous DMA of every head's K AND V, but the decode
      kernel's per-PLANE reads are strided 2*hd-byte runs;
    - plane-major ``[L*P, 2, page_size*kvh, hd]`` (serving default,
      round 4): plane row ``t*kvh + h`` — each page's K (or V) plane is
      ONE contiguous DMA, measured 1.7x faster decode streaming on v5e
      (benchmark/kernels/bench_decode_layout.py: 139.5 vs 235.9 us/call,
      int8 ps=128), and a token's per-plane row block ``[kvh, hd]`` stays
      contiguous for the store paths. The flat decode scale sidecar's
      lane order (off*kvh + h) equals the plane row order by design."""

    data: jax.Array  # [L*P, page_size, 2*kvh, hd] | [L*P, 2, ps*kvh, hd]
    scale: Optional[jax.Array] = None  # [L*P, 2, page_size*kvh] f32
    scale_p: Optional[jax.Array] = None  # [L*P, page_size, 128] f32


def is_plane(kv_data: jax.Array) -> bool:
    """True if ``kv_data`` is the plane-major layout.

    Distinguisher: a head-blocked pool's axis 1 is page_size, a plane
    pool's is exactly 2 — which is why page_size == 2 is RESERVED for
    every pool layout (``pool_page_size`` rejects it loudly; a
    head-blocked ps=2 pool would be silently misread as plane-major by
    every store/attention path). Shape-only, so it works on
    ShapeDtypeStructs too."""
    return kv_data.shape[1] == 2


def pool_page_size(kv_data: jax.Array, kvh: int) -> int:
    """Tokens per page for either layout (kvh = local kv heads).

    Rejects the ambiguous geometry outright: a [N, 2, 2*kvh, hd] shape is
    EITHER a plane pool with page_size 2 or a head-blocked pool with
    page_size 2, and the two address tokens differently — so page_size 2
    is reserved at every entry point, not just the engine's allocator
    (advisor, round 4: direct/test/library callers were unguarded)."""
    if kv_data.shape[1] == 2:
        ps = kv_data.shape[2] // kvh
        if ps == 2:
            raise ValueError(
                f"ambiguous KV pool shape {tuple(kv_data.shape)} with "
                f"kvh={kvh}: page_size 2 is reserved (plane-major vs "
                f"head-blocked layouts become indistinguishable); use "
                f"page_size >= 4"
            )
        return ps
    return kv_data.shape[1]


def pack_kv(k_new: jax.Array, v_new: jax.Array) -> jax.Array:
    """[T, kvh, hd] x2 -> [T, 2*kvh, hd] with K at [:kvh], V at [kvh:]."""
    return jnp.concatenate([k_new, v_new], axis=1)


def quantize_kv_rows(
    kv_new: jax.Array,  # [T, 2*kvh, hd] f32/bf16
) -> tuple[jax.Array, jax.Array]:
    """Per-(token, head) symmetric int8: scale = amax(|row|)/127 over hd.

    The v5e formulation of low-precision KV: the chip has no native fp8, so
    e4m3 casts are emulated bit surgery in the kernel hot loop (measured as a
    net regression, BENCHLOG round 1); int8<->bf16 converts are native, and
    the per-row scales are applied inside the attention kernels (scores for
    decode, K/V chunk data for prefill).
    """
    amax = jnp.max(jnp.abs(kv_new.astype(jnp.float32)), axis=-1)  # [T, 2kvh]
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(
        jnp.round(kv_new.astype(jnp.float32) / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def scatter_kv_scales(
    kv: KV, rows: jax.Array, offs: jax.Array, scale: jax.Array  # [T, 2kvh]
) -> KV:
    """Write per-token scales into both sidecars (layouts in module doc)."""
    T = scale.shape[0]
    kvh = scale.shape[1] // 2
    # decode sidecar: planes [T, 2, kvh] at lane off*kvh + h
    planes = scale.reshape(T, 2, kvh)
    lanes = offs[:, None] * kvh + jnp.arange(kvh, dtype=offs.dtype)[None, :]
    # advanced indices ([T,1] rows, [T,kvh] lanes) land in front: [T, kvh, 2]
    new_scale = kv.scale.at[rows[:, None], :, lanes].set(
        planes.transpose(0, 2, 1), mode="promise_in_bounds"
    )
    # prefill sidecar: one [128] lane row per token (K heads, V heads, pad)
    row_vals = jnp.zeros((T, SCALE_P_LANES), jnp.float32)
    row_vals = jax.lax.dynamic_update_slice(row_vals, scale, (0, 0))
    new_scale_p = kv.scale_p.at[rows, offs].set(
        row_vals, mode="promise_in_bounds"
    )
    return KV(kv.data, new_scale, new_scale_p)


def _store_runs(
    kv: KV,
    rows: jax.Array,  # [T] global pool row (page) per token
    offs: jax.Array,  # [T] within-page offset per token
    kv_new: jax.Array,  # [T, 2*kvh, hd] already in pool dtype
    scale,  # [T, 2*kvh] f32 or None
    page_size: int,
    max_runs: int,
) -> KV:
    """Page-run batched store for prefill-sized writes.

    The round-4 token-scatter cost ~276 ms of a 459 ms prefill step
    (BENCHLOG round 5 prefill decomposition): scattering T~8k individual
    rows into the multi-GB pool forces XLA into relayout-heavy updates
    whose cost scales with the pool, not the written rows. This path
    exploits the batch builder's structural guarantee — the tokens that
    write one page form ONE contiguous token-index run with offsets
    ascending by 1, and no two requests share a page — to rewrite the
    store as: detect the <= max_runs page runs, GATHER each touched page
    block once, merge the new rows in registers, and SCATTER whole page
    blocks back (unique leading-dim indices -> in-place with donation).
    Traffic becomes O(pages touched), ~40 MB instead of a pool-scaled
    scatter.

    Padding tokens (all targeting a dummy page's slot 0) form runs whose
    writes land in the dummy page — garbage there is the engine's
    convention. Unused run slots point at page 0 with an all-False row
    mask, writing its old content back (benign, possibly duplicated)."""
    T = rows.shape[0]
    ps = page_size
    kvh = kv_new.shape[1] // 2
    hd = kv_new.shape[2]
    t_ar = jnp.arange(T, dtype=jnp.int32)
    flag = jnp.concatenate(
        [jnp.ones((1,), bool), rows[1:] != rows[:-1]]
    )
    run_idx = (jnp.cumsum(flag) - 1).astype(jnp.int32)
    PW = max_runs
    BIG = jnp.int32(1 << 30)
    run_page = (
        jnp.zeros((PW,), jnp.int32)
        .at[run_idx]
        .max(jnp.where(flag, rows, -1), mode="drop")
    )
    run_t0 = (
        jnp.full((PW,), BIG, jnp.int32)
        .at[run_idx]
        .min(jnp.where(flag, t_ar, BIG), mode="drop")
    )
    run_off0 = (
        jnp.full((PW,), BIG, jnp.int32)
        .at[run_idx]
        .min(jnp.where(flag, offs, BIG), mode="drop")
    )
    # runs are assigned in token order, so the next run's start bounds this
    # run's token range; the last (and every unused) run bounds at T
    run_t1 = jnp.minimum(
        jnp.concatenate([run_t0[1:], jnp.full((1,), T, jnp.int32)]), T
    )
    run_len = jnp.clip(run_t1 - run_t0, 0, ps)
    base = jnp.clip(run_t0 - run_off0, -ps, T)  # token idx writing off 0
    idx = base[:, None] + jnp.arange(ps, dtype=jnp.int32)[None, :] + ps
    zpad = jnp.zeros((ps,) + kv_new.shape[1:], kv_new.dtype)
    blocks = jnp.take(
        jnp.concatenate([zpad, kv_new, zpad]), idx, axis=0
    )  # [PW, ps, 2kvh, hd]
    ar = jnp.arange(ps, dtype=jnp.int32)[None, :]
    valid = (ar >= run_off0[:, None]) & (
        ar < run_off0[:, None] + run_len[:, None]
    )  # [PW, ps]

    pool = kv.data
    if is_plane(pool):
        kblk = blocks[:, :, :kvh, :].reshape(PW, ps * kvh, hd)
        vblk = blocks[:, :, kvh:, :].reshape(PW, ps * kvh, hd)
        new = jnp.stack([kblk, vblk], axis=1)  # [PW, 2, ps*kvh, hd]
        old = jnp.take(pool, run_page, axis=0)
        m = jnp.repeat(valid, kvh, axis=1)[:, None, :, None]
        data = pool.at[run_page].set(jnp.where(m, new, old), mode="drop")
    else:
        old = jnp.take(pool, run_page, axis=0)  # [PW, ps, 2kvh, hd]
        m = valid[:, :, None, None]
        data = pool.at[run_page].set(jnp.where(m, blocks, old), mode="drop")
    if scale is None:
        return KV(data, kv.scale, kv.scale_p)

    szpad = jnp.zeros((ps,) + scale.shape[1:], scale.dtype)
    sblk = jnp.take(
        jnp.concatenate([szpad, scale, szpad]), idx, axis=0
    )  # [PW, ps, 2kvh] f32
    # decode sidecar [N, 2, ps*kvh], lane order off*kvh + h per plane
    sk = sblk[:, :, :kvh].reshape(PW, ps * kvh)
    sv = sblk[:, :, kvh:].reshape(PW, ps * kvh)
    new_sc = jnp.stack([sk, sv], axis=1)  # [PW, 2, ps*kvh]
    old_sc = jnp.take(kv.scale, run_page, axis=0)
    m_sc = jnp.repeat(valid, kvh, axis=1)[:, None, :]
    new_scale = kv.scale.at[run_page].set(
        jnp.where(m_sc, new_sc, old_sc), mode="drop"
    )
    # prefill sidecar [N, ps, 128]: scale row in the first 2*kvh lanes
    new_sp = jnp.pad(sblk, ((0, 0), (0, 0), (0, SCALE_P_LANES - 2 * kvh)))
    old_sp = jnp.take(kv.scale_p, run_page, axis=0)
    new_scale_p = kv.scale_p.at[run_page].set(
        jnp.where(valid[:, :, None], new_sp, old_sp), mode="drop"
    )
    return KV(data, new_scale, new_scale_p)


def store_kv(
    kv: KV,  # combined pool (+ scale sidecars for int8 pools)
    layer_id: jax.Array | int,
    pages_per_layer: int,
    out_slots: jax.Array,  # [T] token slots within the layer's page space
    k_new: jax.Array,  # [T, kvh, hd]
    v_new: jax.Array,
    max_runs: int | None = None,  # enables the page-run path for big T
) -> KV:
    """Scatter new KV rows (and, for int8 pools, their scales) in place."""
    kv_pool = kv.data
    kvh = k_new.shape[1]
    plane = is_plane(kv_pool)
    page_size = pool_page_size(kv_pool, kvh)
    rows = layer_id * pages_per_layer + out_slots // page_size
    offs = out_slots % page_size
    kv_new = pack_kv(k_new, v_new)
    if kv.scale is not None:
        assert kv_pool.dtype == jnp.int8
        kv_new, scale = quantize_kv_rows(kv_new)  # [T, 2kvh] scale
    else:
        kv_new = kv_new.astype(kv_pool.dtype)
    T = kv_new.shape[0]

    def xla_scatter(pool):
        if not plane:
            return pool.at[rows, offs].set(kv_new, mode="promise_in_bounds")
        # plane pool [N, 2, ps*kvh, hd], row order t*kvh + h: viewed as
        # [N*2*ps, kvh, hd] a token's K block is group rows*2*ps + offs and
        # its V block is that + ps — two contiguous [kvh, hd] row blocks
        N, _, S, hd = pool.shape
        flat = pool.reshape(N * 2 * page_size, kvh, hd)
        kr = rows * (2 * page_size) + offs
        flat = flat.at[kr].set(kv_new[:, :kvh], mode="promise_in_bounds")
        flat = flat.at[kr + page_size].set(
            kv_new[:, kvh:], mode="promise_in_bounds"
        )
        return flat.reshape(pool.shape)

    # the Pallas plane store DMAs [kvh, hd] blocks at sublane offset
    # off*kvh — only tileable when kvh is a whole sublane tile; smaller
    # kvh (high TP) takes the XLA scatter
    force_xla = plane and kvh % 8 != 0
    # prefill-sized writes with run metadata: page-run batched store (the
    # token-scatter's cost scales with the POOL — ~276 ms of a 459 ms
    # prefill step, round-5 BENCHLOG decomposition)
    use_runs = max_runs is not None and T > 256
    if kv.scale is not None:
        if use_runs:
            return _store_runs(
                kv, rows, offs, kv_new, scale, page_size, max_runs
            )
        if force_xla or jax.default_backend() == "cpu" or T > 256:
            # XLA scatter: CPU/tests, and large prefill writes (one DMA per
            # token would serialize ~8k transfers)
            return scatter_kv_scales(
                KV(xla_scatter(kv_pool), kv.scale, kv.scale_p),
                rows, offs, scale,
            )
        # decode-sized writes: Pallas DMA for the data rows + the 128-lane
        # scale_p rows (the XLA scatter on the multi-GB pool measured ~3 ms
        # per step at bs=128, round-3 ablation); only the narrow decode
        # sidecar — a [2, kvh] lane slice Mosaic DMA can't address — keeps
        # the XLA scatter, on its small operand
        from minisgl_tpu.ops.store_pallas import pallas_store_kv_scaled

        row_vals = jnp.zeros((T, SCALE_P_LANES), jnp.float32)
        row_vals = jax.lax.dynamic_update_slice(row_vals, scale, (0, 0))
        new_pool, new_scale_p = pallas_store_kv_scaled(
            kv_pool, kv.scale_p, rows, offs, kv_new, row_vals
        )
        # lane-index scatter: measured 2.4 ms/step at bs=128 — the LEAST bad
        # XLA formulation (contiguous-window reshapes to [.., kvh]-minor
        # shapes force whole-array relayouts: 380 and 652 ms/step in the
        # round-3 ablation). The real fix is fusing this write into the
        # decode attention kernel (which already holds the row in VMEM).
        planes = scale.reshape(T, 2, kvh)
        lanes = offs[:, None] * kvh + jnp.arange(kvh, dtype=offs.dtype)[None, :]
        new_scale = kv.scale.at[rows[:, None], :, lanes].set(
            planes.transpose(0, 2, 1), mode="promise_in_bounds"
        )
        return KV(new_pool, new_scale, new_scale_p)
    if use_runs:
        return _store_runs(
            kv, rows, offs, kv_new, None, page_size, max_runs
        )
    if force_xla or jax.default_backend() == "cpu" or T > 256:
        # XLA scatter: fine on CPU/tests, and better for big prefill writes
        # (the Pallas store is one serial DMA per token). On TPU decode the
        # scatter's cost scales with the pool, not the written rows
        # (BENCHLOG.md decomposition), so small-T steps take the Pallas path.
        return KV(xla_scatter(kv_pool))
    from minisgl_tpu.ops.store_pallas import pallas_store_kv

    return KV(pallas_store_kv(kv_pool, rows, offs, kv_new))
