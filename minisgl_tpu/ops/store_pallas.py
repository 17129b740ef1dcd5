"""Pallas paged-KV store: scatter T new KV rows into the combined pool
IN PLACE.

The TPU counterpart of the reference's store.cu warp-per-token scatter
(/root/reference/python/minisgl/kernel/csrc/jit/store.cu:28-53). The XLA
scatter (`pool.at[rows, offs].set`) measured as the dominant decode cost —
its cost scales with the pool, not the written rows (BENCHLOG.md). Here each
grid program DMAs one token's [2*kvh, hd] row from VMEM into its
(page row, offset) slot of the HBM pool, with ``input_output_aliases``
keeping the pool buffer in place through the lax.scan carry. Scaled (int8)
pools take the XLA scatter path instead (ops/kv.py store_kv): their sidecar
rows are too narrow for efficient DMA descriptors.
"""

from __future__ import annotations

import jax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _store_kernel(
    rows_ref,  # [T] i32 scalar prefetch: pool row (page) per token
    offs_ref,  # [T] i32 scalar prefetch: in-page offset per token
    kv_new_ref,  # VMEM [1, 2*kvh, hd] this token's packed K/V row
    pool_in_ref,  # ANY [N, ps, 2*kvh, hd] (aliased)
    pool_out_ref,  # ANY [N, ps, 2*kvh, hd] (= pool_in)
    sem,  # DMA semaphore
):
    i = pl.program_id(0)
    copy = pltpu.make_async_copy(
        kv_new_ref.at[0],
        pool_out_ref.at[rows_ref[i], offs_ref[i]],
        sem,
    )
    copy.start()
    copy.wait()


def _plane_copies(kv_new_ref, pool_out_ref, row, off, sem_k, sem_v):
    """Two DMAs into a plane-major pool [N, 2, ps*kvh, hd]: the token's
    K block lands at plane-0 rows [off*kvh, (off+1)*kvh) and its V block
    at the same rows of plane 1 (row order t*kvh + h)."""
    kvh = kv_new_ref.shape[1] // 2
    k = pltpu.make_async_copy(
        kv_new_ref.at[0, pl.ds(0, kvh)],
        pool_out_ref.at[row, 0, pl.ds(off * kvh, kvh)],
        sem_k,
    )
    v = pltpu.make_async_copy(
        kv_new_ref.at[0, pl.ds(kvh, kvh)],
        pool_out_ref.at[row, 1, pl.ds(off * kvh, kvh)],
        sem_v,
    )
    k.start()
    v.start()
    return k, v


def _store_kernel_plane(
    rows_ref, offs_ref, kv_new_ref, pool_in_ref, pool_out_ref, sem_k, sem_v
):
    i = pl.program_id(0)
    k, v = _plane_copies(
        kv_new_ref, pool_out_ref, rows_ref[i], offs_ref[i], sem_k, sem_v
    )
    k.wait()
    v.wait()


def _store_scaled_kernel_plane(
    rows_ref, offs_ref, kv_new_ref, sp_new_ref,
    pool_in_ref, sp_in_ref, pool_out_ref, sp_out_ref,
    sem_k, sem_v, sem_sp,
):
    i = pl.program_id(0)
    row, off = rows_ref[i], offs_ref[i]
    k, v = _plane_copies(kv_new_ref, pool_out_ref, row, off, sem_k, sem_v)
    sp = pltpu.make_async_copy(
        sp_new_ref.at[0, 0], sp_out_ref.at[row, off], sem_sp
    )
    sp.start()
    k.wait()
    v.wait()
    sp.wait()


def _store_scaled_kernel(
    rows_ref,  # [T] i32 scalar prefetch: pool row (page) per token
    offs_ref,  # [T] i32 scalar prefetch: in-page offset per token
    kv_new_ref,  # VMEM [1, 2*kvh, hd] this token's packed K/V row
    sp_new_ref,  # VMEM [1, 1, SCALE_P_LANES] this token's scale row
    pool_in_ref,  # ANY [N, ps, 2*kvh, hd] (aliased)
    sp_in_ref,  # ANY [N, ps, SCALE_P_LANES] (aliased)
    pool_out_ref,
    sp_out_ref,
    sem_data,
    sem_sp,
):
    i = pl.program_id(0)
    row, off = rows_ref[i], offs_ref[i]
    data = pltpu.make_async_copy(
        kv_new_ref.at[0], pool_out_ref.at[row, off], sem_data
    )
    sp = pltpu.make_async_copy(
        sp_new_ref.at[0, 0], sp_out_ref.at[row, off], sem_sp
    )
    data.start()
    sp.start()
    data.wait()
    sp.wait()


def pallas_store_kv_scaled(
    kv_pool: jax.Array,  # [N, ps, 2*kvh, hd] int8
    scale_p: jax.Array,  # [N, ps, SCALE_P_LANES] f32 (prefill scale sidecar)
    rows: jax.Array,  # [T] i32
    offs: jax.Array,  # [T] i32
    kv_new: jax.Array,  # [T, 2*kvh, hd] int8 (already quantized)
    sp_new: jax.Array,  # [T, SCALE_P_LANES] f32 scale rows
    *,
    interpret: bool = False,
):
    """Scatter quantized KV rows + their prefill-layout scale rows in place.

    The decode-layout scale sidecar (ops/kv.py ``KV.scale``, lane order
    off*kvh + h) cannot ride this kernel: its per-token destination is a
    kvh-wide lane slice at a dynamic non-128-aligned offset, which Mosaic
    DMA cannot express — the caller scatters it with XLA on that (small)
    operand instead."""
    T, kvh2, hd = kv_new.shape
    plane = kv_pool.shape[1] == 2  # plane-major pool (ops/kv.py is_plane)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, kvh2, hd), lambda i, rows, offs: (i, 0, 0)),
            pl.BlockSpec(
                (1, 1, sp_new.shape[1]), lambda i, rows, offs: (i, 0, 0)
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[pltpu.SemaphoreType.DMA] * (3 if plane else 2),
    )
    return pl.pallas_call(
        _store_scaled_kernel_plane if plane else _store_scaled_kernel,
        out_shape=[
            jax.ShapeDtypeStruct(kv_pool.shape, kv_pool.dtype),
            jax.ShapeDtypeStruct(scale_p.shape, scale_p.dtype),
        ],
        grid_spec=grid_spec,
        # operands: rows, offs (prefetch), kv_new, sp_new, pool, scale_p
        input_output_aliases={4: 0, 5: 1},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(rows, offs, kv_new, sp_new[:, None, :], kv_pool, scale_p)


def pallas_store_kv(
    kv_pool: jax.Array,  # [N, ps, 2*kvh, hd]
    rows: jax.Array,  # [T] i32
    offs: jax.Array,  # [T] i32
    kv_new: jax.Array,  # [T, 2*kvh, hd]
    *,
    interpret: bool = False,
):
    T, kvh2, hd = kv_new.shape
    plane = kv_pool.shape[1] == 2  # plane-major pool (ops/kv.py is_plane)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, kvh2, hd), lambda i, rows, offs: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA] * (2 if plane else 1),
    )
    return pl.pallas_call(
        _store_kernel_plane if plane else _store_kernel,
        out_shape=jax.ShapeDtypeStruct(kv_pool.shape, kv_pool.dtype),
        grid_spec=grid_spec,
        # operand order: rows, offs (prefetch), kv_new, pool — pool is
        # operand 3 and aliases output 0 (in-place through the scan carry)
        input_output_aliases={3: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(rows, offs, kv_new.astype(kv_pool.dtype), kv_pool)
