"""Parity tests for the page-run batched store (ops/kv.py _store_runs):
the prefill-sized store path that replaced the token scatter (round 5 —
the scatter cost ~276 ms of a 459 ms prefill step). The run store must
produce bit-identical pools/sidecars to the scatter path on batch-builder-
shaped writes: multi-request, mid-page starts (chunked prefill / radix
extend), q_align padding gaps, both pool layouts, with and without int8
scales."""

import jax.numpy as jnp
import numpy as np
import pytest

from minisgl_tpu.ops.kv import KV, SCALE_P_LANES, store_kv

KVH = 8
HD = 32
PS = 16


def _mk_pool(rng, n_rows, plane, int8):
    dtype = jnp.int8 if int8 else jnp.bfloat16
    shape = (
        (n_rows, 2, PS * KVH, HD) if plane else (n_rows, PS, 2 * KVH, HD)
    )
    data = jnp.asarray(
        rng.integers(-100, 100, shape).astype(np.float32), dtype
    )
    if not int8:
        return KV(data=data)
    scale = jnp.asarray(
        rng.uniform(0.01, 0.02, (n_rows, 2, PS * KVH)), jnp.float32
    )
    scale_p = jnp.asarray(
        rng.uniform(0.01, 0.02, (n_rows, PS, SCALE_P_LANES)), jnp.float32
    )
    return KV(data=data, scale=scale, scale_p=scale_p)


def _mk_write(rng, reqs, q_align=8):
    """Batch-builder-shaped write stream: per request a contiguous slot
    run [start, start+ext) over its own pages, q_align padding (slot 0)
    between segments and at the tail."""
    slots = []
    page = 1
    for start_off, ext in reqs:
        # request's own pages, non-contiguous page ids
        npages = (start_off + ext + PS - 1) // PS
        pages = np.arange(page, page + npages) * 3 % 997 + 1
        page += npages
        pos = np.arange(start_off, start_off + ext)
        slots.extend(pages[pos // PS] * PS + pos % PS)
        pad = (-ext) % q_align
        slots.extend([0] * pad)
    slots.extend([0] * q_align)  # tail padding
    T = len(slots)
    k = rng.standard_normal((T, KVH, HD)).astype(np.float32)
    v = rng.standard_normal((T, KVH, HD)).astype(np.float32)
    return (
        jnp.asarray(np.asarray(slots, np.int32)),
        jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16),
    )


REQS = [
    [(0, 40), (0, 17), (5, 33)],  # aligned + short + mid-page start
    [(13, 300)],  # long mid-page extend (chunk continuation)
    [(0, 16), (15, 1), (7, 90), (0, 5)],
]


@pytest.mark.parametrize("plane", [False, True])
@pytest.mark.parametrize("int8", [False, True])
@pytest.mark.parametrize("reqs", REQS)
def test_run_store_matches_scatter(plane, int8, reqs):
    rng = np.random.default_rng(42)
    kv = _mk_pool(rng, 1024, plane, int8)
    slots, k, v = _mk_write(rng, reqs)
    T = slots.shape[0]
    B = len(reqs)
    max_runs = min(T, T // PS + 3 * B + 4)

    ref = store_kv(kv, 0, 1, slots, k, v)  # token-scatter path
    got = store_kv(kv, 0, 1, slots, k, v, max_runs=max_runs)

    # dummy page 0 holds garbage by convention on both paths: mask it out
    def rows_of(x):
        return np.asarray(x)[1:]

    np.testing.assert_array_equal(rows_of(ref.data), rows_of(got.data))
    if int8:
        np.testing.assert_array_equal(rows_of(ref.scale), rows_of(got.scale))
        np.testing.assert_array_equal(
            rows_of(ref.scale_p), rows_of(got.scale_p)
        )


def test_run_store_small_t_unaffected():
    """max_runs with T <= 256 keeps the existing path (decode-sized)."""
    rng = np.random.default_rng(0)
    kv = _mk_pool(rng, 64, plane=False, int8=False)
    slots = jnp.asarray(np.arange(20, 52, dtype=np.int32))
    k = jnp.asarray(rng.standard_normal((32, KVH, HD)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((32, KVH, HD)), jnp.bfloat16)
    a = store_kv(kv, 0, 1, slots, k, v)
    b = store_kv(kv, 0, 1, slots, k, v, max_runs=16)
    np.testing.assert_array_equal(np.asarray(a.data), np.asarray(b.data))
