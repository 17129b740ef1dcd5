"""Prefill-sized KV-store formulation micro-bench (round 5).

The page-run store (ops/kv.py _store_runs) cut the prefill store from
~275 ms to ~62 ms per 8k-token step in-model; this harness times the store
ALONE (jitted, pool donated, slope-timed chained dispatches) to locate the
residual cost: data blocks vs scale sidecars vs the scatter itself.

Variants: scatter (old token-scatter), runs (shipped), runs_nosc (data
only, scales skipped), runs_sconly (sidecars only).

Usage: python benchmark/kernels/bench_store.py [variants...]
Env: SB_T (8192) SB_B (14) SB_PS (128) SB_INT8 (1) SB_PLANE (1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp")
)

import jax
import jax.numpy as jnp
import numpy as np

from minisgl_tpu.ops.kv import (
    KV,
    SCALE_P_LANES,
    _store_runs,
    pack_kv,
    quantize_kv_rows,
    store_kv,
)

T = int(os.environ.get("SB_T", "8192"))
B = int(os.environ.get("SB_B", "14"))
PS = int(os.environ.get("SB_PS", "128"))
INT8 = os.environ.get("SB_INT8", "1") == "1"
PLANE = os.environ.get("SB_PLANE", "1") == "1"
KVH, HD = 8, 128
L = 28
N = 1130 * L  # bench-shaped pool


def make_case(rng):
    dtype = jnp.int8 if INT8 else jnp.bfloat16
    shape = (N, 2, PS * KVH, HD) if PLANE else (N, PS, 2 * KVH, HD)
    kv = KV(
        data=jnp.zeros(shape, dtype),
        scale=jnp.full((N, 2, PS * KVH), 1e-8, jnp.float32) if INT8 else None,
        scale_p=jnp.zeros((N, PS, SCALE_P_LANES), jnp.float32) if INT8 else None,
    )
    # bench-shaped write: B requests, contiguous runs over scattered pages
    per = T // B
    slots = np.zeros((T,), np.int32)
    pages = rng.permutation(N - 1)[: B * (per // PS + 2)] + 1
    pi = 0
    t = 0
    for b in range(B):
        npg = per // PS + 1
        pg = pages[pi : pi + npg]
        pi += npg
        pos = np.arange(per)
        slots[t : t + per] = pg[pos // PS] * PS + pos % PS
        t += per
    k = jnp.asarray(rng.standard_normal((T, KVH, HD)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((T, KVH, HD)), jnp.bfloat16)
    return kv, jnp.asarray(slots), k, v


def main():
    names = sys.argv[1:] or ["scatter", "runs", "runs_nosc", "runs_sconly"]
    rng = np.random.default_rng(0)
    kv0, slots, k, v = make_case(rng)
    max_runs = min(T, T // PS + 3 * B + 4)

    def variant(name):
        if name == "scatter":
            return jax.jit(
                lambda kv: store_kv(kv, 0, 1, slots, k, v), donate_argnums=0
            )
        if name == "runs":
            return jax.jit(
                lambda kv: store_kv(
                    kv, 0, 1, slots, k, v, max_runs=max_runs
                ),
                donate_argnums=0,
            )
        rows, offs = slots // PS, slots % PS
        kv_new = pack_kv(k, v)
        if INT8:
            kv_q, scale = quantize_kv_rows(kv_new)
        else:
            kv_q, scale = kv_new.astype(kv0.data.dtype), None
        if name == "runs_nosc":
            return jax.jit(
                lambda kv: KV(
                    _store_runs(
                        KV(kv.data), rows, offs, kv_q, None, PS, max_runs
                    ).data,
                    kv.scale,
                    kv.scale_p,
                ),
                donate_argnums=0,
            )
        if name == "runs_sconly":
            assert INT8

            def sconly(kv):
                # scales only: real rows, but a 1-page data pool so the
                # data writes fall out of bounds and mode="drop" kills
                # them; the sidecar writes still hit the real pools
                full = _store_runs(
                    KV(jnp.zeros((1, 2, PS * KVH, HD), kv.data.dtype),
                       kv.scale, kv.scale_p),
                    rows, offs, kv_q, scale, PS, max_runs,
                )
                return KV(kv.data, full.scale, full.scale_p)

            return jax.jit(sconly, donate_argnums=0)
        raise ValueError(name)

    for name in names:
        fn = variant(name)
        kv = KV(
            jnp.array(kv0.data),
            None if kv0.scale is None else jnp.array(kv0.scale),
            None if kv0.scale_p is None else jnp.array(kv0.scale_p),
        )
        kv = fn(kv)  # compile + warm
        times = {}
        for n in (3, 12):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(n):
                    kv = fn(kv)
                jax.block_until_ready(kv.data)
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        per = (times[12] - times[3]) / 9
        print(f"{name:12s} {per * 1e3:8.2f} ms/call (x{L} layers = "
              f"{per * L * 1e3:6.1f} ms/step)", flush=True)
        del kv


if __name__ == "__main__":
    main()
