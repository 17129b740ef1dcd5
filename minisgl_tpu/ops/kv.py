"""Paged KV pool layout and scatter update.

TPU-native equivalent of the reference's MHA pool + store.cu scatter kernel
(/root/reference/python/minisgl/kvcache/mha_pool.py:28-56,
kernel/csrc/jit/store.cu:28-53). Layout decisions:

- K and V are separate pools of GLOBAL shape ``[L, kv_heads_eff, S, head_dim]``
  where ``S = num_pages * page_size`` token slots and ``kv_heads_eff`` is the
  replication-expanded head count (= max(kv_heads, tp)). Head-major layout
  keeps each head's page ``[page_size, head_dim]`` contiguous in HBM — the
  unit the Pallas paged-attention kernel DMAs.
- Sharded P(None, "model", None, None): heads over the TP axis, so each chip
  owns the full page space for its local heads (same invariant as the
  reference's per-rank pool, mha_pool.py:27).
- Page 0 is the reserved dummy/garbage page: padded batch rows read it and
  padded new tokens scatter into it (reference engine.py:89-98 trick).

The scatter itself is a jnp advanced-index update; under jit with donated
pools XLA emits an in-place scatter — no copy of the pool.
"""

from __future__ import annotations

from typing import Tuple

import jax


def store_kv(
    k_pool: jax.Array,  # [L, kvh, S, hd]
    v_pool: jax.Array,
    layer_id: jax.Array | int,
    out_slots: jax.Array,  # [T] token slots
    k_new: jax.Array,  # [T, kvh, hd]
    v_new: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    # Advanced-index semantics: (layer_id scalar, slice, out_slots[T], slice)
    # -> indexed shape [T, kvh, hd], matching k_new directly.
    k_pool = k_pool.at[layer_id, :, out_slots, :].set(
        k_new.astype(k_pool.dtype), mode="promise_in_bounds"
    )
    v_pool = v_pool.at[layer_id, :, out_slots, :].set(
        v_new.astype(v_pool.dtype), mode="promise_in_bounds"
    )
    return k_pool, v_pool
