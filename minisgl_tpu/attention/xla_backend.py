"""Pure-XLA paged attention — the reference implementation and CPU fallback.

Functional counterpart of the CUDA FlashAttention/FlashInfer backends
(/root/reference/python/minisgl/attention/fa.py:139-182, fi.py:80-271): same
three query modes — decode (q_len=1), full prefill (q=k), and
extend-after-prefix-hit — expressed as one ragged computation. It gathers each
row's KV from the paged pool and runs masked softmax attention; memory cost is
O(T * S_max), so this backend is for tests, CPU runs, and numerics parity —
the Pallas backend (pallas_backend.py) is the production path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minisgl_tpu.attention.metadata import AttnMetadata

_NEG_INF = -1e30


def xla_paged_attention(
    q: jax.Array,  # [T, Hq, hd]
    k_pool: jax.Array,  # [L, kvh, S, hd]
    v_pool: jax.Array,
    layer_id: jax.Array | int,
    meta: AttnMetadata,
    page_size: int,
    scale: float,
) -> jax.Array:
    T, Hq, hd = q.shape
    kvh = k_pool.shape[1]
    B, pages_cap = meta.page_table.shape
    groups = Hq // kvh

    # [B, S_max] token slots covered by each row's page list
    slots = (
        meta.page_table[:, :, None] * page_size
        + jnp.arange(page_size, dtype=meta.page_table.dtype)[None, None, :]
    ).reshape(B, pages_cap * page_size)

    k_l = jax.lax.dynamic_index_in_dim(k_pool, layer_id, axis=0, keepdims=False)
    v_l = jax.lax.dynamic_index_in_dim(v_pool, layer_id, axis=0, keepdims=False)
    k = k_l[:, slots, :]  # [kvh, B, S_max, hd]
    v = v_l[:, slots, :]
    k = jnp.moveaxis(k, 0, 1)  # [B, kvh, S_max, hd]
    v = jnp.moveaxis(v, 0, 1)

    # Per-token gather of its row's KV: [T, kvh, S_max, hd]
    k_t = k[meta.q_req_ids]
    v_t = v[meta.q_req_ids]

    qf = q.reshape(T, kvh, groups, hd).astype(jnp.float32)
    scores = (
        jnp.einsum("tkgd,tksd->tkgs", qf, k_t.astype(jnp.float32)) * scale
    )  # [T, kvh, G, S_max]

    s_idx = jnp.arange(pages_cap * page_size, dtype=jnp.int32)
    # causal over the KV timeline: token at position p sees kv slots [0, p]
    causal = s_idx[None, :] <= meta.positions[:, None]  # [T, S_max]
    valid = s_idx[None, :] < meta.seq_lens[meta.q_req_ids][:, None]
    mask = (causal & valid)[:, None, None, :]
    scores = jnp.where(mask, scores, _NEG_INF)

    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("tkgs,tksd->tkgd", probs, v_t.astype(jnp.float32))
    return out.reshape(T, Hq, hd).astype(q.dtype)
