"""Pure-XLA paged attention — the reference implementation and CPU fallback.

Functional counterpart of the CUDA FlashAttention/FlashInfer backends
(/root/reference/python/minisgl/attention/fa.py:139-182, fi.py:80-271): same
three query modes — decode (q_len=1), full prefill (q=k), and
extend-after-prefix-hit — expressed as one ragged computation. It gathers each
row's KV pages from the combined pool and runs masked softmax attention;
memory cost is O(T * S_max), so this backend is for tests, CPU runs, and
numerics parity — the Pallas backends are the production path.

The incoming ``meta.page_table`` already carries the layer offset
(``layer_id * pages_per_layer`` folded in by the model layer loop), so this
function is layer-agnostic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minisgl_tpu.attention.metadata import AttnMetadata

_NEG_INF = -1e30


def xla_paged_attention(
    q: jax.Array,  # [T, Hq, hd]
    kv,  # ops.kv.KV: pool [L*P, page_size, 2*kvh, hd] (+ int8 scales)
    meta: AttnMetadata,  # page_table pre-offset to this layer's page space
    page_size: int,
    scale: float,
) -> jax.Array:
    kv_pool, kv_scale = kv.data, kv.scale
    T, Hq, hd = q.shape
    B, pages_cap = meta.page_table.shape
    S_max = pages_cap * page_size

    if kv_pool.shape[1] == 2:  # plane-major [N, 2, ps*kvh, hd] (ops/kv.py)
        kvh = kv_pool.shape[2] // page_size
        pages = kv_pool[meta.page_table]  # [B, PB, 2, ps*kvh, hd]
        pages = pages.reshape(B, pages_cap, 2, page_size, kvh, hd)
        k = pages[:, :, 0].reshape(B, S_max, kvh, hd)
        v = pages[:, :, 1].reshape(B, S_max, kvh, hd)
    else:
        kvh = kv_pool.shape[2] // 2
        pages = kv_pool[meta.page_table]  # [B, PB, ps, 2kvh, hd]
        k = pages[:, :, :, :kvh, :].reshape(B, S_max, kvh, hd)
        v = pages[:, :, :, kvh:, :].reshape(B, S_max, kvh, hd)
    groups = Hq // kvh
    if kv_scale is not None:
        # int8 pool: dequantize with the flat decode sidecar [N, 2, ps*kvh]
        # (lane order off*kvh + h, ops/kv.py)
        sc = kv_scale[meta.page_table]  # [B, PB, 2, ps*kvh]
        sc = sc.reshape(B, pages_cap, 2, page_size, kvh)
        sk = sc[:, :, 0].reshape(B, S_max, kvh)
        sv = sc[:, :, 1].reshape(B, S_max, kvh)
        k = k.astype(jnp.float32) * sk[..., None]
        v = v.astype(jnp.float32) * sv[..., None]

    # Per-token gather of its row's KV: [T, S_max, kvh, hd]
    k_t = k[meta.q_req_ids]
    v_t = v[meta.q_req_ids]

    qf = q.reshape(T, kvh, groups, hd).astype(jnp.float32)
    scores = (
        jnp.einsum("tkgd,tskd->tkgs", qf, k_t.astype(jnp.float32)) * scale
    )  # [T, kvh, G, S_max]

    s_idx = jnp.arange(S_max, dtype=jnp.int32)
    # causal over the KV timeline: token at position p sees kv slots [0, p]
    causal = s_idx[None, :] <= meta.positions[:, None]  # [T, S_max]
    valid = s_idx[None, :] < meta.seq_lens[meta.q_req_ids][:, None]
    mask = (causal & valid)[:, None, None, :]
    scores = jnp.where(mask, scores, _NEG_INF)

    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("tkgs,tskd->tkgd", probs, v_t.astype(jnp.float32))
    return out.reshape(T, Hq, hd).astype(q.dtype)
