"""Batched token sampling: greedy fast path + temperature/top-k/top-p.

Counterpart of /root/reference/python/minisgl/engine/sample.py:24-45
(flashinfer softmax + top-k/top-p sampling with an all-greedy argmax fast
path). TPU formulation: one sort of the logits per step, rank/top-p masks, and
Gumbel-max sampling — all inside the jitted step so the sampled token never
leaves the device before the next decode step consumes it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minisgl_tpu.attention.metadata import SamplingMetadata

_NEG_INF = -1e30


def sample_tokens(
    logits: jax.Array,  # [B, V] f32
    meta: SamplingMetadata,
    key: jax.Array,
) -> jax.Array:
    B, V = logits.shape
    greedy_tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    is_greedy = meta.temperature <= 0.0

    # Scale by temperature (guard div-by-zero on greedy rows).
    temp = jnp.where(is_greedy, 1.0, meta.temperature)
    scaled = logits / temp[:, None]

    sorted_logits, sorted_idx = jax.lax.top_k(scaled, V)  # descending
    ranks = jnp.arange(V, dtype=jnp.int32)[None, :]

    # top-k mask: -1 (or 0) disables
    k = jnp.where(meta.top_k <= 0, V, meta.top_k)[:, None]
    topk_mask = ranks < k

    # top-p (nucleus): keep the smallest prefix whose prob mass >= top_p;
    # exclusive cumsum keeps the first token always eligible.
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1) - probs
    topp_mask = cum < meta.top_p[:, None]

    masked = jnp.where(topk_mask & topp_mask, sorted_logits, _NEG_INF)
    gumbel = jax.random.gumbel(key, masked.shape, dtype=jnp.float32)
    pick = jnp.argmax(masked + gumbel, axis=-1)
    sampled = jnp.take_along_axis(sorted_idx, pick[:, None], axis=-1)[:, 0]

    return jnp.where(is_greedy, greedy_tokens, sampled.astype(jnp.int32))
