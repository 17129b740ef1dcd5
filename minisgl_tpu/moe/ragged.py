"""Ragged grouped-GEMM MoE: the XLA counterpart of the reference's Triton
fused-MoE kernels (/root/reference/python/minisgl/moe/fused.py:127-227,
kernel/triton/fused_moe.py). Routing = softmax + jax.lax.top_k; tokens are
stably sorted by expert and the two expert matmuls run as
``jax.lax.ragged_dot`` (TPU grouped GEMM); weight-only int8 scales apply
per-row in expert-sorted order."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def ragged_moe_mlp(
    x: jax.Array,  # [T, H]
    router_w: jax.Array,  # [H, E] replicated
    w1: jax.Array,  # [E, H, 2*Im/tp] local
    w2: jax.Array,  # [E, Im/tp, H] local
    top_k: int,
    renormalize: bool,
    act_fn,
    w1_scale: Optional[jax.Array] = None,  # [E, 1, 2*Im/tp]
    w2_scale: Optional[jax.Array] = None,  # [E, 1, H]
) -> jax.Array:
    """TP-sharded MoE via ragged grouped matmul (jax.lax.ragged_dot), the XLA
    counterpart of the reference's Triton grouped GEMM (moe/fused.py:127-227,
    kernel/triton/fused_moe.py)."""
    T, H = x.shape
    E = w1.shape[0]
    router_logits = jnp.dot(
        x.astype(jnp.float32), router_w.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    probs = jax.nn.softmax(router_logits, axis=-1)
    topk_p, topk_e = jax.lax.top_k(probs, top_k)  # [T, K]
    if renormalize:
        topk_p = topk_p / jnp.sum(topk_p, axis=-1, keepdims=True)

    flat_e = topk_e.reshape(-1)  # [T*K]
    order = jnp.argsort(flat_e)  # stable sort by expert
    inv_order = jnp.argsort(order)
    x_rep = jnp.repeat(x, top_k, axis=0)  # token t occupies rows t*K..t*K+K-1
    x_sorted = x_rep[order]
    group_sizes = jnp.bincount(flat_e, length=E).astype(jnp.int32)

    e_sorted = flat_e[order]
    h = jax.lax.ragged_dot(
        x_sorted,
        w1.astype(x.dtype) if w1.dtype == jnp.int8 else w1,
        group_sizes,
        preferred_element_type=jnp.float32,
    )
    if w1_scale is not None:  # per-row expert scale (rows sorted by expert)
        h = h * w1_scale[:, 0, :][e_sorted]
    h = act_fn(h.astype(x.dtype))
    out_sorted = jax.lax.ragged_dot(
        h,
        w2.astype(x.dtype) if w2.dtype == jnp.int8 else w2,
        group_sizes,
        preferred_element_type=jnp.float32,
    )
    if w2_scale is not None:
        out_sorted = out_sorted * w2_scale[:, 0, :][e_sorted]
    out = out_sorted[inv_order].reshape(T, top_k, H)
    out = jnp.sum(out * topk_p[:, :, None], axis=1)
    return out.astype(x.dtype)
