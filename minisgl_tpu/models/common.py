"""Shared decoder-transformer implementation: param table + forward.

TPU-native re-design of the reference model stack
(/root/reference/python/minisgl/models/utils.py:25-123 GatedMLP/MoEMLP/RopeAttn,
models/llama.py:18-82). All model families (Llama, Qwen2/3, Qwen3-MoE,
Mistral) share one parameterized decoder:

- Parameters are a flat ``{path: array}`` pytree; per-layer tensors are
  STACKED along a leading [L, ...] axis and the layer loop is a
  ``jax.lax.scan`` — one-layer trace, fast compiles (the XLA replacement for
  per-layer CUDA-graph capture cost).
- The forward runs INSIDE ``jax.shard_map`` over the ("data", "model") mesh:
  params arrive as local shards, and the collective placement matches the
  reference exactly — psum after o_proj and down_proj (linear.py:102-127),
  psum combine for the vocab-parallel embedding (embedding.py:32-42), and an
  all-gather of column-sharded logits (embedding.py:102-110).
- Attention is pluggable (``attn_impl``): XLA fallback or Pallas paged kernel,
  both operating on the paged KV pool (ops/kv.py layout).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from minisgl_tpu.attention.metadata import AttnMetadata
from minisgl_tpu.layers.params import (
    HFSource,
    ParamInfo,
    ParamsSpec,
    make_kv_replicate,
    make_kv_replicate_bias,
    make_shard_interleave,
    t_transpose,
)
from minisgl_tpu.models.config import ModelConfig
from minisgl_tpu.moe import create_moe_backend
from minisgl_tpu.ops.activation import ACT2FN
from minisgl_tpu.ops.kv import KV
from minisgl_tpu.ops.normalization import fused_add_rmsnorm, rmsnorm
from minisgl_tpu.ops.rope import apply_rope, compute_rope_cache
from minisgl_tpu.parallel.mesh import MODEL_AXIS
from minisgl_tpu.utils import div_even

# attn_impl(q, kv_pool, meta, new_kv=(k, v, out_slots_abs)) -> (o, kv_pool)
AttnImpl = Callable[..., jax.Array]

# the grouped-GEMM MoE implementation (minisgl_tpu/moe)
_MOE_IMPL = create_moe_backend()


@dataclass(frozen=True)
class ModelDims:
    """Global + local (per-TP-shard) dimensions."""

    tp: int
    q_heads: int  # global
    kv_heads: int  # global (from HF config)
    kv_mult: int  # replication factor when tp > kv_heads
    head_dim: int

    @property
    def kv_heads_eff(self) -> int:  # global, replication-expanded
        return self.kv_heads * self.kv_mult

    @property
    def q_heads_local(self) -> int:
        return self.q_heads // self.tp

    @property
    def kv_heads_local(self) -> int:
        return self.kv_heads_eff // self.tp

    @classmethod
    def build(cls, cfg: ModelConfig, tp: int) -> "ModelDims":
        assert cfg.num_qo_heads % tp == 0, (cfg.num_qo_heads, tp)
        kv_mult = tp // cfg.num_kv_heads if tp > cfg.num_kv_heads else 1
        # validates divisibility incl. the replication rule
        div_even(cfg.num_kv_heads * kv_mult, tp)
        return cls(
            tp=tp,
            q_heads=cfg.num_qo_heads,
            kv_heads=cfg.num_kv_heads,
            kv_mult=kv_mult,
            head_dim=cfg.head_dim,
        )


@dataclass(frozen=True)
class ModelExtras:
    """Per-family knobs (reference: qwen2.py:19-20 bias, qwen3.py:20 qk-norm)."""

    attn_bias: bool = False
    qk_norm: bool = False


def build_param_specs(
    cfg: ModelConfig, dims: ModelDims, extras: ModelExtras, quant: str = "none"
) -> ParamsSpec:
    L = cfg.num_layers
    H = cfg.hidden_size
    hd = dims.head_dim
    tp = dims.tp
    dtype = jnp.bfloat16 if cfg.dtype != "float32" else jnp.float32
    q_out = dims.q_heads * hd
    kv_out = dims.kv_heads_eff * hd

    kv_rep = partial(make_kv_replicate, cfg.num_kv_heads, hd, dims.kv_mult)
    kv_rep_b = partial(make_kv_replicate_bias, cfg.num_kv_heads, hd, dims.kv_mult)

    def layer_sources(tmpl: str, transform=None) -> list:
        return [
            HFSource(tmpl.format(i=i), transform=transform) for i in range(L)
        ]

    spec: ParamsSpec = {}

    # int8 quantizes the embedding table and LM head too (per-H-column
    # scales, [1, H] / [1, V]): without it a 14B-class model's 3 GB of bf16
    # embed+head alone overflows a 16 GB chip that holds its int8 linears.
    # Gather dequant is one broadcast multiply; the tied-head matmul applies
    # the per-H scale to the activations before the dot (scale sits on the
    # contraction axis there).
    table_quant = "int8" if quant == "int8" else None
    spec["embed"] = ParamInfo(
        (cfg.vocab_size, H),
        dtype,
        P(MODEL_AXIS, None),
        sources=[HFSource("model.embed_tokens.weight")],
        quant=table_quant,
    )
    spec["rope_cache"] = ParamInfo(
        (cfg.rotary_config.max_position, cfg.rotary_config.rotary_dim),
        jnp.float32,
        P(),
        init=lambda: compute_rope_cache(cfg.rotary_config),
    )
    spec["final_norm"] = ParamInfo(
        (H,), dtype, P(), sources=[HFSource("model.norm.weight")]
    )
    if not cfg.tie_word_embeddings:
        spec["lm_head"] = ParamInfo(
            (H, cfg.vocab_size),
            dtype,
            P(None, MODEL_AXIS),
            sources=[HFSource("lm_head.weight", t_transpose)],
            quant=table_quant,
        )

    # ---- stacked per-layer tensors (leading L axis) ----
    pre = "model.layers.{i}."

    # weight-only quantization applies to the big per-layer matmul weights;
    # embeddings / lm head / norms / biases stay high precision
    _QUANT_NAMES = {"qkv_w", "o_w", "gate_up_w", "down_w", "moe_w1", "moe_w2"}

    def stacked(
        name: str,
        shape: tuple,
        pspec: P,
        source_groups: list,  # list of (tmpl, transform) merged along axis -1
        post=None,
        dt=None,
    ):
        # one sublist per stack member (layer), merged along merge_axis
        srcs = [
            [HFSource(tmpl.format(i=i), transform=tf) for tmpl, tf in source_groups]
            for i in range(L)
        ]
        spec[f"layers/{name}"] = ParamInfo(
            (L, *shape),
            dt or dtype,
            pspec,
            sources=srcs,
            merge_axis=-1,
            stack=True,
            post_transform=post,
            quant=quant if (quant in ("int8", "int4") and name in _QUANT_NAMES) else None,
        )

    stacked(
        "input_norm_w", (H,), P(), [(pre + "input_layernorm.weight", None)]
    )
    stacked(
        "post_norm_w", (H,), P(), [(pre + "post_attention_layernorm.weight", None)]
    )

    qkv_interleave = make_shard_interleave([q_out, kv_out, kv_out], tp)
    stacked(
        "qkv_w",
        (H, q_out + 2 * kv_out),
        P(None, None, MODEL_AXIS),
        [
            (pre + "self_attn.q_proj.weight", t_transpose),
            (pre + "self_attn.k_proj.weight", kv_rep()),
            (pre + "self_attn.v_proj.weight", kv_rep()),
        ],
        post=qkv_interleave,
    )
    if extras.attn_bias:
        stacked(
            "qkv_b",
            (q_out + 2 * kv_out,),
            P(None, MODEL_AXIS),
            [
                (pre + "self_attn.q_proj.bias", None),
                (pre + "self_attn.k_proj.bias", kv_rep_b()),
                (pre + "self_attn.v_proj.bias", kv_rep_b()),
            ],
            post=qkv_interleave,
        )
    if extras.qk_norm:
        stacked("q_norm_w", (hd,), P(), [(pre + "self_attn.q_norm.weight", None)])
        stacked("k_norm_w", (hd,), P(), [(pre + "self_attn.k_norm.weight", None)])

    stacked(
        "o_w",
        (q_out, H),
        P(None, MODEL_AXIS, None),
        [(pre + "self_attn.o_proj.weight", t_transpose)],
    )

    if not cfg.is_moe:
        I = cfg.intermediate_size
        stacked(
            "gate_up_w",
            (H, 2 * I),
            P(None, None, MODEL_AXIS),
            [
                (pre + "mlp.gate_proj.weight", t_transpose),
                (pre + "mlp.up_proj.weight", t_transpose),
            ],
            post=make_shard_interleave([I, I], tp),
        )
        stacked(
            "down_w",
            (I, H),
            P(None, MODEL_AXIS, None),
            [(pre + "mlp.down_proj.weight", t_transpose)],
        )
    else:
        E = cfg.num_experts
        Im = cfg.moe_intermediate_size
        stacked(
            "router_w",
            (H, E),
            P(),
            [(pre + "mlp.gate.weight", t_transpose)],
        )
        # experts stacked [L, E, ...]: sources are ordered (layer, expert)
        w1_srcs = []
        w2_srcs = []
        for i in range(L):
            for e in range(E):
                ep = f"model.layers.{i}.mlp.experts.{e}."
                w1_srcs.append(
                    [
                        HFSource(ep + "gate_proj.weight", t_transpose),
                        HFSource(ep + "up_proj.weight", t_transpose),
                    ]
                )
                w2_srcs.append([HFSource(ep + "down_proj.weight", t_transpose)])
        spec["layers/moe_w1"] = ParamInfo(
            (L, E, H, 2 * Im),
            dtype,
            P(None, None, None, MODEL_AXIS),
            sources=w1_srcs,
            merge_axis=-1,
            stack=True,
            post_transform=make_shard_interleave([Im, Im], tp),
            quant="int8" if quant == "int8" else None,
        )
        spec["layers/moe_w2"] = ParamInfo(
            (L, E, Im, H),
            dtype,
            P(None, None, MODEL_AXIS, None),
            sources=w2_srcs,
            merge_axis=-1,
            stack=True,
            quant="int8" if quant == "int8" else None,
        )

    from minisgl_tpu.layers.params import add_scale_entries

    return add_scale_entries(spec, tp=tp)


# ------------------------------ forward ------------------------------------


def _vocab_parallel_embed(
    embed_local: jax.Array,
    ids: jax.Array,
    vocab_size: int,
    tp: int,
    scale: jax.Array | None = None,  # [1, H] int8-table dequant
    dtype=None,
) -> jax.Array:
    """Masked local gather + psum (reference embedding.py:32-42)."""

    def deq(x):
        if scale is None:
            return x
        return (x.astype(jnp.float32) * scale).astype(dtype)

    v_local = vocab_size // tp
    if tp == 1:
        return deq(jnp.take(embed_local, ids, axis=0))
    shard = jax.lax.axis_index(MODEL_AXIS)
    start = shard * v_local
    local_ids = ids - start
    valid = (local_ids >= 0) & (local_ids < v_local)
    x = deq(jnp.take(embed_local, jnp.clip(local_ids, 0, v_local - 1), axis=0))
    x = jnp.where(valid[:, None], x, 0)
    return jax.lax.psum(x, MODEL_AXIS)


def _maybe_psum(x: jax.Array, tp: int) -> jax.Array:
    return jax.lax.psum(x, MODEL_AXIS) if tp > 1 else x


def _mm(
    x: jax.Array, lp: Dict[str, jax.Array], name: str, w8a8: bool = False
) -> jax.Array:
    """Matmul with transparent int8 weight handling.

    - weight-only ("int8"): int8 weights feed the MXU as bf16 (XLA fuses the
      convert into the dot read); the per-output-channel scale lands in the
      f32 epilogue.
    - "w8a8": activations are dynamically quantized per row (amax/127) and
      the dot runs int8 x int8 -> int32 on the MXU (2x bf16 throughput on
      v5e); row and channel scales apply in the f32 epilogue.
    """
    w = lp[name]
    scale = lp.get(name + "@scale")
    if w.dtype == jnp.int8 and w.shape[-2] * 2 == x.shape[-1]:
        # int4 packed (stored rows = in/2): unpack nibbles, apply grouped
        # scales, one dot — XLA fuses the dequant chain into the dot read so
        # HBM traffic stays 0.5 byte/param
        from minisgl_tpu.layers.params import unpack_int4

        n_g = scale.shape[-2]
        in_dim = x.shape[-1]
        g = in_dim // n_g
        wq = unpack_int4(w, x.dtype)  # [..., in, out]
        wq = wq.reshape(*w.shape[:-2], n_g, g, w.shape[-1])
        wf = (wq * scale[..., :, None, :].astype(x.dtype)).reshape(
            *w.shape[:-2], in_dim, w.shape[-1]
        )
        return jnp.dot(x, wf, preferred_element_type=jnp.float32)
    if w.dtype == jnp.int8 and w8a8:
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
        sx = jnp.maximum(amax, 1e-8) / 127.0  # [T, 1]
        x_q = jnp.clip(
            jnp.round(x.astype(jnp.float32) / sx), -127, 127
        ).astype(jnp.int8)
        y = jax.lax.dot_general(
            x_q, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        y = y * sx
        if scale is not None:
            y = y * scale
        return y
    if w.dtype == jnp.int8:
        w = w.astype(x.dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if scale is not None:
        y = y * scale  # [1, out] broadcasts over [T, out]
    return y




def decoder_forward(
    params: Dict[str, jax.Array],  # LOCAL shards (inside shard_map)
    cfg: ModelConfig,
    dims: ModelDims,
    extras: ModelExtras,
    input_ids: jax.Array,  # [T]
    kv_pool: KV,  # combined pool (+ int8 scale sidecar), ops/kv.py
    meta: AttnMetadata,
    attn_impl: AttnImpl,
    w8a8: bool = False,
    gather_last: bool = True,
    gather_logits: bool = True,
    remat: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (logits [B, V] f32, kv_pool). With ``gather_last=False`` the
    LM head runs on EVERY query token (logits [T, V]) — the teacher-forced
    scoring mode of the quality/perplexity harness (quality/nll.py). With
    ``gather_logits=False`` at tp>1 the logits stay vocab-sharded
    ([B, V/tp] per rank) for the distributed samplers."""
    tp = dims.tp
    pages_per_layer = kv_pool.data.shape[0] // cfg.num_layers
    hd = dims.head_dim
    nql, nkl = dims.q_heads_local, dims.kv_heads_local
    eps = cfg.rms_norm_eps
    scale = hd**-0.5
    act_fn = ACT2FN[cfg.hidden_act]

    x = _vocab_parallel_embed(
        params["embed"],
        input_ids,
        cfg.vocab_size,
        tp,
        scale=params.get("embed@scale"),
        dtype=params["final_norm"].dtype,
    )
    cos_sin = jnp.take(params["rope_cache"], meta.positions, axis=0)

    layer_params = {
        k.removeprefix("layers/"): v
        for k, v in params.items()
        if k.startswith("layers/")
    }

    def layer_fn(carry, lp):
        x, residual, kv_pool, layer_id = carry

        x, residual = fused_add_rmsnorm(x, residual, lp["input_norm_w"], eps)

        # named scopes mark the profiler trace the way the reference's nvtx
        # decorators do (utils/torch_utils.py:23-37, models/utils.py:44,118)
        with jax.named_scope("attn"):
            qkv = _mm(x, lp, "qkv_w", w8a8)
            if "qkv_b" in lp:
                qkv = qkv + lp["qkv_b"].astype(jnp.float32)
            qkv = qkv.astype(x.dtype)
            T = qkv.shape[0]
            q, k, v = jnp.split(qkv, [nql * hd, (nql + nkl) * hd], axis=-1)
            q = q.reshape(T, nql, hd)
            k = k.reshape(T, nkl, hd)
            v = v.reshape(T, nkl, hd)
            if extras.qk_norm:
                q = rmsnorm(q, lp["q_norm_w"], eps)
                k = rmsnorm(k, lp["k_norm_w"], eps)
            q = apply_rope(q, cos_sin)
            k = apply_rope(k, cos_sin)

            # the layer "slice" of the pool is an integer page offset
            # (ops/kv.py); the KV store for the new tokens rides the
            # attention impl (fused into the Pallas decode kernel; a
            # store_kv prologue elsewhere — attention/__init__.py
            # with_store)
            meta_l = meta._replace(
                page_table=meta.page_table + layer_id * pages_per_layer
            )
            from minisgl_tpu.ops.kv import pool_page_size

            page_size = pool_page_size(kv_pool.data, nkl)
            abs_slots = (
                layer_id * (pages_per_layer * page_size) + meta.out_slots
            )
            with jax.named_scope("paged_attention"):
                o, kv_pool = attn_impl(
                    q, kv_pool, meta_l, new_kv=(k, v, abs_slots)
                )
            o = _mm(o.reshape(T, nql * hd), lp, "o_w", w8a8).astype(x.dtype)
            o = _maybe_psum(o, tp)

        x, residual = fused_add_rmsnorm(o, residual, lp["post_norm_w"], eps)

        with jax.named_scope("moe" if cfg.is_moe else "mlp"):
            if cfg.is_moe:
                y = _MOE_IMPL(
                    x,
                    lp["router_w"],
                    lp["moe_w1"],
                    lp["moe_w2"],
                    cfg.num_experts_per_tok,
                    cfg.norm_topk_prob,
                    act_fn,
                    lp.get("moe_w1@scale"),
                    lp.get("moe_w2@scale"),
                )
            else:
                gate_up = _mm(x, lp, "gate_up_w", w8a8).astype(x.dtype)
                y = act_fn(gate_up)
                y = _mm(y, lp, "down_w", w8a8).astype(x.dtype)
            y = _maybe_psum(y, tp)

        return (y, residual, kv_pool, layer_id + 1), None

    # remat (training only — the quality fixture differentiates this
    # forward): recompute each layer's internals in the backward pass so
    # activation memory is one layer deep, not num_layers deep (the
    # 28-layer f32 fixture's backward requested 38.9 GB without it)
    body = jax.checkpoint(layer_fn) if remat else layer_fn
    (x, residual, kv_pool, _), _ = jax.lax.scan(
        body,
        (x, jnp.zeros_like(x), kv_pool, jnp.int32(0)),
        layer_params,
    )

    hidden = rmsnorm(x + residual, params["final_norm"], eps)
    # prefill: only each request's last token produces a next-token logit
    # (reference embedding.py:87-110); scoring mode keeps every position
    if gather_last:
        hidden_last = jnp.take(hidden, meta.last_q_index, axis=0)  # [B, H]
    else:
        hidden_last = hidden  # [T, H]

    if cfg.tie_word_embeddings:
        lm_w = params["embed"].T  # [H, V/tp] — same local layout either way
        tied_scale = params.get("embed@scale")  # [1, H]: contraction axis
        if tied_scale is not None:
            # per-H scales sit on the CONTRACTION axis of the tied head —
            # fold them into the activations, then dot the raw int8 table
            hidden_last = (
                hidden_last.astype(jnp.float32) * tied_scale
            ).astype(hidden_last.dtype)
        head_scale = None
    else:
        lm_w = params["lm_head"]
        head_scale = params.get("lm_head@scale")  # [1, V/tp] epilogue
    if lm_w.dtype == jnp.int8:
        lm_w = lm_w.astype(hidden_last.dtype)
    logits_local = jnp.dot(
        hidden_last, lm_w, preferred_element_type=jnp.float32
    )  # [B, V/tp]
    if head_scale is not None:
        logits_local = logits_local * head_scale
    if tp > 1 and gather_logits:
        logits = jax.lax.all_gather(
            logits_local, MODEL_AXIS, axis=-1, tiled=True
        )
    else:
        # vocab-sharded [B, V/tp]: the token path reduces per-shard
        # argmax/top-k candidates instead of gathering [B, V] over ICI
        # (ops/sampling.py sharded samplers)
        logits = logits_local
    return logits, kv_pool
