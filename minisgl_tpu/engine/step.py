"""Jitted forward-step functions: the TPU replacement for CUDA graphs.

The reference amortizes launch overhead by capturing CUDA graphs per decode
batch size (engine/graph.py:78-171). Here every (phase, bucket-shape,
all_greedy) combination jit-compiles once and replays from XLA's executable
cache; static bucket shapes come from the host-side padding in the engine.

One step = shard_map over the ("data","model") mesh of:
  gather input ids (decode: from the device token ring) -> decoder forward
  (models/common.py) -> sample -> scatter sampled tokens back to the ring.
KV pools and the token ring are donated, so XLA updates them in place — the
functional formulation of the reference's mutable Context
(core.py:100-137).
"""

from __future__ import annotations

import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from minisgl_tpu.attention.metadata import StepMetadata, unpack_step_meta
from minisgl_tpu.models.base import Model
from minisgl_tpu.models.common import AttnImpl
from minisgl_tpu.ops.sampling import (
    greedy_sharded,
    sample_tokens,
    sample_tokens_sharded,
)
from minisgl_tpu.parallel.mesh import MODEL_AXIS, MeshInfo


class DeviceState(NamedTuple):
    # ops.kv.KV: pool [L*P, page_size, 2*kvh_eff(global), hd] (K/V
    # head-blocks, heads sharded over the TP mesh axis) + optional int8
    # scale sidecars (lane dims tp-blocked, sharded on the model axis —
    # per-shard containers whose local views are [N, 2, ps*kvh_local] and
    # [N, ps, 128]; layouts in ops/kv.py)
    kv: object
    token_slots: jax.Array  # [max_running_req + 1] int32, replicated
    rng: jax.Array  # PRNGKey, replicated


KV_SPEC = P(None, None, MODEL_AXIS, None)
KV_SCALE_SPEC = P(None, None, MODEL_AXIS)
KV_SCALE_P_SPEC = P(None, None, MODEL_AXIS)




LOGPROBS_K = 8  # fixed top-k width of the logprobs step variant


def build_step_fn(
    model: Model,
    mesh_info: MeshInfo,
    attn_impl: AttnImpl,
    phase: str,
    all_greedy: bool,
    return_logits: bool = False,
    packed_dims: Tuple[int, int, int] | None = None,
    decode_steps: int = 1,
    kv_has_scale: bool = False,
    want_logprobs: bool = False,
    spec_cols: int = 0,
):
    """Returns jitted (params, state, meta) -> (state, tokens[, logits]).

    With ``packed_dims=(B, T, PB)`` the meta argument is the single packed
    int32 buffer (attention/metadata.py wire format) — ONE host->device
    transfer per step instead of one per field.

    ``decode_steps=K > 1`` fuses K decode iterations into one dispatch: the
    sampled token feeds the next iteration through the on-device token ring,
    positions/seq_lens advance and KV destinations are derived from the page
    table ON DEVICE, and the host gets tokens [K, B] back — K generated
    tokens for ONE host<->device round trip. (No reference counterpart: CUDA
    graphs still pay one launch+sync per token.)
    """
    assert phase in ("prefill", "decode", "verify")
    assert decode_steps == 1 or phase == "decode"
    if phase == "verify":
        # speculative verify (spec/lookup.py): greedy-only, token path only
        assert spec_cols > 1 and all_greedy
        assert not return_logits and not want_logprobs
    param_specs = {k: v.spec for k, v in model.params_spec.items()}

    # tp > 1 token path: keep logits vocab-sharded and reduce per-shard
    # argmax/top-k candidates across the mesh instead of all-gathering
    # [B, V] (38 MB/step bf16 at B=128, V=151k) just to pick one token per
    # row. Scoring mode (return_logits) still gathers — callers want
    # [B, V] — as does the logprobs variant (rare requests; full-vocab
    # normalization + top-k is simplest on gathered logits).
    distributed = (
        mesh_info.tp_size > 1 and not return_logits and not want_logprobs
    )

    def _one(params, state: DeviceState, meta: StepMetadata):
        if phase == "decode":
            input_ids = jnp.take(state.token_slots, meta.slot_ids)
        else:
            input_ids = meta.input_ids
        logits, kv_pool = model.forward(
            params, input_ids, state.kv, meta.attn, attn_impl,
            gather_logits=not distributed,
        )
        if all_greedy:
            if distributed:
                tokens = greedy_sharded(logits, MODEL_AXIS)
            else:
                tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            rng = state.rng
        else:
            rng, subkey = jax.random.split(state.rng)
            # position of each row's sampled token (seq_lens counts this
            # step's tokens): drives per-request seeded sampling streams
            sample_pos = meta.attn.seq_lens - 1
            if distributed:
                tokens = sample_tokens_sharded(
                    logits, meta.sampling, subkey, MODEL_AXIS,
                    positions=sample_pos,
                )
            else:
                tokens = sample_tokens(
                    logits, meta.sampling, subkey, positions=sample_pos
                )
        if want_logprobs:
            logz = jax.scipy.special.logsumexp(
                logits.astype(jnp.float32), axis=-1, keepdims=True
            )
            lp = logits - logz  # [B, V] log-probabilities
            top_vals, top_ids = jax.lax.top_k(lp, LOGPROBS_K)
            tok_lp = jnp.take_along_axis(lp, tokens[:, None], axis=-1)[:, 0]
            extras = (tok_lp, top_ids.astype(jnp.int32), top_vals)
        else:
            extras = None
        token_slots = state.token_slots.at[meta.slot_ids].set(tokens)
        return DeviceState(kv_pool, token_slots, rng), tokens, logits, extras

    def _verify(params, state: DeviceState, meta: StepMetadata):
        """Speculative verify: one extend forward over each row's [last
        accepted token + staged drafts], greedy targets at EVERY fed
        position, then the longest-matching draft prefix is accepted. The
        token ring gets each row's last accepted token ON DEVICE (the host
        learns acceptance only when it fetches the [C, B] targets), so a
        plain decode step can always follow a verify step."""
        B, C = meta.slot_ids.shape[0], spec_cols
        logits, kv_pool = model.forward(
            params, meta.input_ids, state.kv, meta.attn, attn_impl,
            gather_logits=not distributed,
        )  # [B*C, V or V/tp]: gathered at the widened last_q_index
        if distributed:
            flat = greedy_sharded(logits, MODEL_AXIS)
        else:
            flat = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        g = flat.reshape(B, C)  # g[:, j] = target after the j-th fed token
        fed = jnp.take(meta.input_ids, meta.attn.last_q_index).reshape(B, C)
        # draft j (fed column j+1) is accepted iff every earlier draft
        # matched and the model's target g[:, j] equals it
        dmask = jnp.arange(C - 1, dtype=jnp.int32)[None, :] < meta.draft_len[:, None]
        match = jnp.logical_and(g[:, :-1] == fed[:, 1:], dmask)
        m = jnp.cumprod(match.astype(jnp.int32), axis=1).sum(axis=1)  # [B]
        last_tok = jnp.take_along_axis(g, m[:, None], axis=1)[:, 0]
        token_slots = state.token_slots.at[meta.slot_ids].set(last_tok)
        # [C, B]: the scheduler consumes burst columns like multi-step decode
        return DeviceState(kv_pool, token_slots, state.rng), g.T

    def _impl(params, state: DeviceState, meta):
        if packed_dims is not None:
            B, T, PB = packed_dims
            meta = unpack_step_meta(meta, B, T, PB, phase, spec_cols=spec_cols)
        if phase == "verify":
            return _verify(params, state, meta)
        if decode_steps == 1:
            new_state, tokens, logits, extras = _one(params, state, meta)
            if return_logits:
                return new_state, tokens, logits
            if want_logprobs:
                # leading K=1 axis matches the multi-step layout
                return new_state, tokens, tuple(
                    e[None] for e in extras
                )
            return new_state, tokens

        from minisgl_tpu.ops.kv import pool_page_size

        # shard-local pool: plane pools carry ps*kvh_local on axis 2
        ps = pool_page_size(state.kv.data, model.dims.kv_heads_local)
        K, B = decode_steps, meta.attn.seq_lens.shape[0]

        def body(i, carry):
            state, toks, lps = carry
            pos = meta.attn.positions + i  # [B] (decode: 1 token per row)
            out_slots = (
                jnp.take_along_axis(
                    meta.attn.page_table, (pos // ps)[:, None], axis=1
                )[:, 0]
                * ps
                + pos % ps
            )
            meta_i = meta._replace(
                attn=meta.attn._replace(
                    positions=pos,
                    seq_lens=meta.attn.seq_lens + i,
                    out_slots=out_slots,
                    last_q_index=jnp.arange(B, dtype=jnp.int32),
                )
            )
            state, tokens, _, extras = _one(params, state, meta_i)
            toks = jax.lax.dynamic_update_index_in_dim(toks, tokens, i, axis=0)
            if want_logprobs:
                lps = tuple(
                    jax.lax.dynamic_update_index_in_dim(acc, e, i, axis=0)
                    for acc, e in zip(lps, extras)
                )
            return state, toks, lps

        lps0 = (
            (
                jnp.zeros((K, B), jnp.float32),
                jnp.zeros((K, B, LOGPROBS_K), jnp.int32),
                jnp.zeros((K, B, LOGPROBS_K), jnp.float32),
            )
            if want_logprobs
            else ()
        )
        # Each fori_loop iteration boundary costs ~2 ms more than a
        # program boundary (BENCHLOG round-5 K-burst decomposition: lost
        # cross-iteration pipelining inside the compiled loop; the
        # sampled-token -> next-embed dependency is identical either way).
        # unroll>1 trades compile time / program size for that pipelining.
        unroll = int(os.environ.get("MSLT_BURST_UNROLL", "1"))
        state, toks, lps = jax.lax.fori_loop(
            0,
            K,
            body,
            (state, jnp.zeros((K, B), jnp.int32), lps0),
            unroll=max(1, min(unroll, K)),
        )
        if want_logprobs:
            return state, toks, lps
        return state, toks

    from minisgl_tpu.ops.kv import KV

    sspecs = DeviceState(
        kv=KV(
            data=KV_SPEC,
            scale=KV_SCALE_SPEC if kv_has_scale else None,
            scale_p=KV_SCALE_P_SPEC if kv_has_scale else None,
        ),
        token_slots=P(),
        rng=P(),
    )
    if return_logits:
        out_specs = (sspecs, P(), P())
    elif want_logprobs:
        out_specs = (sspecs, P(), (P(), P(), P()))
    else:
        out_specs = (sspecs, P())
    sharded = jax.shard_map(
        _impl,
        mesh=mesh_info.mesh,
        in_specs=(param_specs, sspecs, P()),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(1,))
