"""Device-side attention metadata (a pytree of jnp arrays).

TPU counterpart of the reference's BaseAttnMetadata family
(/root/reference/python/minisgl/attention/base.py:12-34, fa.py:67-105): the
host scheduler builds these as padded numpy arrays (core.BatchMetadata) and
the engine ships them to the device once per step. All shapes are static per
(phase, bucket) so every jitted step specializes cleanly — this is the role
CUDA-graph static buffers play in the reference (engine/graph.py:20-46).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax


class AttnMetadata(NamedTuple):
    # [T] token-slot (page*page_size + offset) destination of each new token's KV
    out_slots: jax.Array
    # [T] absolute position of each new token in its sequence
    positions: jax.Array
    # [B, PAGES_CAP] page ids backing each batch row (dummy page 0 padding)
    page_table: jax.Array
    # [B] per-row KV length *including* this step's new tokens
    seq_lens: jax.Array
    # [T] batch row owning each query token (decode: arange(B))
    q_req_ids: jax.Array
    # [B] flat index of each row's last query token (prefill LM-head gather);
    # decode: arange(B)
    last_q_index: jax.Array
    # [B + 1] cumulative query lengths (ragged-attention row starts);
    # decode: arange(B + 1); padded rows repeat the final value
    cu_q_lens: jax.Array
    # [1] true (unpadded) number of sequences in the batch
    num_seqs: jax.Array

    @property
    def num_tokens(self) -> int:
        return self.out_slots.shape[0]

    @property
    def batch_size(self) -> int:
        return self.seq_lens.shape[0]


class SamplingMetadata(NamedTuple):
    # [B] — temperature <= 0 means greedy
    temperature: jax.Array
    # [B] int32, -1 => no top-k cap
    top_k: jax.Array
    # [B] f32
    top_p: jax.Array
    # [B] f32: keep candidates with prob >= min_p * max_prob; None or 0
    # disables (None only from direct constructors, the wire always ships it)
    min_p: Optional[jax.Array] = None
    # [B] int32 per-request sampling seed; 0 = unseeded (global stream)
    seed: Optional[jax.Array] = None


class StepMetadata(NamedTuple):
    attn: AttnMetadata
    sampling: SamplingMetadata
    # [B] table slot per batch row: decode gathers each row's input token from
    # the device token ring at this slot; both phases scatter the sampled
    # token back to it (the TPU analogue of the reference's GPU token_pool,
    # scheduler/table.py:9-11 + scheduler.py:227-233).
    slot_ids: jax.Array
    # prefill/verify: [T] input token ids (decode gathers from the token ring)
    input_ids: Optional[jax.Array] = None
    # verify only: [B] staged draft count per row (engine/step.py acceptance)
    draft_len: Optional[jax.Array] = None


# ---- packed wire format ----------------------------------------------------
# All per-step metadata crosses host->device as ONE int32 array (float fields
# bit-cast), because each separate transfer pays dispatch/transport latency —
# the moral equivalent of the reference staging everything through one pinned
# buffer per iteration (scheduler.py:236-267). Layout (offsets static per
# (B, T, PB, phase) bucket):
#   out_slots[T] positions[T] q_req_ids[T] (input_ids[T] prefill/verify)
#   slot_ids[B] seq_lens[B] last_q_index[G] (draft_len[B] verify only)
#   top_k[B] temperature_bits[B] top_p_bits[B] min_p_bits[B] seed[B]
#   cu_q_lens[B+1] num_seqs[1] page_table[B*PB]
# where G = B for prefill/decode; for the speculative verify phase the
# last_q_index field is WIDENED to G = B * spec_cols flat sampling-gather
# indices (spec_cols = 1 + max draft tokens) and draft_len[B] follows it.


def packed_len(
    B: int, T: int, PB: int, has_input_ids: bool, spec_cols: int = 0
) -> int:
    extra = (spec_cols - 1) * B + B if spec_cols else 0  # wide gather + draft_len
    return (4 if has_input_ids else 3) * T + 8 * B + (B + 1) + 1 + B * PB + extra


def pack_step_meta(m) -> "np.ndarray":
    """BatchMetadata (host numpy, core.py) -> one int32 buffer."""
    import numpy as np

    fields = [m.out_slots, m.positions, m.q_req_ids]
    if m.input_ids is not None:
        fields.append(m.input_ids)
    fields += [
        m.slot_ids,
        m.seq_lens,
        m.last_q_index,
    ]
    if getattr(m, "draft_len", None) is not None:
        fields.append(m.draft_len)
    fields += [
        m.top_k,
        np.ascontiguousarray(m.temperature, np.float32).view(np.int32),
        np.ascontiguousarray(m.top_p, np.float32).view(np.int32),
        np.ascontiguousarray(
            m.min_p
            if getattr(m, "min_p", None) is not None
            else np.zeros_like(m.top_p, np.float32),
            np.float32,
        ).view(np.int32),
        (
            m.seed
            if getattr(m, "seed", None) is not None
            else np.zeros(len(m.top_k), np.int32)
        ),
        m.cu_q_lens,
        np.asarray([m.num_reqs], np.int32),
        m.page_table.reshape(-1),
    ]
    return np.concatenate([np.asarray(f, np.int32).reshape(-1) for f in fields])


def unpack_step_meta(
    arr: jax.Array, B: int, T: int, PB: int, phase: str, spec_cols: int = 0
) -> StepMetadata:
    """Device-side slices of the packed buffer (inside jit: free reshapes)."""
    import jax.numpy as jnp

    o = 0

    def take(n):
        nonlocal o
        out = jax.lax.dynamic_slice_in_dim(arr, o, n)
        o += n
        return out

    out_slots = take(T)
    positions = take(T)
    q_req_ids = take(T)
    input_ids = take(T) if phase in ("prefill", "verify") else None
    slot_ids = take(B)
    seq_lens = take(B)
    last_q_index = take(B * spec_cols if phase == "verify" else B)
    draft_len = take(B) if phase == "verify" else None
    top_k = take(B)
    temperature = jax.lax.bitcast_convert_type(take(B), jnp.float32)
    top_p = jax.lax.bitcast_convert_type(take(B), jnp.float32)
    min_p = jax.lax.bitcast_convert_type(take(B), jnp.float32)
    seed = take(B)
    cu_q_lens = take(B + 1)
    num_seqs = take(1)
    page_table = take(B * PB).reshape(B, PB)
    return StepMetadata(
        attn=AttnMetadata(
            out_slots=out_slots,
            positions=positions,
            page_table=page_table,
            seq_lens=seq_lens,
            q_req_ids=q_req_ids,
            last_q_index=last_q_index,
            cu_q_lens=cu_q_lens,
            num_seqs=num_seqs,
        ),
        sampling=SamplingMetadata(
            temperature=temperature, top_k=top_k, top_p=top_p, min_p=min_p,
            seed=seed,
        ),
        slot_ids=slot_ids,
        input_ids=input_ids,
        draft_len=draft_len,
    )
