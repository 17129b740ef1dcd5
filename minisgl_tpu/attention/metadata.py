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


class StepMetadata(NamedTuple):
    attn: AttnMetadata
    sampling: SamplingMetadata
    # [B] table slot per batch row: decode gathers each row's input token from
    # the device token ring at this slot; both phases scatter the sampled
    # token back to it (the TPU analogue of the reference's GPU token_pool,
    # scheduler/table.py:9-11 + scheduler.py:227-233).
    slot_ids: jax.Array
    # prefill only: [T] input token ids (decode gathers from the token ring)
    input_ids: Optional[jax.Array] = None
