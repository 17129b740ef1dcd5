"""Teacher-forced NLL / perplexity harness — the quantization quality gate.

BASELINE.md's north star demands "<= 0.1 ppl vs BF16" for the quantized
configurations; the reference has no quality harness at all (SURVEY.md §4
called this out as a gap to close). This module scores fixed token sequences
through the REAL paged pipeline — the same decoder forward, paged KV writes,
and attention backend the engine serves with (models/common.py
decoder_forward in ``gather_last=False`` scoring mode) — so quantization
error introduced anywhere in that path (int8/int4 matmuls, fp8 KV
round-trips) lands in the measured NLL.

Usage: compare ``score_nll(..., quantization="int8")`` against the bf16
baseline on the same sequences; the delta is the quantization quality loss.
With random ("dummy") weights the absolute perplexity is meaningless but the
DELTA still measures quantization noise, which is what the gate bounds —
real checkpoints simply reuse the same entry point.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from minisgl_tpu.attention import create_attention_backend
from minisgl_tpu.attention.metadata import AttnMetadata
from minisgl_tpu.models.base import create_model
from minisgl_tpu.models.config import ModelConfig
from minisgl_tpu.models.weight import init_dummy_params, load_params
from minisgl_tpu.ops.kv import KV
from minisgl_tpu.parallel.mesh import MODEL_AXIS, MeshInfo, create_mesh
from minisgl_tpu.utils import cached_load_hf_config, div_ceil


def _make_pool(
    model, mesh: MeshInfo, kv_dtype, page_size: int, n_rows: int,
    kv_layout: str,
) -> KV:
    """Empty paged pool in either layout (ops/kv.py module doc), with the
    int8 scale sidecars when needed — same shapes the engine allocates."""
    kvh = model.dims.kv_heads_eff
    hd = model.cfg.head_dim
    from minisgl_tpu.ops.kv import SCALE_P_LANES

    tp = mesh.tp_size
    kvh_local = kvh // tp if kvh % tp == 0 else kvh
    scaled = kv_dtype == jnp.int8
    if kv_layout == "plane":
        assert kvh_local % 8 == 0, "plane layout needs kvh_local % 8 == 0"
        data_shape = (n_rows, 2, page_size * kvh, hd)
    else:
        data_shape = (n_rows, page_size, 2 * kvh, hd)
    return KV(
        data=jax.device_put(
            jnp.zeros(data_shape, kv_dtype),
            mesh.sharding(
                jax.sharding.PartitionSpec(None, None, MODEL_AXIS, None)
            ),
        ),
        scale=(
            jax.device_put(
                jnp.full(
                    (n_rows, 2, tp * page_size * kvh_local),
                    1e-8,
                    jnp.float32,
                ),
                mesh.sharding(
                    jax.sharding.PartitionSpec(None, None, MODEL_AXIS)
                ),
            )
            if scaled
            else None
        ),
        scale_p=(
            jax.device_put(
                jnp.zeros(
                    (n_rows, page_size, tp * SCALE_P_LANES), jnp.float32
                ),
                mesh.sharding(
                    jax.sharding.PartitionSpec(None, None, MODEL_AXIS)
                ),
            )
            if scaled
            else None
        ),
    )


def _score_one(
    model,
    params,
    mesh: MeshInfo,
    attn,
    kv_dtype,
    page_size: int,
    q_align: int,
    ids: np.ndarray,
    kv_layout: str = "heads",
) -> float:
    """Sum NLL (nats) of ids[1:] given the preceding context."""
    T = len(ids)
    Tp = div_ceil(T, q_align) * q_align  # pallas prefill block alignment
    pages_cap = div_ceil(Tp, page_size)
    L = model.cfg.num_layers
    n_rows = (pages_cap + 1) * L
    kv = _make_pool(model, mesh, kv_dtype, page_size, n_rows, kv_layout)
    slot0 = page_size  # page 0 is the dummy page
    out_slots = np.zeros((Tp,), np.int32)  # padding rows write the dummy page
    out_slots[:T] = slot0 + np.arange(T, dtype=np.int32)
    positions = np.zeros((Tp,), np.int32)
    positions[:T] = np.arange(T, dtype=np.int32)
    q_req_ids = np.full((Tp,), -1, np.int32)  # padding rows mask to nothing
    q_req_ids[:T] = 0
    ids_pad = np.zeros((Tp,), np.int32)
    ids_pad[:T] = ids
    # pow2-padded table width (engine discipline): the pallas kernels
    # require the width to be a multiple of their DMA chunk
    PBW = 1 << (pages_cap - 1).bit_length()
    pt = np.zeros((1, PBW), np.int32)
    pt[0, :pages_cap] = np.arange(1, pages_cap + 1, dtype=np.int32)
    meta = AttnMetadata(
        out_slots=jnp.asarray(out_slots),
        positions=jnp.asarray(positions),
        page_table=jnp.asarray(pt),
        seq_lens=jnp.asarray(np.array([T], np.int32)),
        q_req_ids=jnp.asarray(q_req_ids),
        last_q_index=jnp.asarray(np.array([T - 1], np.int32)),
        cu_q_lens=jnp.asarray(np.array([0, Tp], np.int32)),
        num_seqs=jnp.asarray(np.array([1], np.int32)),
    )

    param_specs = {k: v.spec for k, v in model.params_spec.items()}

    kv_specs = KV(
        data=jax.sharding.PartitionSpec(None, None, MODEL_AXIS, None),
        scale=(
            None
            if kv.scale is None
            else jax.sharding.PartitionSpec(None, None, MODEL_AXIS)
        ),
        scale_p=(
            None
            if kv.scale_p is None
            else jax.sharding.PartitionSpec(None, None, MODEL_AXIS)
        ),
    )

    def fwd(params, kv, input_ids):
        logits, _ = model.forward(
            params, input_ids, kv, meta, attn, gather_last=False
        )
        logp = jax.nn.log_softmax(logits[: T - 1].astype(jnp.float32), axis=-1)
        tgt = jnp.take_along_axis(
            logp, input_ids[1:T, None].astype(jnp.int32), axis=1
        )
        return -jnp.sum(tgt)

    sharded = jax.shard_map(
        fwd,
        mesh=mesh.mesh,
        in_specs=(
            param_specs,
            kv_specs,
            jax.sharding.PartitionSpec(),
        ),
        out_specs=jax.sharding.PartitionSpec(),
        check_vma=False,
    )
    nll = jax.jit(sharded)(params, kv, jnp.asarray(ids_pad, jnp.int32))
    return float(np.asarray(nll))


def _load_scoring_model(
    model_dir, tp_size, quantization, kv_dtype, use_dummy_weight, mesh
):
    cfg = ModelConfig.from_hf(cached_load_hf_config(model_dir))
    model = create_model(cfg, tp_size, quant=quantization)
    mesh = mesh or create_mesh(tp_size=tp_size)
    if use_dummy_weight:
        params = init_dummy_params(model.params_spec, mesh)
    else:
        params = load_params(model_dir, model.params_spec, mesh)
    kv_dt = {
        "auto": jnp.float32 if cfg.dtype == "float32" else jnp.bfloat16,
        "bf16": jnp.bfloat16,
        "fp8": jnp.float8_e4m3fn,
        "int8": jnp.int8,
        "float32": jnp.float32,
    }[kv_dtype]
    return cfg, model, params, mesh, kv_dt


def score_nll(
    model_dir: str,
    seqs: Sequence[Sequence[int]],
    *,
    tp_size: int = 1,
    quantization: str = "none",
    kv_dtype: str = "auto",
    backend: str = "auto",
    page_size: int = 16,
    use_dummy_weight: bool = False,
    mesh: MeshInfo | None = None,
    kv_layout: str = "heads",
) -> Dict[str, float]:
    """Teacher-forced scoring of ``seqs``; returns nll_sum / tokens / ppl."""
    cfg, model, params, mesh, kv_dt = _load_scoring_model(
        model_dir, tp_size, quantization, kv_dtype, use_dummy_weight, mesh
    )
    attn = create_attention_backend(
        backend, page_size=page_size, head_dim=cfg.head_dim, phase="prefill"
    )
    from minisgl_tpu.attention import resolve_backend_name
    from minisgl_tpu.attention.pallas_backend import QUERY_ALIGN

    q_align = QUERY_ALIGN.get(resolve_backend_name(backend), 1)
    nll_sum = 0.0
    n_tok = 0
    for ids in seqs:
        ids = np.asarray(ids, np.int32)
        nll_sum += _score_one(
            model, params, mesh, attn, kv_dt, page_size, q_align, ids,
            kv_layout,
        )
        n_tok += len(ids) - 1
    return {
        "nll_sum": nll_sum,
        "tokens": n_tok,
        "nll_per_token": nll_sum / max(1, n_tok),
        "ppl": float(np.exp(nll_sum / max(1, n_tok))),
    }


def score_nll_decode(
    model_dir: str,
    seqs: Sequence[Sequence[int]],
    *,
    tp_size: int = 1,
    quantization: str = "none",
    kv_dtype: str = "auto",
    backend: str = "auto",
    page_size: int = 16,
    use_dummy_weight: bool = False,
    mesh: MeshInfo | None = None,
    kv_layout: str = "heads",
) -> Dict[str, float]:
    """Teacher-forced scoring through the DECODE path: one decode-phase
    forward per position (fused KV store + paged decode attention — the
    kernel that actually serves), tokens forced to the corpus ids.

    Computes the same quantity as ``score_nll`` (sum NLL of ids[1:] given
    their prefix), so for an exact-arithmetic backend the two agree to
    numerical noise — making this the NLL gate for the decode kernel's
    in-kernel int8-KV dequant and scale-sidecar addressing (round-4
    VERDICT #4: a sidecar-lane-order bug would pass every prefill-path
    committed number). All sequences must share one length; they score as
    one batched lax.scan over positions (one compile, one dispatch)."""
    cfg, model, params, mesh, kv_dt = _load_scoring_model(
        model_dir, tp_size, quantization, kv_dtype, use_dummy_weight, mesh
    )
    attn = create_attention_backend(
        backend, page_size=page_size, head_dim=cfg.head_dim, phase="decode"
    )
    ids = np.asarray([np.asarray(s, np.int32) for s in seqs])
    B, T = ids.shape
    pages_per_seq = div_ceil(T, page_size)
    L = cfg.num_layers
    n_rows = (B * pages_per_seq + 1) * L
    kv = _make_pool(model, mesh, kv_dt, page_size, n_rows, kv_layout)
    # pow2-padded table width (engine discipline; pallas chunk multiple)
    PBW = 1 << (pages_per_seq - 1).bit_length()
    pt = np.zeros((B, PBW), np.int32)
    pt[:, :pages_per_seq] = (
        1 + np.arange(B * pages_per_seq, dtype=np.int32)
    ).reshape(B, pages_per_seq)

    param_specs = {k: v.spec for k, v in model.params_spec.items()}
    kv_specs = KV(
        data=jax.sharding.PartitionSpec(None, None, MODEL_AXIS, None),
        scale=(
            None
            if kv.scale is None
            else jax.sharding.PartitionSpec(None, None, MODEL_AXIS)
        ),
        scale_p=(
            None
            if kv.scale_p is None
            else jax.sharding.PartitionSpec(None, None, MODEL_AXIS)
        ),
    )
    pt_j = jnp.asarray(pt)
    rows = jnp.arange(B, dtype=jnp.int32)

    def fwd(params, kv, ids_j):
        def step(carry, t):
            kv, acc = carry
            out_slots = (
                jnp.take_along_axis(pt_j, (t // page_size)[None, None], axis=1)[
                    :, 0
                ]
                * page_size
                + t % page_size
            )
            meta = AttnMetadata(
                out_slots=out_slots,
                positions=jnp.full((B,), t, jnp.int32),
                page_table=pt_j,
                seq_lens=jnp.full((B,), t + 1, jnp.int32),
                q_req_ids=rows,
                last_q_index=rows,
                cu_q_lens=jnp.arange(B + 1, dtype=jnp.int32),
                num_seqs=jnp.asarray([B], jnp.int32),
            )
            tok = jax.lax.dynamic_slice_in_dim(ids_j, t, 1, axis=1)[:, 0]
            logits, kv = model.forward(
                params, tok, kv, meta, attn, gather_last=True
            )
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            nxt = jax.lax.dynamic_slice_in_dim(
                ids_j, jnp.minimum(t + 1, T - 1), 1, axis=1
            )[:, 0]
            tgt = jnp.take_along_axis(logp, nxt[:, None], axis=1)[:, 0]
            acc = acc + jnp.where(t + 1 < T, -jnp.sum(tgt), 0.0)
            return (kv, acc), None

        (kv, acc), _ = jax.lax.scan(
            step, (kv, jnp.float32(0.0)), jnp.arange(T, dtype=jnp.int32)
        )
        return acc

    sharded = jax.shard_map(
        fwd,
        mesh=mesh.mesh,
        in_specs=(param_specs, kv_specs, jax.sharding.PartitionSpec()),
        out_specs=jax.sharding.PartitionSpec(),
        check_vma=False,
    )
    nll_sum = float(
        np.asarray(jax.jit(sharded)(params, kv, jnp.asarray(ids)))
    )
    n_tok = B * (T - 1)
    return {
        "nll_sum": nll_sum,
        "tokens": n_tok,
        "nll_per_token": nll_sum / max(1, n_tok),
        "ppl": float(np.exp(nll_sum / max(1, n_tok))),
    }
