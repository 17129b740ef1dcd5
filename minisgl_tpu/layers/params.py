"""Declarative parameter metadata: shapes, TP shardings, HF weight mapping.

This replaces the reference's nn.Module-like reflection framework
(/root/reference/python/minisgl/layers/base.py:15-99) and its imperative
shard-on-load rules (models/weight.py:34-72) with a single declarative table:
each model builds a flat ``{path: ParamInfo}`` dict describing, per tensor,

- the GLOBAL logical shape/dtype (JAX layout: matmul weights are [in, out] so
  forward is ``x @ W`` — transposed from HF's [out, in]),
- the ``PartitionSpec`` over the ("data", "model") mesh,
- which HF checkpoint tensor(s) produce it and how (transpose, concat-merge
  for gate_up/qkv, per-head replication when kv_heads < tp, expert stacking).

The weight loader (models/weight.py), dummy initializer, and shard_map
in_specs are all derived from this one table.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np
from jax.sharding import PartitionSpec as P

from minisgl_tpu.parallel.mesh import MODEL_AXIS

Transform = Callable[[np.ndarray], np.ndarray]


@dataclass
class HFSource:
    name: str
    transform: Optional[Transform] = None


@dataclass
class ParamInfo:
    shape: Tuple[int, ...]
    dtype: Any
    spec: P
    # Checkpoint sources. stack=False: List[HFSource], concatenated along
    # merge_axis when >1 (gate_up / qkv merge). stack=True: List[List[
    # HFSource]] — one sublist per stack member (layer or (layer, expert)),
    # each sublist merged along merge_axis, members stacked on a new axis 0.
    sources: List[Any] = field(default_factory=list)
    merge_axis: int = -1
    stack: bool = False
    # Applied to the assembled (merged/stacked) global tensor — e.g. the
    # shard-major interleave for merged weights.
    post_transform: Optional[Transform] = None
    # Computed buffers (e.g. RoPE cos/sin cache) provide an init instead.
    init: Optional[Callable[[], np.ndarray]] = None
    # Weight-only quantization: "int8" stores this tensor as int8 with
    # per-output-channel scales in a sibling "<path>@scale" entry (the
    # contraction axis is ``shape[-2]``; scales have shape[..., 1, out]).
    quant: Optional[str] = None
    # Set on the auto-generated "<path>@scale" entry; names the weight it
    # is derived from (loader fills both from one assembly pass).
    scale_of: Optional[str] = None


QUANT_SKIP_KEYS = ("embed", "lm_head", "rope_cache")  # quality-critical


def add_scale_entries(spec: "ParamsSpec") -> "ParamsSpec":
    """For every quantized weight add its derived @scale ParamInfo."""
    import jax.numpy as jnp

    out: ParamsSpec = {}
    for path, info in spec.items():
        out[path] = info
        if info.quant == "int8":
            in_axis = len(info.shape) - 2
            scale_shape = tuple(
                1 if i == in_axis else d for i, d in enumerate(info.shape)
            )
            scale_spec = P(
                *(
                    None if i == in_axis else e
                    for i, e in enumerate(
                        tuple(info.spec) + (None,) * (len(info.shape) - len(tuple(info.spec)))
                    )
                )
            )
            out[path + "@scale"] = ParamInfo(
                scale_shape, jnp.float32, scale_spec, scale_of=path
            )
    return out


def quantize_int8(arr: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-output-channel symmetric int8: contraction axis is -2."""
    scale = np.max(np.abs(arr), axis=-2, keepdims=True) / 127.0
    scale = np.maximum(scale, 1e-8).astype(np.float32)
    q = np.clip(np.rint(arr / scale), -127, 127).astype(np.int8)
    return q, scale


ParamsSpec = Dict[str, ParamInfo]


def t_transpose(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x.T)


def t_transpose_cast(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x.T)


def make_kv_replicate(num_heads: int, head_dim: int, mult: int) -> Transform:
    """Transpose [out, in] -> [in, out] and replicate each KV head ``mult``
    times consecutively along the out axis, so that with a contiguous
    column-shard over the model axis, the device group that shares one
    original KV head each receives its own copy (the TPU formulation of the
    reference's KV-head replication, models/weight.py:34-52 +
    utils/misc.py:20-25)."""

    def f(x: np.ndarray) -> np.ndarray:
        w = x.T  # [in, num_heads * head_dim]
        in_dim = w.shape[0]
        w = w.reshape(in_dim, num_heads, head_dim)
        w = np.repeat(w, mult, axis=1)
        return np.ascontiguousarray(w.reshape(in_dim, num_heads * mult * head_dim))

    return f


def make_kv_replicate_bias(num_heads: int, head_dim: int, mult: int) -> Transform:
    def f(x: np.ndarray) -> np.ndarray:
        b = x.reshape(num_heads, head_dim)
        b = np.repeat(b, mult, axis=0)
        return np.ascontiguousarray(b.reshape(num_heads * mult * head_dim))

    return f


def make_shard_interleave(parts: List[int], tp: int, axis: int = -1) -> Transform:
    """Reorder a merged tensor (concat of ``parts`` along ``axis``) into
    shard-major order so a contiguous shard over the model axis receives
    ``[part0_shard_d, part1_shard_d, ...]`` — the layout the in-shard split of
    merged gate_up / qkv projections requires. This is the declarative
    formulation of the reference's per-rank merge buffers
    (models/weight.py:55-60: each rank shards each part separately then
    concatenates locally)."""

    if tp == 1 and len(parts) >= 1:
        return lambda x: x

    def f(x: np.ndarray) -> np.ndarray:
        ax = axis % x.ndim
        total = x.shape[ax]
        assert total == sum(parts), (total, parts)
        chunks = []  # per shard, per part
        offs = np.cumsum([0] + parts)
        for d in range(tp):
            for p, size in enumerate(parts):
                assert size % tp == 0, (size, tp)
                psz = size // tp
                start = offs[p] + d * psz
                chunks.append(np.take(x, np.arange(start, start + psz), axis=ax))
        return np.ascontiguousarray(np.concatenate(chunks, axis=ax))

    return f


def col_spec() -> P:
    """Column-parallel (output-dim sharded) linear weight [in, out]."""
    return P(None, MODEL_AXIS)


def row_spec() -> P:
    """Row-parallel (input-dim sharded) linear weight [in, out]; forward must
    psum over the model axis after the matmul."""
    return P(MODEL_AXIS, None)


def replicated_spec() -> P:
    return P()
