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
    # Weight-only quantization (contraction axis is ``shape[-2]``):
    # - "int8": stored int8, per-output-channel scales in a sibling
    #   "<path>@scale" entry of shape [..., 1, out].
    # - "int4": two nibbles packed per int8 byte ALONG the contraction axis
    #   (stored shape halves axis -2; logical row 2p = low nibble of packed
    #   row p, 2p+1 = high), per-[group x output-channel] scales of shape
    #   [..., in/group, out]. Grouped scales keep 70B-class quality
    #   (BASELINE.md config 5); the group never crosses a TP shard.
    quant: Optional[str] = None
    # int4 scale group size along the contraction axis (set by
    # add_scale_entries so every shard/group boundary aligns).
    quant_group: int = 0
    # Set on the auto-generated "<path>@scale" entry; names the weight it
    # is derived from (loader fills both from one assembly pass).
    scale_of: Optional[str] = None

    @property
    def stored_shape(self) -> Tuple[int, ...]:
        """On-device array shape (int4 packs 2 values/byte on axis -2)."""
        if self.quant == "int4":
            s = list(self.shape)
            s[-2] //= 2
            return tuple(s)
        return self.shape


QUANT_SKIP_KEYS = ("embed", "lm_head", "rope_cache")  # quality-critical


INT4_GROUP = 128  # target scale-group size along the contraction axis


def _int4_group(in_dim: int, in_sharded: bool, tp: int) -> int:
    """Largest group <= INT4_GROUP that divides the per-shard in dim."""
    local = in_dim // tp if in_sharded else in_dim
    g = min(INT4_GROUP, local)
    while local % g:
        g -= 1
    return g


def add_scale_entries(spec: "ParamsSpec", tp: int = 1) -> "ParamsSpec":
    """For every quantized weight add its derived @scale ParamInfo."""
    import jax.numpy as jnp
    from dataclasses import replace

    out: ParamsSpec = {}
    for path, info in spec.items():
        out[path] = info
        if info.quant not in ("int8", "int4"):
            continue
        in_axis = len(info.shape) - 2
        padded_spec = tuple(info.spec) + (None,) * (
            len(info.shape) - len(tuple(info.spec))
        )
        if info.quant == "int8":
            n_rows = 1
            # the single scale row is replicated along the in axis
            scale_spec = P(
                *(None if i == in_axis else e for i, e in enumerate(padded_spec))
            )
        else:  # int4: grouped rows inherit the weight's in-axis sharding
            g = _int4_group(
                info.shape[in_axis], padded_spec[in_axis] is not None, tp
            )
            out[path] = replace(info, quant_group=g)
            n_rows = info.shape[in_axis] // g
            scale_spec = P(*padded_spec)
        scale_shape = tuple(
            n_rows if i == in_axis else d for i, d in enumerate(info.shape)
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


def quantize_int4(arr: np.ndarray, group: int) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric int4 with per-(group, output-channel) scales; pairs packed
    low/high nibble along the contraction axis (-2). Returns
    (packed int8 [..., in/2, out], scales f32 [..., in/group, out])."""
    in_dim, out_dim = arr.shape[-2], arr.shape[-1]
    assert in_dim % group == 0 and in_dim % 2 == 0, (in_dim, group)
    lead = arr.shape[:-2]
    g_view = arr.reshape(*lead, in_dim // group, group, out_dim)
    scale = np.max(np.abs(g_view), axis=-2, keepdims=True) / 7.0
    scale = np.maximum(scale, 1e-8).astype(np.float32)
    q = np.clip(np.rint(g_view / scale), -8, 7).astype(np.int8)
    q = q.reshape(*lead, in_dim, out_dim)
    lo = q[..., 0::2, :].astype(np.uint8) & 0xF
    hi = q[..., 1::2, :].astype(np.uint8) & 0xF
    packed = (lo | (hi << 4)).view(np.int8)
    return packed, scale.reshape(*lead, in_dim // group, out_dim)


def unpack_int4(packed, out_dtype=None):
    """jnp: [..., in/2, out] int8 -> [..., in, out] int8 nibbles (-8..7)."""
    import jax.numpy as jnp

    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)  # arithmetic: sign-ext
    hi = jnp.right_shift(packed, 4)
    full = jnp.stack([lo, hi], axis=-2)  # [..., in/2, 2, out]
    shape = packed.shape[:-2] + (packed.shape[-2] * 2, packed.shape[-1])
    full = full.reshape(shape)
    return full if out_dtype is None else full.astype(out_dtype)


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
