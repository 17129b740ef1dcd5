"""Streaming safetensors -> sharded device arrays, RAM-bounded.

Counterpart of /root/reference/python/minisgl/models/weight.py:34-124
(streaming shard/merge loader) re-designed for the declarative ParamInfo
table. The discipline the reference keeps (shard each source tensor BEFORE
it is staged, never materialize a global tensor) is kept here at *member*
granularity: a stacked parameter (leading layer / (layer, expert) axes) is
assembled one member at a time — fetch the member's checkpoint sources
(random access via safe_open), transform/merge, quantize, then slice out
each addressable device's piece and accumulate it ON DEVICE with a donated
dynamic-update — so host memory never holds more than one member in f32
plus its quantized slices, regardless of layer count. A 70B-geometry
gate_up stack loads with a host peak of one layer's [H, 2I] f32 member
(~2 GB) instead of the L-times-larger global f32 stack.

Quantization per member is exact (identical to quantizing the assembled
global): int8/int4 scales reduce over the contraction axis, which lies
entirely inside one member.

Also provides dummy-weight initialization (reference engine.py:139-146
--dummy-weight) for perf testing without checkpoints, and the reference's
multimodal-checkpoint tolerance (weight.py:75-124 strips the
``language_model.`` text-tower prefix).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from minisgl_tpu.layers.params import (
    HFSource,
    ParamInfo,
    ParamsSpec,
    quantize_int4,
    quantize_int8,
)
from minisgl_tpu.parallel.mesh import MeshInfo
from minisgl_tpu.utils import init_logger, list_safetensor_files

logger = init_logger(__name__)

Params = Dict[str, jax.Array]

# text-tower prefixes multimodal checkpoints put on language-model tensors;
# stripped to aliases so a text-only ParamInfo table loads the text tower
# (reference models/weight.py:75-124)
_MM_PREFIXES = ("language_model.", "model.language_model.")


class _SafetensorIndex:
    """name -> (file handle) random-access index over all checkpoint files."""

    def __init__(self, model_dir: str):
        from safetensors import safe_open

        self._handles = {}
        self._where: Dict[str, str] = {}
        alias: Dict[str, str] = {}
        for path in list_safetensor_files(model_dir):
            handle = safe_open(path, framework="np")
            self._handles[path] = handle
            for name in handle.keys():
                self._where[name] = path
                if name.startswith(_MM_PREFIXES[0]):
                    alias[name[len(_MM_PREFIXES[0]):]] = path
                elif name.startswith(_MM_PREFIXES[1]):
                    alias["model." + name[len(_MM_PREFIXES[1]):]] = path
        # exact names win over stripped aliases
        self._alias = {k: v for k, v in alias.items() if k not in self._where}

    def get(self, name: str) -> np.ndarray:
        if name in self._where:
            return self._handles[self._where[name]].get_tensor(name)
        if name in self._alias:
            path = self._alias[name]
            for pre in _MM_PREFIXES:
                full = (
                    pre + name[len("model."):]
                    if pre.startswith("model.") and name.startswith("model.")
                    else pre + name
                )
                handle = self._handles[path]
                if full in handle.keys():
                    return handle.get_tensor(full)
        raise KeyError(f"checkpoint tensor '{name}' not found")

    def names(self) -> List[str]:
        return list(self._where)


def _assemble_member(idx: _SafetensorIndex, sources: List[HFSource], axis: int) -> np.ndarray:
    parts = []
    for src in sources:
        raw = idx.get(src.name)
        if src.transform is not None:
            raw = src.transform(raw)
        parts.append(raw)
    if len(parts) == 1:
        return parts[0]
    return np.concatenate(parts, axis=axis)


def assemble_param(idx: _SafetensorIndex, info: ParamInfo) -> np.ndarray:
    """Assemble the full GLOBAL parameter on host (test/debug reference
    path; load_params streams per member instead)."""
    if info.stack:
        members = [
            _assemble_member(idx, member, info.merge_axis)
            for member in info.sources
        ]
        arr = np.stack(members, axis=0)
        if info.post_transform is not None:
            arr = info.post_transform(arr)
    else:
        arr = _assemble_member(idx, info.sources, info.merge_axis)
        if info.post_transform is not None:
            arr = info.post_transform(arr)
    return arr.reshape(info.shape)


def _lead_dims(info: ParamInfo) -> Optional[int]:
    """Number of leading stack dims whose product equals the member count
    (1 for [L, ...], 2 for MoE [L, E, ...]); None if no split matches."""
    n = len(info.sources)
    prod = 1
    for k, d in enumerate(info.shape):
        prod *= d
        if prod == n:
            return k + 1
        if prod > n:
            return None
    return None


# jitted on-device shard accumulators, cached per (shapes, dtype)
_ACC_FNS: Dict[tuple, object] = {}


def _acc_update(acc: jax.Array, piece: jax.Array, m) -> jax.Array:
    key = ("upd", acc.shape, piece.shape, str(acc.dtype))
    fn = _ACC_FNS.get(key)
    if fn is None:
        fn = jax.jit(
            lambda a, p, i: jax.lax.dynamic_update_index_in_dim(a, p, i, 0),
            donate_argnums=0,
        )
        _ACC_FNS[key] = fn
    return fn(acc, piece, jnp.int32(m))


def _place_param_streaming(
    idx: _SafetensorIndex,
    info: ParamInfo,
    sinfo: Optional[ParamInfo],
    mesh_info: MeshInfo,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Stream one parameter to devices member-by-member. Returns the
    assembled (weight, scale-or-None) jax.Arrays with their shardings."""
    stored = tuple(info.stored_shape)
    sharding = mesh_info.sharding(info.spec)
    imap = sharding.addressable_devices_indices_map(stored)

    if info.stack:
        k = _lead_dims(info)
        members = info.sources
    else:
        k = 0
        members = [info.sources]
    if info.stack and k is None:  # unexpected geometry: assemble globally
        logger.warning("stack split failed for a param; assembling globally")
        arr = assemble_param(idx, info)
        return _quantize_and_put_global(arr, info, sinfo, mesh_info)
    # the stack axes are never sharded (model axes live on in/out dims)
    for index in imap.values():
        for lead_slice in index[:k]:
            assert lead_slice == slice(None, None, None), (
                "stacked axis must not be sharded"
            )
    member_shape = info.shape[k:]
    n = len(members)
    lead = stored[:k]

    s_sharding = s_imap = None
    if sinfo is not None:
        s_sharding = mesh_info.sharding(sinfo.spec)
        s_imap = s_sharding.addressable_devices_indices_map(tuple(sinfo.shape))

    accs: Dict[object, jax.Array] = {}
    s_accs: Dict[object, jax.Array] = {}
    for m, member_sources in enumerate(members):
        arr = _assemble_member(idx, member_sources, info.merge_axis)
        if info.post_transform is not None:
            # contract: post transforms act on trailing (non-stack) axes
            arr = info.post_transform(arr)
        arr = arr.reshape(member_shape)
        scale = None
        if info.quant == "int8":
            arr, scale = quantize_int8(np.asarray(arr, np.float32))
        elif info.quant == "int4":
            arr, scale = quantize_int4(
                np.asarray(arr, np.float32), info.quant_group
            )
        else:
            arr = np.asarray(arr, dtype=info.dtype)
        def put_slices(a: np.ndarray, index_map, acc_map) -> None:
            # int8 scales are replicated along the contraction axis, so a
            # device's index may cover the whole member scale — replication
            # just means every device receives the same piece
            for d, index in index_map.items():
                piece = np.ascontiguousarray(a[index[k:]])
                pj = jax.device_put(piece, d)
                if not info.stack:
                    acc_map[d] = pj
                    continue
                if d not in acc_map:
                    acc_map[d] = jax.device_put(
                        jnp.zeros((n, *piece.shape), a.dtype), d
                    )
                acc_map[d] = _acc_update(acc_map[d], pj, m)

        put_slices(arr, imap, accs)
        if scale is not None:
            put_slices(np.asarray(scale, sinfo.dtype), s_imap, s_accs)
        del arr, scale

    def finish(acc_map, full_shape, shd) -> jax.Array:
        shards = []
        for d in acc_map:
            a = acc_map[d]
            if info.stack and len(lead) > 1:
                a = _reshape_on_device(a, lead + a.shape[1:])
            shards.append(a)
        return jax.make_array_from_single_device_arrays(
            tuple(full_shape), shd, shards
        )

    w = finish(accs, stored, sharding)
    s = finish(s_accs, sinfo.shape, s_sharding) if sinfo is not None else None
    return w, s


def _reshape_on_device(a: jax.Array, shape: tuple) -> jax.Array:
    key = ("rsh", a.shape, tuple(shape), str(a.dtype))
    fn = _ACC_FNS.get(key)
    if fn is None:
        fn = jax.jit(
            lambda x: x.reshape(shape), donate_argnums=0
        )
        _ACC_FNS[key] = fn
    return fn(a)


def _quantize_and_put_global(
    arr: np.ndarray,
    info: ParamInfo,
    sinfo: Optional[ParamInfo],
    mesh_info: MeshInfo,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Fallback: quantize + place a fully-assembled global array."""
    if info.quant == "int8":
        q, scale = quantize_int8(np.asarray(arr, np.float32))
    elif info.quant == "int4":
        q, scale = quantize_int4(np.asarray(arr, np.float32), info.quant_group)
    else:
        q, scale = np.asarray(arr, dtype=info.dtype), None
    w = jax.device_put(q, mesh_info.sharding(info.spec))
    s = None
    if sinfo is not None:
        s = jax.device_put(
            jnp.asarray(scale, sinfo.dtype), mesh_info.sharding(sinfo.spec)
        )
    return w, s


def load_params(
    model_dir: str, spec: ParamsSpec, mesh_info: MeshInfo
) -> Params:
    """Load checkpoint params, placing each with its NamedSharding.

    Streaming discipline (reference models/weight.py:34-52): per stack
    member, slice before staging; host RSS stays bounded by one member in
    f32 — never a global stack.
    """
    idx = _SafetensorIndex(model_dir)
    params: Params = {}
    for path, info in spec.items():
        if info.scale_of is not None:
            continue  # produced alongside its weight below
        sinfo = spec.get(path + "@scale")
        if info.init is not None:
            arr = info.init()
            w, s = _quantize_and_put_global(arr, info, sinfo, mesh_info)
            del arr
        else:
            w, s = _place_param_streaming(idx, info, sinfo, mesh_info)
        params[path] = w
        if s is not None:
            params[path + "@scale"] = s
    total = sum(p.nbytes for p in params.values())
    logger.info(f"loaded {len(params)} params, {total / 1e9:.2f} GB (global)")
    return params


def init_dummy_params(
    spec: ParamsSpec, mesh_info: MeshInfo, seed: int = 0
) -> Params:
    """Random weights for perf testing (reference --dummy-weight)."""
    params: Params = {}
    rng = np.random.default_rng(seed)
    for path, info in spec.items():
        if info.init is not None:
            arr = jnp.asarray(info.init(), dtype=info.dtype)
        elif info.quant in ("int8", "int4"):
            # draw int8 directly: an int64 staging array would be 8x the
            # stored size (hundreds of GB at 70B-geometry)
            arr = jnp.asarray(
                rng.integers(-127, 128, info.stored_shape, dtype=np.int8)
            )
        elif info.scale_of is not None:
            # int8: amax/127; int4 grouped: amax/7 — same 0.02 amax stand-in
            denom = 7.0 if spec[info.scale_of].quant == "int4" else 127.0
            arr = jnp.full(info.shape, 0.02 / denom, dtype=info.dtype)
        else:
            # small-scale normal init keeps logits finite through deep stacks
            arr = jnp.asarray(
                rng.standard_normal(info.shape, dtype=np.float32) * 0.02,
                dtype=info.dtype,
            )
        params[path] = jax.device_put(arr, mesh_info.sharding(info.spec))
    return params
