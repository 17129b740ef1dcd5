"""Streaming safetensors -> sharded device arrays.

Counterpart of /root/reference/python/minisgl/models/weight.py:34-124
(streaming shard/merge loader) re-designed for the declarative ParamInfo
table: for each target parameter we fetch its checkpoint sources by name
(random access via safe_open handles), apply per-source transforms
(transpose / KV-head replication), merge, stack, apply the shard-major
interleave, then ``jax.device_put`` once with the param's NamedSharding — so
each chip only materializes its shard and host memory holds one global tensor
at a time.

Also provides dummy-weight initialization (reference engine.py:139-146
--dummy-weight) for perf testing without checkpoints.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Tuple

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


class _SafetensorIndex:
    """name -> (file handle) random-access index over all checkpoint files."""

    def __init__(self, model_dir: str):
        from safetensors import safe_open

        self._handles = {}
        self._where: Dict[str, str] = {}
        for path in list_safetensor_files(model_dir):
            handle = safe_open(path, framework="np")
            self._handles[path] = handle
            for name in handle.keys():
                self._where[name] = path

    def get(self, name: str) -> np.ndarray:
        if name not in self._where:
            raise KeyError(f"checkpoint tensor '{name}' not found")
        return self._handles[self._where[name]].get_tensor(name)

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
    if info.stack:
        members = [
            _assemble_member(idx, member, info.merge_axis)
            for member in info.sources
        ]
        arr = np.stack(members, axis=0)
    else:
        arr = _assemble_member(idx, info.sources, info.merge_axis)
    if info.post_transform is not None:
        arr = info.post_transform(arr)
    arr = arr.reshape(info.shape)
    return arr


def load_params(
    model_dir: str, spec: ParamsSpec, mesh_info: MeshInfo
) -> Params:
    """Load checkpoint params, placing each with its NamedSharding."""
    idx = _SafetensorIndex(model_dir)
    params: Params = {}
    for path, info in spec.items():
        if info.scale_of is not None:
            continue  # produced alongside its weight below
        if info.init is not None:
            arr = info.init()
        else:
            arr = assemble_param(idx, info)
        if info.quant in ("int8", "int4"):
            if info.quant == "int8":
                q, scale = quantize_int8(np.asarray(arr, np.float32))
            else:
                q, scale = quantize_int4(
                    np.asarray(arr, np.float32), info.quant_group
                )
            params[path] = jax.device_put(
                jnp.asarray(q), mesh_info.sharding(info.spec)
            )
            sinfo = spec[path + "@scale"]
            params[path + "@scale"] = jax.device_put(
                jnp.asarray(scale, sinfo.dtype), mesh_info.sharding(sinfo.spec)
            )
        else:
            params[path] = jax.device_put(
                jnp.asarray(arr, dtype=info.dtype), mesh_info.sharding(info.spec)
            )
        del arr
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
