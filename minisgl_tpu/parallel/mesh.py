"""Device mesh construction and axis conventions.

TPU-native replacement for the reference's process-per-rank NCCL world
(/root/reference/python/minisgl/distributed/info.py:6-31,
engine/engine.py:112-137): instead of N OS processes each owning one GPU, a
single controller process owns a ``jax.sharding.Mesh`` over all local (and,
multi-host, global) chips. Axis names:

- ``"data"``: replica axis (future DP / multi-slice), size 1 for TP-only.
- ``"model"``: tensor-parallel axis over ICI; all layer shardings and psums
  reference this name.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclass(frozen=True)
class MeshInfo:
    mesh: Mesh
    tp_size: int
    dp_size: int

    @property
    def axis_names(self):
        return (DATA_AXIS, MODEL_AXIS)

    def sharding(self, spec: P) -> NamedSharding:
        return NamedSharding(self.mesh, spec)

    @property
    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())


def create_mesh(
    tp_size: int,
    dp_size: int = 1,
    devices: Optional[list] = None,
) -> MeshInfo:
    devices = devices if devices is not None else jax.devices()
    need = tp_size * dp_size
    if len(devices) < need:
        raise ValueError(
            f"need {need} devices for dp={dp_size} x tp={tp_size}, "
            f"have {len(devices)}"
        )
    mesh = jax.make_mesh(
        (dp_size, tp_size), (DATA_AXIS, MODEL_AXIS), devices=devices[:need]
    )
    return MeshInfo(mesh=mesh, tp_size=tp_size, dp_size=dp_size)
