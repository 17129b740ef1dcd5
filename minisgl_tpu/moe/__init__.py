"""MoE backend registry (counterpart of /root/reference/python/minisgl/moe/
__init__.py:16-27 + base.py). A backend is a pure callable

    moe_mlp(x, router_w, w1, w2, top_k, renormalize, act_fn,
            w1_scale=None, w2_scale=None) -> [T, H]

running inside the jitted step on LOCAL expert shards (intermediate dim
TP-sharded, experts replicated — reference layers/moe.py:33-43)."""

from __future__ import annotations

from typing import Callable

from minisgl_tpu.moe.ragged import ragged_moe_mlp
from minisgl_tpu.utils import Registry

MoeImpl = Callable[..., object]

SUPPORTED_MOE_BACKENDS: Registry[MoeImpl] = Registry("moe backend")
SUPPORTED_MOE_BACKENDS.register("ragged", ragged_moe_mlp)


def create_moe_backend(name: str = "auto") -> MoeImpl:
    if name == "auto":
        name = "ragged"
    return SUPPORTED_MOE_BACKENDS.get(name)
