"""Model bundle: config + dims + param table + forward entry.

Counterpart of reference models/base.py:12-14 + models/__init__.py:7-11
(create_model / BaseLLMModel), reshaped for the functional world: a Model is
static metadata plus a pure ``forward`` closed over nothing mutable.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax

from minisgl_tpu.attention.metadata import AttnMetadata
from minisgl_tpu.layers.params import ParamsSpec
from minisgl_tpu.models.common import (
    AttnImpl,
    ModelDims,
    ModelExtras,
    build_param_specs,
    decoder_forward,
)
from minisgl_tpu.models.config import ModelConfig
from minisgl_tpu.models.registry import resolve_extras

import minisgl_tpu.models.families  # noqa: F401  (populate registry)


@dataclass(frozen=True)
class Model:
    cfg: ModelConfig
    dims: ModelDims
    extras: ModelExtras
    params_spec: ParamsSpec
    # "none" | "int8" (weight-only) | "w8a8" (+dynamic activation quant)
    quant: str = "none"

    def forward(
        self,
        params,
        input_ids: jax.Array,
        kv_pool,  # ops.kv.KV pytree
        meta: AttnMetadata,
        attn_impl: AttnImpl,
        gather_last: bool = True,
        gather_logits: bool = True,
        remat: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        return decoder_forward(
            params,
            self.cfg,
            self.dims,
            self.extras,
            input_ids,
            kv_pool,
            meta,
            attn_impl,
            w8a8=self.quant == "w8a8",
            gather_last=gather_last,
            gather_logits=gather_logits,
            remat=remat,
        )


def create_model(cfg: ModelConfig, tp_size: int, quant: str = "none") -> Model:
    extras = resolve_extras(cfg)
    dims = ModelDims.build(cfg, tp_size)
    if quant == "int4" and cfg.is_moe:
        raise NotImplementedError(
            "int4 targets dense 70B-class models (BASELINE.md config 5); "
            "the grouped-GEMM MoE path has no packed-int4 kernel yet"
        )
    # w8a8 stores the same int8 weights; the activation path differs
    spec_quant = "int8" if quant == "w8a8" else quant
    spec = build_param_specs(cfg, dims, extras, quant=spec_quant)
    return Model(
        cfg=cfg, dims=dims, extras=extras, params_spec=spec, quant=quant
    )
