"""Attention backend registry.

Counterpart of /root/reference/python/minisgl/attention/__init__.py:19-68
(registry + create_attention_backend). A backend here is a pure callable
``attn_impl(q, kv_pool, meta) -> o`` used inside the jitted step; backends
close over static geometry (page size, head dim, softmax scale). The pool is
the combined [L*P, page_size, 2*kvh, hd] layout (ops/kv.py) and
``meta.page_table`` arrives pre-offset to the current layer's page space.

"auto" resolves to the Pallas kernel on TPU and the XLA composite on CPU —
the analogue of the reference's arch-based auto-select
(engine/engine.py:218-233).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax

from minisgl_tpu.attention.metadata import AttnMetadata
from minisgl_tpu.attention.xla_backend import xla_paged_attention
from minisgl_tpu.utils import Registry

AttnImpl = Callable[..., jax.Array]

SUPPORTED_ATTN_BACKENDS: Registry[Callable[..., AttnImpl]] = Registry(
    "attention backend"
)


def with_store(impl: AttnImpl) -> AttnImpl:
    """Adapt a read-only attention impl to the unified interface
    ``impl(q, kv, meta, new_kv=(k, v, out_slots_abs)) -> (o, kv)``:
    store the new tokens' KV (ops.kv.store_kv), then attend. The Pallas
    decode kernel implements the store in-kernel instead (fused path)."""

    def wrapped(q, kv, meta, new_kv=None):
        if new_kv is None:
            return impl(q, kv, meta)
        from minisgl_tpu.ops.kv import pool_page_size, store_kv

        k_new, v_new, slots = new_kv
        kv = store_kv(
            kv, 0, 1, slots, k_new, v_new,
            max_runs=_max_store_runs(kv, meta, k_new),
        )
        return impl(q, kv, meta), kv

    return wrapped


def _max_store_runs(kv, meta, k_new) -> int:
    """Static bound on the page runs a batched store can contain (ops/kv.py
    _store_runs): per request <= its pages + 1 boundary run, plus one
    padding-gap run per request and the tail — T/ps + 3B + 4 covers it."""
    from minisgl_tpu.ops.kv import pool_page_size

    T = meta.out_slots.shape[0]
    B = meta.seq_lens.shape[0]
    ps = pool_page_size(kv.data, k_new.shape[1])
    return min(T, T // ps + 3 * B + 4)


def _make_xla_backend(*, page_size: int, head_dim: int, phase: str) -> AttnImpl:
    return with_store(
        partial(xla_paged_attention, page_size=page_size, scale=head_dim**-0.5)
    )


SUPPORTED_ATTN_BACKENDS.register("xla", _make_xla_backend)


def _make_pallas_backend(*, page_size: int, head_dim: int, phase: str) -> AttnImpl:
    from minisgl_tpu.attention.pallas_backend import make_pallas_attention

    return make_pallas_attention(
        page_size=page_size, scale=head_dim**-0.5, phase=phase
    )


SUPPORTED_ATTN_BACKENDS.register("pallas", _make_pallas_backend)


def _make_rpa_backend(*, page_size: int, head_dim: int, phase: str) -> AttnImpl:
    """jax.experimental ragged-paged-attention kernel (library-tuned)."""
    from minisgl_tpu.attention.rpa_backend import rpa_attention

    return with_store(partial(rpa_attention, scale=head_dim**-0.5))


SUPPORTED_ATTN_BACKENDS.register("rpa", _make_rpa_backend)


def resolve_backend_name(name: str) -> str:
    if name != "auto":
        return name
    platform = jax.default_backend()
    return "xla" if platform == "cpu" else "pallas"


def create_attention_backend(
    name: str, *, page_size: int, head_dim: int, phase: str
) -> AttnImpl:
    factory = SUPPORTED_ATTN_BACKENDS.get(resolve_backend_name(name))
    return factory(page_size=page_size, head_dim=head_dim, phase=phase)


def validate_attn_backend(name: str) -> str:
    if name != "auto" and name not in SUPPORTED_ATTN_BACKENDS:
        raise ValueError(
            f"unknown attention backend '{name}'; supported: "
            f"{['auto'] + SUPPORTED_ATTN_BACKENDS.supported_names()}"
        )
    return name
