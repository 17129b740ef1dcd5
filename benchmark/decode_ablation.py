"""Decode-step cost decomposition on the real chip (round-2 priority #1).

Round-1 left decode ~15-20x off roofline (VERDICT.md weak #1). This harness
times the REAL jitted decode burst (bs x K) end-to-end and ablates one
component at a time, because device-side timers through the axon tunnel are
untrustworthy (BENCHLOG.md caveat) — only wall clock across many dispatches
counts.

Variants:
  full        normal decode step (store + attention + lm head + sample)
  nostore     store_kv patched to identity  -> isolates the KV store cost
  noattn      attention patched to identity -> isolates the attention kernel
  nolmhead    logits patched to zeros       -> isolates lm head + argmax
  smallpool   1/4 the pages                 -> detects O(pool) copies
  k1          decode_steps=1                -> isolates per-dispatch overhead

Usage: python benchmark/decode_ablation.py [variant ...]   (default: all)
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp")
)

import jax
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
MODEL = os.path.join(REPO, "assets", "qwen3-0.6b")

BS = int(os.environ.get("ABL_BS", "128"))
K = int(os.environ.get("ABL_K", "8"))
KV_LEN = int(os.environ.get("ABL_KV_LEN", "512"))
ITERS = int(os.environ.get("ABL_ITERS", "20"))
PAGES = int(os.environ.get("ABL_PAGES", "7000"))
PS = int(os.environ.get("ABL_PAGE_SIZE", "16"))
KV_DTYPE = os.environ.get("ABL_KV_DTYPE", "auto")  # main-engine KV dtype
QUANT = os.environ.get("ABL_QUANT", "none")  # weight quantization


def build_meta(engine, bs: int, kv_len: int):
    from minisgl_tpu.core import BatchMetadata

    ps = engine.config.page_size
    PB = 1 << (engine.pages_cap - 1).bit_length()
    pages_per_seq = kv_len // ps + 1
    assert bs * pages_per_seq < engine.num_pages, "pool too small for workload"
    page_table = np.zeros((bs, PB), np.int32)
    for b in range(bs):
        page_table[b, :pages_per_seq] = (
            1 + b * pages_per_seq + np.arange(pages_per_seq)
        )
    positions = np.full((bs,), kv_len, np.int32)
    out_slots = page_table[np.arange(bs), positions // ps] * ps + positions % ps
    return BatchMetadata(
        phase="decode",
        slot_ids=np.arange(bs, dtype=np.int32),
        out_slots=out_slots.astype(np.int32),
        positions=positions,
        page_table=page_table,
        seq_lens=positions + 1,
        input_ids=None,
        q_req_ids=np.arange(bs, dtype=np.int32),
        last_q_index=np.arange(bs, dtype=np.int32),
        cu_q_lens=np.arange(bs + 1, dtype=np.int32),
        temperature=np.zeros((bs,), np.float32),
        top_k=np.full((bs,), -1, np.int32),
        top_p=np.ones((bs,), np.float32),
        num_reqs=bs,
        num_tokens=bs,
    )


def time_variant(engine, name: str, k: int) -> float:
    import minisgl_tpu.models.common as common
    from minisgl_tpu.attention import with_store
    from minisgl_tpu.attention.metadata import pack_step_meta
    from minisgl_tpu.engine.step import build_step_fn

    real_attn = engine._attn["decode"]
    attn = real_attn
    model = engine.model
    if name == "nostore":
        # attention without the (fused or prologue) store

        def attn(q, pool, meta, new_kv=None):
            o = real_attn(q, pool, meta)
            return o if new_kv is None else (o, pool)

    elif name == "noattn":
        # store happens (unfused ops.kv path), attention is the identity
        attn = with_store(lambda q, pool, meta: q)
    elif name == "nokv":
        # no store, no attention: the non-attention step floor
        def attn(q, pool, meta, new_kv=None):
            return q if new_kv is None else (q, pool)
    elif name == "rpa":
        from minisgl_tpu.attention import create_attention_backend

        attn = create_attention_backend(
            "rpa",
            page_size=engine.config.page_size,
            head_dim=engine.model_config.head_dim,
            phase="decode",
        )
    elif name.startswith("cp"):
        from minisgl_tpu.attention.pallas_backend import (
            pallas_ragged_paged_attention,
        )

        cp = int(name[2:])
        scale = engine.model_config.head_dim**-0.5
        # plane-major pools carry the page size implicitly (ops/kv.py)
        pmps = (
            engine.config.page_size
            if engine.state.kv.data.shape[1] == 2
            else 0
        )
        attn = lambda q, pool, meta, new_kv=None: pallas_ragged_paged_attention(
            q, pool, meta, scale=scale, block_q=1, pages_per_chunk=cp,
            new_kv=new_kv, plane_major_ps=pmps,
        )
    elif name == "nolmhead":
        import jax.numpy as jnp

        orig_forward = model.forward

        class _NoHead:
            params_spec = model.params_spec
            dims = model.dims

            def forward(self, params, ids, kv, meta, impl, **kw):
                logits, kv = orig_forward(params, ids, kv, meta, impl, **kw)
                # keep shape, drop the matmul: XLA DCEs the lm head
                return (
                    jnp.zeros_like(logits)
                    + ids[meta.last_q_index][:, None].astype(jnp.float32) * 0,
                    kv,
                )

        model = _NoHead()
    try:  # noqa: the try/finally shape is kept for future global patches
        meta = build_meta(engine, BS, KV_LEN)
        packed = jax.device_put(pack_step_meta(meta), engine.mesh_info.replicated)
        dims = (BS, BS, meta.page_table.shape[1])
        step = build_step_fn(
            engine.model if name != "nolmhead" else model,
            engine.mesh_info,
            attn,
            "decode",
            True,
            packed_dims=dims,
            decode_steps=k,
            kv_has_scale=engine.kv_scaled,
        )
        for _ in range(3):  # compile + warm
            engine.state, toks = step(engine.params, engine.state, packed)
        np.asarray(toks)  # block_until_ready is a no-op through the tunnel:
        t0 = time.perf_counter()  # only a host fetch truly synchronizes
        for _ in range(ITERS):
            engine.state, toks = step(engine.params, engine.state, packed)
        np.asarray(toks)  # state-dependency chain forces all ITERS bursts
        dt = time.perf_counter() - t0
        ms_step = dt / ITERS / k * 1e3
        print(
            f"{name:10s} k={k}  {dt / ITERS * 1e3:8.2f} ms/burst  "
            f"{ms_step:7.2f} ms/step  {BS * k * ITERS / dt:8.0f} tok/s",
            flush=True,
        )
        return ms_step
    finally:
        pass


def main() -> None:
    from minisgl_tpu.engine.config import EngineConfig
    from minisgl_tpu.engine.engine import Engine

    variants = sys.argv[1:] or [
        "full",
        "nostore",
        "noattn",
        "nolmhead",
        "k1",
        "smallpool",
    ]
    # smallpool/int8kv build their own engines below
    pool_variants = [v for v in variants if v not in ("smallpool", "int8kv")]

    if pool_variants:
        engine = Engine(
            EngineConfig(
                MODEL,
                use_dummy_weight=True,
                max_running_req=BS,
                max_seq_len_override=2048,
                num_page_override=PAGES * 16 // PS,
                page_size=PS,
                kv_dtype=KV_DTYPE,
                quantization=QUANT,
            )
        )
        for v in pool_variants:
            time_variant(engine, v, 1 if v == "k1" else K)
        del engine

    if "smallpool" in variants:
        # smallest pool that still fits the workload (vs PAGES for the main
        # run) — a step-time delta here means an O(pool) copy crept in
        need = BS * (KV_LEN // PS + 2) + 2
        engine = Engine(
            EngineConfig(
                MODEL,
                use_dummy_weight=True,
                max_running_req=BS,
                max_seq_len_override=2048,
                num_page_override=need,
                page_size=PS,
            )
        )
        time_variant(engine, "smallpool", K)
        del engine

    if "int8kv" in variants:
        engine = Engine(
            EngineConfig(
                MODEL,
                use_dummy_weight=True,
                max_running_req=BS,
                max_seq_len_override=2048,
                num_page_override=PAGES * 16 // PS,
                page_size=PS,
                kv_dtype="int8",
            )
        )
        time_variant(engine, "int8kv", K)


if __name__ == "__main__":
    main()
