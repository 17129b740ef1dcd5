"""Prefill-step cost decomposition on the real chip (round-2 VERDICT weak
#4: the prefill kernel kept round-1 tuning while decode got three kernel
generations; the offline bench now spends ~18% of wall in prefill).

Times the REAL jitted prefill step on a bench-shaped batch (N rows filling
the 8192-token bucket) and ablates: identity attention (non-attention
floor: qkv/mlp/lm-head matmuls + store), chunk-size sweep, block_q sweep.

Usage: python benchmark/prefill_ablation.py [variant ...]
Variants: full noattn cp2 cp4 cp8 bq32 bq64   (default: all)
"""

from __future__ import annotations

import os
import sys
import time

import jax
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
MODEL = os.path.join(REPO, "assets", "qwen3-0.6b")

ROWS = int(os.environ.get("ABL_ROWS", "14"))
ROW_LEN = int(os.environ.get("ABL_ROW_LEN", "584"))  # ~bench mean input
ITERS = int(os.environ.get("ABL_ITERS", "20"))
PS = int(os.environ.get("ABL_PAGE_SIZE", "128"))
KV_DTYPE = os.environ.get("ABL_KV_DTYPE", "int8")
QUANT = os.environ.get("ABL_QUANT", "int8")


def build_meta(engine, rows: int, row_len: int, q_align: int):
    from minisgl_tpu.core import BatchMetadata

    ps = engine.config.page_size
    PB = 1 << (engine.pages_cap - 1).bit_length()
    pages_per_seq = row_len // ps + 1
    T = rows * -(-row_len // q_align) * q_align
    # token bucket: next pow2
    T_pad = 1 << (T - 1).bit_length()
    page_table = np.zeros((rows, PB), np.int32)
    out_slots = np.zeros((T_pad,), np.int32)
    positions = np.zeros((T_pad,), np.int32)
    q_req_ids = np.full((T_pad,), -1, np.int32)
    cu = np.zeros((rows + 1,), np.int32)
    last_q = np.zeros((rows,), np.int32)
    off = 0
    for b in range(rows):
        pages = 1 + b * pages_per_seq + np.arange(pages_per_seq)
        page_table[b, :pages_per_seq] = pages
        pos = np.arange(row_len)
        out_slots[off : off + row_len] = (
            pages[pos // ps] * ps + pos % ps
        )
        positions[off : off + row_len] = pos
        q_req_ids[off : off + row_len] = b
        last_q[b] = off + row_len - 1
        off += -(-row_len // q_align) * q_align
        cu[b + 1] = off
    return BatchMetadata(
        phase="prefill",
        slot_ids=np.arange(rows, dtype=np.int32),
        out_slots=out_slots,
        positions=positions,
        page_table=page_table,
        seq_lens=np.full((rows,), row_len, np.int32),
        input_ids=np.random.default_rng(0).integers(
            10, 10000, (T_pad,), np.int32
        ),
        q_req_ids=q_req_ids,
        last_q_index=last_q,
        cu_q_lens=cu,
        temperature=np.zeros((rows,), np.float32),
        top_k=np.full((rows,), -1, np.int32),
        top_p=np.ones((rows,), np.float32),
        num_reqs=rows,
        num_tokens=T_pad,
    ), T_pad


def time_variant(engine, name: str) -> float:
    from minisgl_tpu.attention.metadata import pack_step_meta
    from minisgl_tpu.engine.step import build_step_fn

    attn = engine._attn["prefill"]
    if name == "noattn":

        def attn(q, pool, meta, new_kv=None):
            return q if new_kv is None else (q, pool)

    elif name == "nostore":
        # real pallas attention reads, no KV store (garbage values, same
        # traffic): full - nostore = the store path's cost
        real = engine._attn["prefill"]

        def attn(q, pool, meta, new_kv=None):
            o = real(q, pool, meta)
            return o if new_kv is None else (o, pool)

    elif name == "storeonly":
        # KV quantize+scatter only, identity attention: isolates the
        # prefill-sized store (XLA scatter above T=256, ops/kv.py)
        from minisgl_tpu.ops.kv import store_kv

        def attn(q, pool, meta, new_kv=None):
            if new_kv is None:
                return q
            k, v, slots = new_kv
            pool = store_kv(pool, 0, 1, slots, k, v)
            return q, pool

    elif name == "xlaattn":
        from minisgl_tpu.attention import create_attention_backend

        attn = create_attention_backend(
            "xla", page_size=engine.config.page_size,
            head_dim=engine.model_config.head_dim, phase="prefill",
        )
    elif name.startswith("cp") or name.startswith("bq"):
        from minisgl_tpu.attention.pallas_backend import (
            QUERY_ALIGN,
            pallas_ragged_paged_attention,
        )

        cp = int(name[2:]) if name.startswith("cp") else None
        bq = int(name[2:]) if name.startswith("bq") else QUERY_ALIGN["pallas"]
        scale = engine.model_config.head_dim**-0.5
        kw = dict(scale=scale, block_q=bq)
        if cp:
            kw["pages_per_chunk"] = cp
        # plane-major pools carry the page size implicitly (ops/kv.py)
        if engine.state.kv.data.shape[1] == 2:
            kw["plane_major_ps"] = engine.config.page_size
        attn = lambda q, pool, meta, new_kv=None: pallas_ragged_paged_attention(
            q, pool, meta, new_kv=new_kv, **kw
        )
    meta, T_pad = build_meta(engine, ROWS, ROW_LEN, engine.q_align)
    packed = jax.device_put(pack_step_meta(meta), engine.mesh_info.replicated)
    dims = (ROWS, T_pad, meta.page_table.shape[1])
    step = build_step_fn(
        engine.model, engine.mesh_info, attn, "prefill", True,
        packed_dims=dims, kv_has_scale=engine.kv_scaled,
    )
    for _ in range(3):
        engine.state, toks = step(engine.params, engine.state, packed)
    np.asarray(toks)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        engine.state, toks = step(engine.params, engine.state, packed)
    np.asarray(toks)
    dt = time.perf_counter() - t0
    ms = dt / ITERS * 1e3
    tput = ROWS * ROW_LEN * ITERS / dt
    print(f"{name:8s} {ms:8.2f} ms/step  {tput:9.0f} tok/s", flush=True)
    return ms


def main() -> None:
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp")
    )
    from minisgl_tpu.engine.config import EngineConfig
    from minisgl_tpu.engine.engine import Engine

    variants = sys.argv[1:] or ["full", "noattn", "cp2", "cp4", "cp8", "bq32", "bq64"]
    engine = Engine(
        EngineConfig(
            MODEL,
            use_dummy_weight=True,
            max_running_req=ROWS,
            max_seq_len_override=2048,
            # ABL_PAGES_MULT: inflate the pool without changing the work —
            # a store cost that scales with POOL size is a hidden copy
            num_page_override=(ROWS * (ROW_LEN // PS + 2) + 2)
            * int(os.environ.get("ABL_PAGES_MULT", "1")),
            page_size=PS,
            kv_dtype=KV_DTYPE,
            quantization=QUANT,
        )
    )
    for v in variants:
        time_variant(engine, v)


if __name__ == "__main__":
    main()
