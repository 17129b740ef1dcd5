"""In-model decode-gap decomposition (round 5, VERDICT #3).

Round-4 finding: isolated decode-kernel calls cost 140-240 us at the
production config, but the in-model decode step costs ~2x the sum of its
parts, and isolated layout wins (1.7-3.1x) evaporate in-model. This script
measures, IN ONE PROCESS on the chip (within-run, drift-proof):

  probe      deliverable HBM bandwidth right now
  full       the engine's REAL decode step fn (K=8 burst), per MODEL step
  full_k1    the K=1 variant (dispatch amortization check)
  noattn     the same step with attention+store stubbed out (o = q):
             matmuls + sampling + token-ring cost only
  attn28     28 layer-offset pallas attention calls on the engine's real
             pool, fused store included — the in-model attention DMA
             pattern without the model around it
  attn28_ns  same without the fused store (read-only attention)

full - noattn ~ in-model attention cost; compare against attn28 to see
whether attention runs slower INSIDE the model (lost overlap, semaphore
serialization) or the non-attention remainder is the problem.

All variants are slope-timed (t(n_long) - t(n_short)) / (n_long - n_short)
over chained async dispatches, best of REPEAT, so the tunnel RTT cancels.

Usage: python benchmark/decode_gap.py [variants...]
Env: DG_BS (128) DG_KVLEN (512) DG_REPEAT (3) BENCH_* engine knobs as bench.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp")
)

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MODEL = os.path.join(
    REPO, "assets", os.environ.get("BENCH_MODEL", "qwen3-0.6b")
)
BS = int(os.environ.get("DG_BS", "128"))
KVLEN = int(os.environ.get("DG_KVLEN", "512"))
REPEAT = int(os.environ.get("DG_REPEAT", "3"))
K = int(os.environ.get("BENCH_DECODE_STEPS", "8"))


def build_engine():
    from minisgl_tpu.engine.config import EngineConfig
    from minisgl_tpu.engine.engine import Engine

    cfg = EngineConfig(
        model_path=MODEL,
        use_dummy_weight=True,
        max_running_req=BS,
        max_seq_len_override=2048,
        decode_steps=K,
        attention_backend=os.environ.get("BENCH_ATTN_BACKEND", "auto"),
        kv_dtype=os.environ.get("BENCH_KV_DTYPE", "int8"),
        quantization=os.environ.get("BENCH_QUANT", "int8"),
    )
    if os.environ.get("BENCH_KV_LAYOUT"):
        object.__setattr__(cfg, "kv_layout", os.environ["BENCH_KV_LAYOUT"])
    eng = Engine(cfg)
    assert eng.mesh_info.tp_size == 1, "decode_gap is a tp=1 harness"
    return eng


def make_meta(eng):
    """Steady-state decode batch: BS rows at kv=KVLEN, shuffled pages."""
    from minisgl_tpu.core import BatchMetadata
    from minisgl_tpu.utils import div_ceil, next_power_of_2

    ps = eng.config.page_size
    PB = next_power_of_2(eng.pages_cap)
    rng = np.random.default_rng(7)
    pages_per_row = div_ceil(KVLEN + K, ps)
    assert BS * pages_per_row <= eng.num_pages, "KV pool too small"
    perm = rng.permutation(eng.num_pages)[: BS * pages_per_row] + 1
    page_table = np.zeros((BS, PB), np.int32)
    page_table[:, :pages_per_row] = perm.reshape(BS, pages_per_row)
    pos = np.full((BS,), KVLEN - 1, np.int32)
    out_slots = (
        page_table[np.arange(BS), pos // ps] * ps + pos % ps
    ).astype(np.int32)
    return BatchMetadata(
        phase="decode",
        slot_ids=np.arange(BS, dtype=np.int32),
        out_slots=out_slots,
        positions=pos,
        page_table=page_table,
        seq_lens=np.full((BS,), KVLEN, np.int32),
        input_ids=None,
        q_req_ids=np.arange(BS, dtype=np.int32),
        last_q_index=np.arange(BS, dtype=np.int32),
        cu_q_lens=np.arange(BS + 1, dtype=np.int32),
        temperature=np.zeros(BS, np.float32),
        top_k=np.full(BS, -1, np.int32),
        top_p=np.ones(BS, np.float32),
        num_reqs=BS,
        num_tokens=BS,
    )


def slope_time(dispatch_once, n_short=4, n_long=16):
    """Per-dispatch seconds via two-point slope over chained dispatches."""
    dispatch_once()  # compile/warm
    times = {}
    for n in (n_short, n_long):
        best = float("inf")
        for _ in range(REPEAT):
            t0 = time.perf_counter()
            last = None
            for _ in range(n):
                last = dispatch_once()
            jax.block_until_ready(last)
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return (times[n_long] - times[n_short]) / (n_long - n_short)


def probe():
    sys.path.insert(0, REPO)
    from bench import _probe_hbm_gbps

    return _probe_hbm_gbps()


def main():
    from minisgl_tpu.attention.metadata import pack_step_meta
    from minisgl_tpu.engine.step import build_step_fn

    eng = build_engine()
    meta = make_meta(eng)
    packed = jax.device_put(pack_step_meta(meta), eng.mesh_info.replicated)
    PB = meta.page_table.shape[1]
    dims = (BS, BS, PB)
    names = sys.argv[1:] or [
        "full", "full_k1", "noattn", "attn28", "attn28_ns"
    ]

    p0 = probe()
    print(f"probe: {p0:.1f} GB/s deliverable", flush=True)

    kvh = eng.model.dims.kv_heads_local
    hd = eng.model_config.head_dim
    nql = eng.model.dims.q_heads_local
    L = eng.model_config.num_layers
    ppl = eng.num_pages + 1
    ps = eng.config.page_size
    kv_itemsize = eng.state.kv.data.dtype.itemsize
    # per-MODEL-step KV read bytes (page-rounded) + full weight read
    kv_bytes = (
        BS * (-(-KVLEN // ps) * ps) * 2 * kvh * hd * kv_itemsize * L
    )
    w_bytes = sum(p.nbytes for p in eng.params.values())

    def report(name, per_dispatch, model_steps):
        per_ms = per_dispatch / model_steps
        gbps = (kv_bytes + w_bytes) / per_ms / 1e9
        print(
            f"{name:10s} {per_dispatch * 1e3:8.2f} ms/dispatch  "
            f"{per_ms * 1e3:8.2f} ms/model-step  "
            f"({gbps:6.1f} GB/s if KV+weights-bound; "
            f"{gbps / p0:.2f} of probe)",
            flush=True,
        )

    for name in names:
        if name == "full" or name.startswith("full_k"):
            k = int(name[6:]) if name.startswith("full_k") else K
            step = eng._get_step_fn("decode", True, dims, decode_steps=k)

            def go(step=step):
                eng.state, toks = step(eng.params, eng.state, packed)
                return toks

            report(name, slope_time(go), k)
        elif name == "noattn":

            def stub(q, kv, m, new_kv=None):
                if new_kv is None:
                    return q
                return q, kv

            fn = build_step_fn(
                eng.model, eng.mesh_info, stub, "decode", True,
                packed_dims=dims, decode_steps=K,
                kv_has_scale=eng.kv_scaled,
            )

            def go_na():
                eng.state, toks = fn(eng.params, eng.state, packed)
                return toks

            report(name, slope_time(go_na), K)
        elif name in ("attn28", "attn28_ns"):
            store = name == "attn28"
            impl = eng._attn["decode"]
            ameta = _attn_meta(meta)

            def attn_chain(q, kv, cos_sin=None):
                def layer(carry, lid):
                    q, kv = carry
                    m_l = ameta._replace(
                        page_table=ameta.page_table + lid * ppl
                    )
                    if store:
                        k_new = q[:, :kvh, :]
                        v_new = q[:, kvh : 2 * kvh, :]
                        slots = (
                            lid * (ppl * ps) + ameta.out_slots
                        )
                        o, kv = impl(q, kv, m_l, new_kv=(k_new, v_new, slots))
                    else:
                        o = impl(q, kv, m_l)
                    return (o.astype(q.dtype), kv), None

                (q, kv), _ = jax.lax.scan(
                    layer, (q, kv), jnp.arange(L, dtype=jnp.int32)
                )
                return q, kv

            # pallas_call requires Manual mesh axes: wrap like the real step
            from jax.sharding import PartitionSpec as P

            from minisgl_tpu.engine.step import (
                KV_SCALE_P_SPEC,
                KV_SCALE_SPEC,
                KV_SPEC,
            )
            from minisgl_tpu.ops.kv import KV as KVT

            kv_specs = KVT(
                data=KV_SPEC,
                scale=KV_SCALE_SPEC if eng.kv_scaled else None,
                scale_p=KV_SCALE_P_SPEC if eng.kv_scaled else None,
            )
            jfn = jax.jit(
                jax.shard_map(
                    attn_chain,
                    mesh=eng.mesh_info.mesh,
                    in_specs=(P(), kv_specs),
                    out_specs=(P(), kv_specs),
                    check_vma=False,
                ),
                donate_argnums=1,
            )
            q0 = jnp.asarray(
                np.random.default_rng(1).standard_normal((BS, nql, hd)),
                jnp.bfloat16,
            )
            kv_state = eng.state.kv

            def go_attn():
                nonlocal q0, kv_state
                q0, kv_state = jfn(q0, kv_state)
                return q0

            report(name, slope_time(go_attn), K / K)  # 1 model step per call
            # re-adopt the (donated) pool back into engine state
            eng.state = eng.state._replace(kv=kv_state)
        else:
            print(f"unknown variant {name}")

    p1 = probe()
    print(f"probe after: {p1:.1f} GB/s", flush=True)


def _attn_meta(meta):
    from minisgl_tpu.attention.metadata import AttnMetadata

    return AttnMetadata(
        out_slots=jnp.asarray(meta.out_slots),
        positions=jnp.asarray(meta.positions),
        page_table=jnp.asarray(meta.page_table),
        seq_lens=jnp.asarray(meta.seq_lens),
        q_req_ids=jnp.asarray(meta.q_req_ids),
        last_q_index=jnp.asarray(meta.last_q_index),
        cu_q_lens=jnp.asarray(meta.cu_q_lens),
        num_seqs=jnp.asarray([meta.num_reqs], jnp.int32),
    )


if __name__ == "__main__":
    main()
