"""Decode-kernel pool-layout A/B on the real chip (round 2).

Round-2 finding: with the head-blocked pool ``[N, ps, 2*kvh, hd]`` the
decode kernel's per-plane DMA is a strided second-minor slice and its VMEM
buffers' minor dims ``(kvh=8, hd)`` are a fraction of the Mosaic tile
(half for bf16, quarter for int8) — int8 KV read *slower* than bf16 despite
half the bytes. The plane-major flattened layout ``[N, 2, ps*kvh, hd]``
makes each plane one contiguous page row and the buffers whole tiles.

Timing discipline: device timers through the axon tunnel are untrustworthy
(BENCHLOG round 1), so each variant runs ITERS kernel calls CHAINED inside
one jitted lax.scan (output feeds the next call's q) and we wall-clock the
single dispatch + host fetch.

Usage: python benchmark/kernels/bench_decode_layout.py [variant ...]
Variants: cur-bf16 cur-int8 cur-int8-noscale flat-bf16 flat-int8 flat-int8-noscale
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp")
)

import jax
import jax.numpy as jnp
import numpy as np

from minisgl_tpu.attention.metadata import AttnMetadata
from minisgl_tpu.attention.pallas_backend import pallas_ragged_paged_attention
from minisgl_tpu.ops.kv import KV

B = int(os.environ.get("LB_BS", "128"))
KV_LEN = int(os.environ.get("LB_KV_LEN", "512"))
Hq, KVH, HD = 16, 8, 128
PS = int(os.environ.get("LB_PS", "16"))
CP = int(os.environ.get("LB_CP", "8"))
N_PAGES = int(os.environ.get("LB_PAGES", str(7186 * 16))) // PS
ITERS = int(os.environ.get("LB_ITERS", "50"))
SHUFFLE = os.environ.get("LB_SHUFFLE", "1") == "1"
REPEAT = 3


def make_case(dtype, layout: str, scaled: bool):
    rng = np.random.default_rng(0)
    pages_per_seq = -(-KV_LEN // PS)
    pages_cap = 1 << (pages_per_seq - 1).bit_length()
    assert B * pages_per_seq < N_PAGES
    # scattered (shuffled) page ids: decode reads are non-contiguous in HBM
    if SHUFFLE:
        perm = rng.permutation(N_PAGES - 1)[: B * pages_per_seq] + 1
    else:
        perm = np.arange(B * pages_per_seq) + 1
    pt = np.zeros((B, pages_cap), np.int32)
    pt[:, :pages_per_seq] = perm.reshape(B, pages_per_seq)
    if layout == "flat":
        data = rng.standard_normal((N_PAGES, 2, PS * KVH, HD)) * 4
    else:  # cur and fused share the head-blocked pool layout
        data = rng.standard_normal((N_PAGES, PS, 2 * KVH, HD)) * 4
    data = (
        jnp.asarray(data, jnp.int8)
        if dtype == jnp.int8
        else jnp.asarray(data, dtype)
    )
    if not scaled:
        scale = None
    elif layout == "fused":  # interleaved sidecar [N, 1, ps*2kvh]
        scale = jnp.asarray(
            rng.uniform(0.01, 0.02, (N_PAGES, 1, PS * 2 * KVH)), jnp.float32
        )
    else:
        scale = jnp.asarray(
            rng.uniform(0.01, 0.02, (N_PAGES, 2, PS * KVH)), jnp.float32
        )
    kv = KV(data=data, scale=scale)
    q = jnp.asarray(rng.standard_normal((B, Hq, HD)), jnp.bfloat16)
    meta = AttnMetadata(
        out_slots=jnp.zeros((B,), jnp.int32),
        positions=jnp.full((B,), KV_LEN - 1, jnp.int32),
        page_table=jnp.asarray(pt),
        seq_lens=jnp.full((B,), KV_LEN, jnp.int32),
        q_req_ids=jnp.arange(B, dtype=jnp.int32),
        last_q_index=jnp.arange(B, dtype=jnp.int32),
        cu_q_lens=jnp.arange(B + 1, dtype=jnp.int32),
        num_seqs=jnp.asarray([B], jnp.int32),
    )
    return q, kv, meta


def run(name: str):
    layout = name.split("-")[0]
    dtype = jnp.int8 if "int8" in name else jnp.bfloat16
    scaled = "int8" in name and "noscale" not in name
    q0, kv, meta = make_case(dtype, layout, scaled)
    impl = functools.partial(
        pallas_ragged_paged_attention,
        scale=HD**-0.5,
        block_q=1,
        pages_per_chunk=CP,
        plane_major_ps=PS if layout == "flat" else 0,
        fused_page=layout == "fused",
    )

    def make_chain(n):
        @jax.jit
        def chain(q, kv):
            def body(q, _):
                return impl(q, kv, meta), ()

            q_fin, _ = jax.lax.scan(body, q, None, length=n)
            return q_fin

        return chain

    # Two-point slope: each timed dispatch carries one tunnel round trip
    # (tens of ms), so a single chain length biases per-call latency by
    # RTT/len. (t_long - t_short)/(len_long - len_short) cancels it.
    short, long_ = max(ITERS // 5, 1), ITERS
    chains = {n: make_chain(n) for n in (short, long_)}
    times = {}
    for n, chain in chains.items():
        np.asarray(chain(q0, kv))  # compile + warm
        best = float("inf")
        for _ in range(REPEAT):
            t0 = time.perf_counter()
            np.asarray(chain(q0, kv))  # host fetch = the only true sync
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    per_call = (times[long_] - times[short]) / (long_ - short)
    kv_bytes = B * KV_LEN * 2 * KVH * HD * jnp.dtype(dtype).itemsize
    print(
        f"{name:18s} {per_call * 1e6:9.1f} us/call  "
        f"{kv_bytes / per_call / 1e9:7.1f} GB/s",
        flush=True,
    )


def main():
    names = sys.argv[1:] or [
        "cur-bf16",
        "cur-int8-noscale",
        "cur-int8",
        "flat-bf16",
        "flat-int8-noscale",
        "flat-int8",
    ]
    for n in names:
        try:
            run(n)
        except Exception as e:  # keep going: variants fail independently
            print(f"{n:18s} FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
