"""Attention-kernel micro-benchmark: our Pallas kernel vs the bundled
ragged-paged-attention kernel vs the XLA composite, on serving-shaped decode
and prefill batches (Qwen3-0.6B geometry by default).

Counterpart of the reference's kernel bandwidth tests
(/root/reference/tests/kernel/test_index.py:56-63, test_store.py:36-52)
applied to the dominant kernel. Decode is KV-bandwidth-bound: the bytes-moved
estimate is the active KV footprint, so GB/s ~ how close the kernel gets to
HBM speed-of-light.

Usage: python benchmark/kernels/bench_attention.py [--backends pallas rpa xla]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np

from minisgl_tpu.attention.metadata import AttnMetadata
from minisgl_tpu.benchmark.perf import report, time_fn, time_fn_chained
from minisgl_tpu.ops.kv import KV


def make_case(B, kv_len, q_len, Hq, kvh, hd, ps, pages_cap, q_align, dtype):
    rng = np.random.default_rng(0)
    N = B * pages_cap + 1
    kv = KV(
        data=jnp.asarray(rng.standard_normal((N, ps, 2 * kvh, hd)), dtype)
    )
    pt = np.zeros((B, pages_cap), np.int32)
    pos_l, qr_l, cu = [], [], [0]
    for b in range(B):
        pt[b] = 1 + b * pages_cap + np.arange(pages_cap)
        pos = list(range(kv_len - q_len, kv_len))
        pad = (-q_len) % q_align
        pos_l += pos + [0] * pad
        qr_l += [b] * q_len + [-1] * pad
        cu.append(cu[-1] + q_len + pad)
    T = cu[-1]
    q = jnp.asarray(rng.standard_normal((T, Hq, hd)), dtype)
    meta = AttnMetadata(
        out_slots=jnp.zeros((T,), jnp.int32),
        positions=jnp.asarray(pos_l, jnp.int32),
        page_table=jnp.asarray(pt),
        seq_lens=jnp.full((B,), kv_len, jnp.int32),
        q_req_ids=jnp.asarray(qr_l, jnp.int32),
        last_q_index=jnp.zeros((B,), jnp.int32),
        cu_q_lens=jnp.asarray(cu, jnp.int32),
        num_seqs=jnp.asarray([B], jnp.int32),
    )
    return q, kv, meta


def get_impl(backend, hd, ps, phase, cp=8):
    scale = hd ** -0.5
    if backend == "pallas":
        from minisgl_tpu.attention.pallas_backend import (
            QUERY_ALIGN,
            pallas_ragged_paged_attention,
        )

        bq = QUERY_ALIGN["pallas"] if phase == "prefill" else 1
        return functools.partial(
            pallas_ragged_paged_attention, scale=scale, block_q=bq,
            pages_per_chunk=cp,
        )
    if backend == "rpa":
        from minisgl_tpu.attention.rpa_backend import rpa_attention

        return functools.partial(rpa_attention, scale=scale)
    from minisgl_tpu.attention.xla_backend import xla_paged_attention

    return functools.partial(xla_paged_attention, page_size=ps, scale=scale)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--backends", nargs="+", default=["pallas", "rpa"])
    p.add_argument("--hq", type=int, default=16)
    p.add_argument("--kvh", type=int, default=8)
    p.add_argument("--hd", type=int, default=128)
    p.add_argument("--ps", type=int, default=16)
    p.add_argument("--cp", type=int, default=8, help="pages per DMA chunk (pallas)")
    p.add_argument(
        "--device-timed",
        action="store_true",
        help="use block_until_ready timing (UNTRUSTWORTHY through the axon "
        "tunnel; default is chained-scan wall clock)",
    )
    p.add_argument(
        "--iters", type=int, default=200,
        help="chained calls per dispatch (amortizes the tunnel RTT)",
    )
    args = p.parse_args()
    Hq, kvh, hd, ps = args.hq, args.kvh, args.hd, args.ps
    itemsize = 2  # bf16

    cases = [
        ("decode b64 kv1024", 64, 1024, 1, "decode"),
        ("decode b128 kv512", 128, 512, 1, "decode"),
        ("decode b8 kv4096", 8, 4096, 1, "decode"),
        ("prefill 1x2048", 1, 2048, 2048, "prefill"),
        ("extend 1x(3584+512)", 1, 4096, 512, "prefill"),
    ]
    for name, B, kv_len, q_len, phase in cases:
        pages_cap = -(-kv_len // ps)
        pages_cap = 1 << (pages_cap - 1).bit_length()
        for backend in args.backends:
            q_align = 64 if (backend == "pallas" and phase == "prefill") else 1
            qa, kv, meta = make_case(
                B, kv_len, q_len, Hq, kvh, hd, ps, pages_cap, q_align,
                jnp.bfloat16,
            )
            impl = get_impl(backend, hd, ps, phase, args.cp)
            kv_bytes = B * kv_len * 2 * kvh * hd * itemsize
            try:
                if args.device_timed:
                    jimpl = jax.jit(impl)
                    sec = time_fn(lambda: jimpl(qa, kv, meta))
                else:
                    sec = time_fn_chained(
                        impl, qa, kv, meta, iters=args.iters
                    )
            except Exception as e:
                print(f"{name} [{backend}]: FAILED {type(e).__name__}")
                continue
            report(f"{name} [{backend}]", sec, bytes_moved=kv_bytes)


if __name__ == "__main__":
    main()
