"""Radix prefix-cache speedup benchmark (BASELINE.md metric: "radix
hit-rate speedup"; workload shape of the reference's bench_wildchat —
real-prompt datasets with shared prefixes).

N requests share a long common prefix (system prompt) with unique tails;
compares radix vs naive cache wall time on the same engine config.

Usage: python benchmark/offline/bench_prefix.py [--num 48] [--prefix 768]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import argparse
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(cache_type: str, wave1, wave2, out_len: int, model: str):
    """Returns (wave1_s, wave2_s): wave2 shares wave1's prefix — the radix
    cache should serve it from KV (the reference's bench_wildchat shape:
    repeated system prompts across user turns)."""
    from minisgl_tpu.core import SamplingParams
    from minisgl_tpu.llm import LLM

    llm = LLM(
        model,
        use_dummy_weight=True,
        max_running_req=64,
        max_seq_len_override=2048,
        cache_type=cache_type,
        decode_steps=8,
        # serving defaults (bench.py): int8 KV at its auto page size
        kv_dtype=os.environ.get("BENCH_KV_DTYPE", "int8"),
        quantization=os.environ.get("BENCH_QUANT", "int8"),
        pipeline_depth=4,
    )
    params = SamplingParams(temperature=0.0, max_tokens=out_len, ignore_eos=True)
    # Warm with the SAME wave shapes on DIFFERENT tokens so every bucket
    # the timed waves need — including the small cached-extend shapes the
    # radix run produces on wave2 — is compiled outside the timed region
    # (wave-shape compiles were 10x the actual wave time and inverted the
    # first measurement of this harness).
    rng = np.random.default_rng(9)
    max_len = max(len(ids) for ids in wave1 + wave2)
    warm_shared = rng.integers(50_000, 60_000, max_len).tolist()

    def warm_wave(w):
        return [
            warm_shared[: len(ids) - 8]
            + rng.integers(50_000, 60_000, 8).tolist()
            for ids in w
        ]

    llm.generate(warm_wave(wave1), params)
    llm.generate(warm_wave(wave2), params)
    tic = time.perf_counter()
    llm.generate(wave1, params)
    t1 = time.perf_counter() - tic
    tic = time.perf_counter()
    llm.generate(wave2, params)
    return t1, time.perf_counter() - tic


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--num", type=int, default=48)
    p.add_argument("--prefix", type=int, default=768)
    p.add_argument("--tail", type=int, default=64)
    p.add_argument("--out", type=int, default=64)
    p.add_argument("--model", default=os.path.join(REPO, "assets", "qwen3-0.6b"))
    args = p.parse_args()

    rng = np.random.default_rng(0)
    shared = rng.integers(10, 10_000, args.prefix).tolist()

    def wave():
        return [
            shared + rng.integers(10, 10_000, args.tail).tolist()
            for _ in range(args.num)
        ]

    n1, n2 = run("naive", wave(), wave(), args.out, args.model)
    r1, r2 = run("radix", wave(), wave(), args.out, args.model)
    print(
        f"wave1 naive {n1:.2f}s radix {r1:.2f}s | "
        f"wave2 (prefix hot) naive {n2:.2f}s radix {r2:.2f}s | "
        f"hot-prefix speedup {n2 / r2:.2f}x "
        f"(shared prefix {args.prefix} tokens x {args.num} reqs)"
    )


if __name__ == "__main__":
    main()
