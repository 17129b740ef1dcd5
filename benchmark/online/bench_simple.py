"""Batch online latency benchmark (parity with
/root/reference/benchmark/online/bench_simple.py:37-71): fire a fixed batch
of random-length requests at a running server and print TTFT/TPOT/E2E stats.

Usage: python benchmark/online/bench_simple.py --url http://127.0.0.1:30000 \
    --num 64 --max-input 8192 --min-output 16 --max-output 1024
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


import argparse
import asyncio

import numpy as np

from minisgl_tpu.benchmark import benchmark_batch, process_results


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--url", default="http://127.0.0.1:30000")
    p.add_argument("--num", type=int, default=64)
    p.add_argument("--max-input", type=int, default=8192)
    p.add_argument("--min-output", type=int, default=16)
    p.add_argument("--max-output", type=int, default=1024)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--temperature", type=float, default=0.0,
        help="non-zero exercises the stochastic sampling path "
        "(VERDICT: its cost must be visible, not hidden by greedy benches)",
    )
    args = p.parse_args()

    rng = np.random.default_rng(args.seed)
    reqs = []
    for _ in range(args.num):
        in_len = int(rng.integers(1, args.max_input + 1))
        out_len = int(rng.integers(args.min_output, args.max_output + 1))
        req = dict(
            input_ids=rng.integers(10, 10_000, in_len).tolist(),
            max_tokens=out_len,
        )
        if args.temperature > 0:
            req["temperature"] = args.temperature
        reqs.append(req)

    results = asyncio.run(benchmark_batch(args.url, reqs))
    print(process_results(results).pretty())


if __name__ == "__main__":
    main()
