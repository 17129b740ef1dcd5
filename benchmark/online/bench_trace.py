"""Production-trace replay benchmark (parity with
/root/reference/benchmark/online/bench_qwen.py:38-50): replay the first N
requests of a jsonl trace against a running server at one or more time
scales and print serving stats per scale.

Usage: python benchmark/online/bench_trace.py --url http://... \
    --trace qwen_traceA.jsonl --num 1000 --scales 0.4 0.8 1.2 1.6
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


import argparse
import asyncio

from minisgl_tpu.benchmark import (
    benchmark_trace,
    process_results,
    read_jsonl_trace,
    scale_traces,
)
from minisgl_tpu.benchmark.client import synth_requests


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--url", default="http://127.0.0.1:30000")
    p.add_argument("--trace", required=True)
    p.add_argument("--num", type=int, default=1000)
    p.add_argument("--scales", type=float, nargs="+", default=[1.0])
    args = p.parse_args()

    rows = read_jsonl_trace(args.trace, limit=args.num)
    for scale in args.scales:
        trace = synth_requests(scale_traces(rows, scale))
        results = asyncio.run(benchmark_trace(args.url, trace))
        print(f"--- time scale {scale} ---")
        print(process_results(results).pretty())


if __name__ == "__main__":
    main()
