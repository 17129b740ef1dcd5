"""Online serving knee finder (round-4 VERDICT #4): replay a trace at
progressively compressed time scales until TTFT p99 breaches the SLO, and
report the maximum sustainable request rate — the number the reference's
multi-scale protocol exists to find
(/root/reference/benchmark/online/bench_qwen.py:38-50).

Each scale uses a DISTINCT prompt seed so a later scale's prefills are not
silently served from the radix cache the previous scale populated (shared
prefix groups WITHIN a scale still exercise the radix cache as the trace
intends).

Usage (server already running):
    python benchmark/online/gen_trace.py /tmp/harsh.jsonl --profile harsh \
        --num 200
    python benchmark/online/bench_knee.py --url http://127.0.0.1:30000 \
        --trace /tmp/harsh.jsonl --out BENCH_TRACE_r04.json
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)

import argparse
import asyncio
import json

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
    p.add_argument(
        "--scales", type=float, nargs="+",
        default=[2.0, 1.0, 0.5, 0.25, 0.125, 0.0625, 0.03],
        help="descending time scales (smaller = arrivals compressed = "
        "higher load); the sweep stops after the first SLO breach",
    )
    p.add_argument(
        "--slo-ttft-p99-ms", type=float, default=500.0,
        help="knee criterion: max req/s with TTFT p99 under this",
    )
    p.add_argument("--out", default=None, help="write the JSON here too")
    args = p.parse_args()

    rows = read_jsonl_trace(args.trace, limit=args.num)
    span = rows[-1][0] if rows else 0.0
    out = {
        "metric": "online_knee",
        "unit": "req/s",
        "protocol": (
            f"{len(rows)}-req trace ({os.path.basename(args.trace)}, "
            f"{span:.0f}s span) replayed at descending time scales until "
            f"TTFT p99 > {args.slo_ttft_p99_ms:.0f} ms; per-scale prompt "
            f"seeds; reference analogue: benchmark/online/bench_qwen.py"
        ),
        "scales": {},
    }
    knee = None
    for si, scale in enumerate(args.scales):
        trace = synth_requests(scale_traces(rows, scale), seed=1000 + si)
        results = asyncio.run(benchmark_trace(args.url, trace))
        st = process_results(results)
        row = {
            "ttft_p50_ms": round(st.ttft[1], 1),
            "ttft_p99_ms": round(st.ttft[3], 1),
            "tpot_p50_ms": round(st.tpot[1], 1),
            "itl_p99_ms": round(st.itl[3], 1),
            "e2e_p50_s": round(st.e2e[1], 2),
            "tok_s": round(st.token_throughput),
            "req_s": round(st.request_throughput, 2),
        }
        out["scales"][str(scale)] = row
        print(f"--- scale {scale} ---\n{st.pretty()}", flush=True)
        if st.ttft[3] <= args.slo_ttft_p99_ms:
            knee = row
        else:
            print(f"SLO breached at scale {scale}; stopping sweep")
            break
    if knee is not None:
        out["value"] = knee["req_s"]
        out["knee"] = knee
    out["vs_baseline"] = None
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
