"""Generate a bursty production-style trace (mooncake/qwen jsonl shape:
timestamp + input/output lengths) for bench_trace.py replay when no real
trace is available (zero-egress environments).

Arrival process: piecewise Poisson — a base rate with a 3x burst window in
the middle third, mimicking the diurnal burstiness of the reference's
qwen traceA protocol (/root/reference/benchmark/online/bench_qwen.py).
Lengths: lognormal input (median ~300) and output (median ~150), clipped
to the serving window.

Usage: python benchmark/online/gen_trace.py out.jsonl [--num 200] [--rate 4]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("out")
    p.add_argument("--num", type=int, default=200)
    p.add_argument("--rate", type=float, default=4.0, help="base req/s")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-in", type=int, default=1024)
    p.add_argument("--max-out", type=int, default=512)
    args = p.parse_args()

    rng = np.random.default_rng(args.seed)
    t = 0.0
    rows = []
    for i in range(args.num):
        phase = i / args.num
        rate = args.rate * (3.0 if 1 / 3 <= phase < 2 / 3 else 1.0)
        t += float(rng.exponential(1.0 / rate))
        in_len = int(np.clip(rng.lognormal(np.log(300), 0.7), 16, args.max_in))
        out_len = int(np.clip(rng.lognormal(np.log(150), 0.7), 8, args.max_out))
        rows.append({"timestamp": round(t, 3), "input_length": in_len,
                     "output_length": out_len})
    with open(args.out, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    span = rows[-1]["timestamp"]
    print(f"wrote {len(rows)} reqs over {span:.1f}s to {args.out}")


if __name__ == "__main__":
    main()
