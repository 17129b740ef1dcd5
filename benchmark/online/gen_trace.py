"""Generate a production-style trace (mooncake/qwen jsonl shape: timestamp
+ input/output lengths + optional prefix groups) for bench_trace.py /
bench_knee.py replay when no real trace is available (zero-egress
environments).

Two profiles:

- ``benign`` (round-3 default): piecewise Poisson with a 3x mid-window
  burst, lognormal lengths.
- ``harsh`` (round-4, VERDICT "mitigate with a harsher synthetic"): the
  stress features real traces have that the benign one lacks —
  * heavy-tail lengths: Pareto-mixed lognormal, so a few requests carry
    near-max inputs/outputs (drain-tail + chunked-prefill stress);
  * double burst: two 5x windows with a quiet valley (queue build/drain);
  * prefix structure: ~40% of requests arrive in shared-prefix groups
    (radix-FRIENDLY: templated system prompts), interleaved with 60%
    unique prompts (radix-HOSTILE: cache churn under memory pressure).
    Groups are emitted clustered in time, the way templated traffic
    actually arrives.

Usage: python benchmark/online/gen_trace.py out.jsonl [--num 200]
       [--rate 4] [--profile harsh]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def heavy_len(rng, median: float, hi: int, lo: int) -> int:
    """Lognormal body with a 10% Pareto tail stretching toward ``hi``."""
    if rng.random() < 0.1:
        v = median * (1.0 + rng.pareto(1.5) * 4.0)
    else:
        v = rng.lognormal(np.log(median), 0.7)
    return int(np.clip(v, lo, hi))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("out")
    p.add_argument("--num", type=int, default=200)
    p.add_argument("--rate", type=float, default=4.0, help="base req/s")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-in", type=int, default=1024)
    p.add_argument("--max-out", type=int, default=512)
    p.add_argument("--profile", choices=["benign", "harsh"], default="benign")
    args = p.parse_args()

    rng = np.random.default_rng(args.seed)
    t = 0.0
    rows = []
    group_seq = 0
    pending_group = []  # clustered group members waiting to be emitted
    for i in range(args.num):
        phase = i / args.num
        if args.profile == "harsh":
            # two 5x bursts (0.15-0.3 and 0.6-0.75) with a quiet valley
            burst = 0.15 <= phase < 0.3 or 0.6 <= phase < 0.75
            rate = args.rate * (5.0 if burst else 0.8)
        else:
            rate = args.rate * (3.0 if 1 / 3 <= phase < 2 / 3 else 1.0)
        t += float(rng.exponential(1.0 / rate))

        if args.profile == "harsh":
            in_len = heavy_len(rng, 300, args.max_in, 16)
            out_len = heavy_len(rng, 150, args.max_out, 8)
            rec = {
                "timestamp": round(t, 3),
                "input_length": in_len,
                "output_length": out_len,
            }
            if pending_group:
                rec.update(pending_group.pop())
            elif rng.random() < 0.4:
                # open a shared-prefix group: geometric size >= 2, prefix
                # 30-70% of each member's input, members clustered in time
                group_seq += 1
                size = 2 + int(rng.geometric(0.45))
                frac = float(rng.uniform(0.3, 0.7))
                rec["prefix_group"] = f"g{group_seq}"
                rec["prefix_len"] = int(in_len * frac)
                pending_group = [
                    {
                        "prefix_group": f"g{group_seq}",
                        "prefix_len": int(
                            heavy_len(rng, 300, args.max_in, 16) * frac
                        ),
                    }
                    for _ in range(size - 1)
                ]
            rows.append(rec)
        else:
            in_len = int(
                np.clip(rng.lognormal(np.log(300), 0.7), 16, args.max_in)
            )
            out_len = int(
                np.clip(rng.lognormal(np.log(150), 0.7), 8, args.max_out)
            )
            rows.append(
                {
                    "timestamp": round(t, 3),
                    "input_length": in_len,
                    "output_length": out_len,
                }
            )
    with open(args.out, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    span = rows[-1]["timestamp"]
    n_grouped = sum("prefix_group" in r for r in rows)
    print(
        f"wrote {len(rows)} reqs over {span:.1f}s to {args.out} "
        f"({args.profile}; {n_grouped} in prefix groups)"
    )


if __name__ == "__main__":
    main()
