"""Pipeline-depth x decode-steps A/B driver for the offline bench.

Runs bench.py (subprocess per config, fresh device state) across a grid of
scheduler pipeline depths and decode burst sizes, printing one table at the
end. Intended for the real chip: the pipelined fetch only pays when the
per-fetch device round trip is expensive (BENCHLOG host-loop decomposition:
~41 ms/iteration blocked on the one-behind fetch vs ~11.4 ms device time).

Usage:
  python benchmark/offline/bench_pipeline_ab.py            # depth 1/2/3, K 8
  python benchmark/offline/bench_pipeline_ab.py --depths 1 2 3 --ks 8 16
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def run_one(depth: int, k: int, extra_env: dict) -> dict:
    env = dict(os.environ)
    env.update(extra_env)
    env["BENCH_PIPELINE_DEPTH"] = str(depth)
    env["BENCH_DECODE_STEPS"] = str(k)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    for line in out.stdout.splitlines()[::-1]:
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(
        f"bench depth={depth} K={k} produced no JSON:\n{out.stdout[-2000:]}"
        f"\n{out.stderr[-2000:]}"
    )


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--depths", type=int, nargs="+", default=[1, 2, 3])
    p.add_argument("--ks", type=int, nargs="+", default=[8])
    p.add_argument("--env", nargs="*", default=[], help="extra K=V pairs")
    args = p.parse_args()
    extra = dict(kv.split("=", 1) for kv in args.env)

    rows = []
    for k in args.ks:
        for d in args.depths:
            r = run_one(d, k, extra)
            rows.append((d, k, r))
            print(
                f"depth={d} K={k}: {r['value']} tok/s "
                f"(decode {r['decode_tok_s']} tok/s, {r['elapsed_s']}s)",
                flush=True,
            )
    print("\n| depth | K | tok/s | decode tok/s | elapsed |")
    print("|---|---|---|---|---|")
    for d, k, r in rows:
        print(
            f"| {d} | {k} | {r['value']} | {r['decode_tok_s']} "
            f"| {r['elapsed_s']}s |"
        )


if __name__ == "__main__":
    main()
