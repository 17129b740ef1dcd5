"""Speculative (prompt-lookup) decoding crossover, measured WITHIN-RUN
(round-5 VERDICT #7: the round-4 off-legs were single-shot numbers under
1.9x environment drift — 13 tok/s at bs=2 implied a per-step time 12x the
same round's measured cost).

Workload where n-gram self-drafting should pay: prompts with heavy internal
repetition (code-like / templated text), greedy decoding. With DUMMY weights
the model's own continuations are not literally repetitive, so acceptance
measures the mechanism under honestly adversarial conditions.

Protocol: BOTH engines (spec off / spec lookup) are built and warmed first,
then the timed legs INTERLEAVE off/on/off/on... for --reps pairs, so drift
hits both legs equally; per-rep pairs and per-model-step times are printed
so an off-leg inconsistent with its own step time is visible immediately.

Usage: python benchmark/offline/bench_spec.py [--num 2 32] [--out 128]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_repetitive_prompts(num: int, rng) -> list:
    """Templated prompts: a small token vocabulary arranged in repeated
    blocks (the shape of boilerplate code / log lines)."""
    prompts = []
    for _ in range(num):
        block = rng.integers(100, 150, 12).tolist()
        body = []
        for i in range(16):
            body += block + [200 + i]
        prompts.append(body)
    return prompts


def build(spec_algo: str, max_running: int):
    from minisgl_tpu.llm import LLM

    return LLM(
        os.path.join(REPO, "assets", "qwen3-0.6b"),
        use_dummy_weight=True,
        max_running_req=max_running,
        max_seq_len_override=2048,
        # modest fixed pool: both engines coexist for the interleaved legs
        num_page_override=400,
        kv_dtype="int8",
        quantization="int8",
        decode_steps=8,
        pipeline_depth=4,
        spec_algo=spec_algo,
    )


def timed(llm, prompts, params):
    m = llm.metrics
    s0 = (m.spec_draft_tokens, m.spec_accepted_tokens, m.spec_steps,
          m.decode_model_steps)
    tic = time.perf_counter()
    results = llm.generate(prompts, params)
    dt = time.perf_counter() - tic
    out = sum(len(r["token_ids"]) for r in results)
    return dict(
        tok_s=out / dt,
        elapsed=dt,
        out=out,
        drafts=m.spec_draft_tokens - s0[0],
        accepted=m.spec_accepted_tokens - s0[1],
        verify_steps=m.spec_steps - s0[2],
        model_steps=m.decode_model_steps - s0[3],
        tokens=[r["token_ids"] for r in results],
    )


def main() -> None:
    from minisgl_tpu.core import SamplingParams

    p = argparse.ArgumentParser()
    p.add_argument("--num", type=int, nargs="+", default=[2, 32])
    p.add_argument("--out", type=int, default=128)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()
    rng = np.random.default_rng(0)

    for bs in args.num:
        prompts = make_repetitive_prompts(bs, rng)
        params = SamplingParams(
            temperature=0.0, max_tokens=args.out, ignore_eos=True
        )
        legs = {"off": build("none", bs), "on": build("lookup", bs)}
        for llm in legs.values():  # warm: same shapes, fresh engine
            llm.generate([p[:] for p in prompts], params)
        rows = []
        for rep in range(args.reps):
            off = timed(legs["off"], prompts, params)
            on = timed(legs["on"], prompts, params)
            rows.append((off, on))
            step_ms = (
                off["elapsed"] * 1e3 / max(off["model_steps"], 1)
            )
            print(
                f"bs={bs} rep={rep}: off {off['tok_s']:.0f} tok/s "
                f"({step_ms:.1f} ms/model-step, {off['model_steps']} steps) "
                f"| on {on['tok_s']:.0f} tok/s | "
                f"speedup {on['tok_s'] / off['tok_s']:.2f}x | "
                f"drafts {on['drafts']} accepted {on['accepted']} "
                f"verify {on['verify_steps']}",
                flush=True,
            )
        # token agreement on the last rep pair
        off, on = rows[-1]
        same = tot = 0
        exact = 0
        for a, b in zip(on["tokens"], off["tokens"]):
            mlen = min(len(a), len(b))
            same += sum(x == y for x, y in zip(a, b))
            tot += mlen
            exact += a == b
        best = max(rows, key=lambda r: r[1]["tok_s"] / r[0]["tok_s"])
        med_off = sorted(r[0]["tok_s"] for r in rows)[len(rows) // 2]
        med_on = sorted(r[1]["tok_s"] for r in rows)[len(rows) // 2]
        print(
            f"bs={bs} SUMMARY: median off {med_off:.0f} on {med_on:.0f} "
            f"tok/s -> speedup {med_on / med_off:.2f}x (best-rep "
            f"{best[1]['tok_s'] / best[0]['tok_s']:.2f}x) | exact "
            f"{exact}/{bs} token-agreement {same / max(tot, 1):.3f}",
            flush=True,
        )
        for llm in legs.values():
            llm.shutdown()
        import gc

        del legs
        gc.collect()


if __name__ == "__main__":
    main()
