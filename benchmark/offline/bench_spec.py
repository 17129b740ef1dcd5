"""Speculative (prompt-lookup) decoding proof point (round-2 VERDICT #8).

Workload where n-gram self-drafting should pay: prompts with heavy internal
repetition (code-like / templated text), greedy decoding. With DUMMY weights
the model's own continuations are not literally repetitive, so acceptance
measures the mechanism under honestly adversarial conditions; the structured
prompt still triggers the proposer on prompt-echoing spans. Prints tok/s and
the acceptance counters for spec on vs off.

Usage: python benchmark/offline/bench_spec.py [--num 32] [--out 128]
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


def run(spec_algo: str, prompts, out_len: int):
    from minisgl_tpu.core import SamplingParams
    from minisgl_tpu.llm import LLM

    llm = LLM(
        os.path.join(REPO, "assets", "qwen3-0.6b"),
        use_dummy_weight=True,
        max_running_req=32,
        max_seq_len_override=2048,
        # modest fixed pool: the workload needs ~100 pages; a free-HBM-sized
        # pool would OOM the second engine against the first's buffers
        num_page_override=400,
        kv_dtype="int8",
        quantization="int8",
        decode_steps=8,
        pipeline_depth=4,
        spec_algo=spec_algo,
    )
    params = SamplingParams(temperature=0.0, max_tokens=out_len, ignore_eos=True)
    warm = [p[:] for p in prompts]  # same shapes, warm pass
    llm.generate(warm, params)
    tic = time.perf_counter()
    results = llm.generate(prompts, params)
    dt = time.perf_counter() - tic
    out = sum(len(r["token_ids"]) for r in results)
    m = llm.metrics
    stats = dict(
        tok_s=out / dt,
        elapsed=dt,
        out=out,
        drafts=m.spec_draft_tokens,
        accepted=m.spec_accepted_tokens,
        verify_steps=m.spec_steps,
        tokens=[r["token_ids"] for r in results],
    )
    # drop the engine's device buffers NOW: the next run's engine sizes its
    # KV pool from free HBM, and a lingering 13 GB pool OOMs it
    import gc

    llm.shutdown()
    del llm
    gc.collect()
    return stats


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--num", type=int, default=32)
    p.add_argument("--out", type=int, default=128)
    args = p.parse_args()
    rng = np.random.default_rng(0)
    prompts = make_repetitive_prompts(args.num, rng)

    off = run("none", prompts, args.out)
    on = run("lookup", prompts, args.out)
    # Exactness caveat: verify evaluates positions through the EXTEND
    # kernel while plain decode uses the flat decode kernel — two
    # numerically different bf16 paths, so greedy argmax can flip on
    # near-ties (frequent with dummy weights). Token-level agreement is
    # reported; BIT-exact spec-vs-off equality holds when both paths share
    # numerics (tests/core/test_spec_decode.py on the xla backend).
    same_tok = total_tok = 0
    exact = 0
    for a, b in zip(on["tokens"], off["tokens"]):
        m = min(len(a), len(b))
        same_tok += sum(x == y for x, y in zip(a, b))
        total_tok += m
        exact += a == b
    acc = on["accepted"] / on["drafts"] if on["drafts"] else 0.0
    print(
        f"spec off: {off['tok_s']:.0f} tok/s ({off['elapsed']:.2f}s) | "
        f"spec lookup: {on['tok_s']:.0f} tok/s ({on['elapsed']:.2f}s) | "
        f"speedup {on['tok_s'] / off['tok_s']:.2f}x | "
        f"drafts {on['drafts']} accepted {on['accepted']} "
        f"(rate {acc:.2f}) verify_steps {on['verify_steps']} | "
        f"exact-match reqs {exact}/{len(prompts)}, "
        f"token agreement {same_tok / max(total_tok, 1):.3f}"
    )


if __name__ == "__main__":
    main()
