"""Real-prompt chat workload bench (wildchat-style, offline).

Counterpart of /root/reference/benchmark/offline/bench_wildchat.py:83-137:
real natural-language prompts through the chat template, temperature
sampling, heavy-tailed input/output lengths, length-distribution stats and
output-token throughput. That bench streams the WildChat parquet from the
HF hub; this environment has zero egress, so the corpus is harvested from
natural-language text already on disk (package docs/READMEs/docstrings),
which exercises the same things synthetic random-token traces cannot:

- BPE tokenization of real text (merge-heavy, variable tokens/char),
- the chat template (shared template prefix -> radix-cacheable),
- multi-turn conversations (turn t's prompt contains turns 0..t-1 ->
  cross-request prefix sharing beyond the system prompt),
- the incremental detokenizer on non-ASCII/multibyte output,
- temperature>0 sampling (the non-greedy path VERDICT weak #6 flagged).

Output lengths: dummy weights produce ~uniform logits, so honoring EOS
would give degenerate geometric lengths; instead each request draws its
max_tokens budget from a lognormal fitted to chat-like outputs (p50 ~128)
with ignore_eos — the reference's IGNORE_EOS knob, always-on here.

Prints the same stats block as the reference bench plus the radix hit rate
measured by the serving-plane metrics (north-star metric, BASELINE.json).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys

sys.path.insert(0, REPO)

_PARA_RE = re.compile(r"\n\s*\n")
_WORD_RE = re.compile(r"[A-Za-z]{3,}")

CORPUS_GLOBS = [
    "/opt/venv/lib/python*/site-packages/*/README*",
    "/opt/venv/lib/python*/site-packages/*.dist-info/METADATA",
    "/opt/venv/lib/python*/site-packages/*/*.md",
    "/usr/lib/python3*/*.py",
]


def harvest_paragraphs(max_files: int = 400) -> list:
    """Natural-language paragraphs (40-1200 chars, mostly prose) from disk."""
    paras = []
    files = []
    for pattern in CORPUS_GLOBS:
        files.extend(sorted(glob.glob(pattern))[: max_files // len(CORPUS_GLOBS)])
    for path in files:
        try:
            with open(path, "r", encoding="utf-8", errors="ignore") as f:
                text = f.read(200_000)
        except OSError:
            continue
        for para in _PARA_RE.split(text):
            para = para.strip()
            if not (40 <= len(para) <= 1200):
                continue
            words = _WORD_RE.findall(para)
            # prose filter: enough words relative to length (skips code/tables)
            if len(words) < len(para) / 12:
                continue
            paras.append(" ".join(para.split()))
    return paras


def build_conversations(paras, rng, num_reqs: int, system_prompt: str):
    """Chat message lists; ~40% are later turns of a multi-turn conversation.

    Returns (list of message-lists, list of conversation ids). A k-turn
    conversation contributes k requests whose prompts are strict prefixes of
    each other (plus the new user turn) — the radix-cache-relevant shape.
    """
    convs = []
    i = 0
    while len(convs) < num_reqs:
        n_turns = 1 + int(rng.geometric(0.55) - 1)  # p50=1, tail to ~5
        n_turns = min(n_turns, 5)
        history = [{"role": "system", "content": system_prompt}]
        for _ in range(n_turns):
            # 1-3 paragraphs per user turn, heavy-tailed
            k = 1 + int(rng.geometric(0.6) - 1)
            content = "\n\n".join(
                paras[int(rng.integers(len(paras)))] for _ in range(min(k, 3))
            )
            history = history + [{"role": "user", "content": content}]
            convs.append(list(history))
            if len(convs) >= num_reqs:
                break
            # assistant reply (itself corpus text) extends the shared prefix
            history = history + [
                {"role": "assistant", "content": paras[int(rng.integers(len(paras)))]}
            ]
        i += 1
    return convs[:num_reqs]


def print_len_stats(name: str, lengths) -> None:
    arr = sorted(lengths)
    n = len(arr)
    print(
        f"{name}: count={n}, min={arr[0]}, p50={arr[int(0.50 * n)]}, "
        f"p90={arr[int(0.90 * n)]}, p99={arr[min(int(0.99 * n), n - 1)]}, max={arr[-1]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=os.path.join(REPO, "assets", "qwen3-0.6b"))
    ap.add_argument("--num-reqs", type=int, default=256)
    ap.add_argument("--temperature", type=float, default=0.6)
    ap.add_argument("--cache", default="radix", choices=["radix", "naive"])
    ap.add_argument("--decode-steps", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from transformers import AutoTokenizer

    from minisgl_tpu.core import SamplingParams
    from minisgl_tpu.llm import LLM

    rng = np.random.default_rng(args.seed)
    paras = harvest_paragraphs()
    assert len(paras) >= 200, f"corpus too small: {len(paras)} paragraphs"
    print(f"corpus: {len(paras)} natural-language paragraphs")

    system_prompt = (
        "You are a helpful assistant. Answer the user's questions accurately "
        "and concisely, citing relevant context when it is provided."
    )
    convs = build_conversations(paras, rng, args.num_reqs, system_prompt)

    tokenizer = AutoTokenizer.from_pretrained(args.model)
    if tokenizer.chat_template is None:  # tiny CI fixtures ship no template
        tokenizer.chat_template = (
            "{% for m in messages %}<{{ m['role'] }}>{{ m['content'] }}"
            "{% endfor %}{% if add_generation_prompt %}<assistant>{% endif %}"
        )
    prompt_token_ids = [
        tokenizer.apply_chat_template(c, tokenize=True, add_generation_prompt=True)
        for c in convs
    ]

    # lognormal output budgets: p50 ~128 tok, p99 ~1k (chat-like)
    out_budgets = np.clip(
        rng.lognormal(mean=np.log(128), sigma=0.9, size=len(convs)), 8, 1024
    ).astype(int)
    sampling_params = [
        SamplingParams(
            temperature=args.temperature,
            top_p=0.95,
            max_tokens=int(b),
            ignore_eos=True,
        )
        for b in out_budgets
    ]

    llm = LLM(
        args.model,
        use_dummy_weight=True,
        cache_type=args.cache,
        decode_steps=args.decode_steps,
        attention_backend="xla" if args.cpu else "auto",
    )
    llm.warmup()

    # warmup request (reference parity: one sample end-to-end before timing)
    w = llm.generate([prompt_token_ids[0]], sampling_params[0])[0]
    print(f"warmup sample: input={len(prompt_token_ids[0])}tok "
          f"output={len(w['token_ids'])}tok text_preview={w['text'][:60]!r}")

    t = time.time()
    results = llm.generate(prompt_token_ids, sampling_params)
    t = time.time() - t

    output_lens = [len(r["token_ids"]) for r in results]
    total_out = sum(output_lens)
    total_in = sum(len(x) for x in prompt_token_ids)
    print_len_stats("Input length", [len(x) for x in prompt_token_ids])
    print_len_stats("Output length", output_lens)
    m = llm.metrics
    print(json.dumps({
        "metric": "chat_output_throughput",
        "value": round(total_out / t, 1),
        "unit": "tok/s",
        "num_reqs": len(convs),
        "total_tok_s": round((total_in + total_out) / t, 1),
        "time_s": round(t, 2),
        "radix_hit_rate": round(m.radix_hit_rate, 4),
        "prefill_cached_tokens": m.prefill_cached_tokens,
        "prefill_computed_tokens": m.prefill_computed_tokens,
        "cache": args.cache,
        "temperature": args.temperature,
    }))


if __name__ == "__main__":
    main()
