"""Host-side scheduler cost profile (no device dependency).

With the result fetch pipelined off the loop (scheduler pipeline_depth) and
the decode kernel at HBM roofline, the scheduler iteration time approaches
max(device_step, host_work). This harness measures the host_work term in
isolation: the jitted step dispatch is stubbed out, so one loop iteration
costs exactly recv + schedule (managers, page allocation, numpy metadata
build, pack) + result processing (EOS scan, detok msgs, radix insert).

Reference analogue: the CPU work the reference hides on its scheduler
stream while the engine stream runs (scheduler.py:83-106).

Usage: python benchmark/host_loop_profile.py [--bs 128] [--steps 300]
       [--profile]   (--profile prints the cProfile top-30)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=128)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--in-len", type=int, default=256)
    ap.add_argument("--decode-steps", type=int, default=8)
    ap.add_argument("--profile", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from minisgl_tpu.core import SamplingParams
    from minisgl_tpu.engine.engine import Engine, ForwardOutput
    from minisgl_tpu.llm import LLM

    model = os.path.join(REPO, "assets", "qwen3-0.6b")

    # Stub the device: dispatch returns host tokens immediately. Host-side
    # bookkeeping (complete_k) still runs — it is part of the loop cost.
    K = args.decode_steps

    def fake_forward(self, batch):
        for req in batch.reqs:
            req.complete_k(batch.decode_steps)
        k = batch.decode_steps if not batch.is_prefill else 1
        toks = np.full((k, batch.size), 17, dtype=np.int32)
        return ForwardOutput(batch=batch, tokens=toks)

    Engine.forward_batch = fake_forward
    Engine.warmup = lambda self: None

    llm = LLM(
        model,
        use_dummy_weight=True,
        max_running_req=args.bs,
        max_seq_len_override=4096,
        num_page_override=context_pages(args, 4096),
        cache_type="radix",
        decode_steps=K,
        attention_backend="xla",
    )

    rng = np.random.default_rng(0)
    out_budget = args.steps * K  # keep everyone decoding the whole run
    prompts = [
        rng.integers(10, 50_000, args.in_len).astype(np.int32).tolist()
        for _ in range(args.bs)
    ]
    sp = SamplingParams(temperature=0.0, max_tokens=out_budget, ignore_eos=True)

    def run():
        # bound the run by steps: monkeypatch the loop counter via metrics
        m0 = llm.metrics.decode_steps
        import minisgl_tpu.llm.llm as llm_mod

        orig = llm.overlap_loop

        def counted():
            if llm.metrics.decode_steps - m0 >= args.steps:
                raise llm_mod.RequestAllFinished
            orig()

        llm.overlap_loop = counted
        try:
            llm.generate(prompts, sp)
        except Exception:
            pass
        finally:
            llm.overlap_loop = orig
        return llm.metrics.decode_steps - m0

    if args.profile:
        import cProfile
        import pstats

        pr = cProfile.Profile()
        pr.enable()
        t0 = time.perf_counter()
        n = run()
        dt = time.perf_counter() - t0
        pr.disable()
        stats = pstats.Stats(pr)
        stats.sort_stats("cumulative").print_stats(30)
    else:
        t0 = time.perf_counter()
        n = run()
        dt = time.perf_counter() - t0

    lt = llm.loop_times
    print(
        f"bs={args.bs} K={K} decode_steps_run={n} wall={dt:.2f}s "
        f"host_ms_per_iter={1000 * dt / max(n, 1):.2f}"
    )
    print(
        "loop_s=",
        {k: round(v, 2) for k, v in lt.items()},
    )


def context_pages(args, max_len: int) -> int:
    # enough pages for bs seqs at in_len + steps*K tokens (page_size<=128)
    per_seq = (args.in_len + args.steps * args.decode_steps) // 16 + 2
    return min(args.bs * per_seq + 16, 65536)


if __name__ == "__main__":
    main()
