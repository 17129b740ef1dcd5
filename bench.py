"""Offline throughput benchmark (driver entry).

Mirrors the reference offline benchmark
(/root/reference/benchmark/offline/bench.py:10-38: N sequences with random
input/output lengths in [100, 1024], continuous batching, prints total token
throughput) on the flagship Qwen3-0.6B architecture (bundled config under
assets/; dummy weights — the hub is unreachable in this environment, and
throughput is weight-value-independent, matching the reference's
--dummy-weight perf path, engine/engine.py:139-146).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is null: the reference publishes no in-tree numbers
(BASELINE.md — result images are external).

Measurement discipline (round 5):
- BOTH legs (128-seq headline and the 256-seq reference protocol) run
  best-of-N with the full diagnostic line each — the round-4 256-leg ran
  once, collapsed 6.8x, and was undiagnosable (VERDICT weak #1).
- Per-phase device time comes from COMPLETION events (the D2H fetch resolve
  stamps, scheduler.metrics.completion_events): consecutive completion gaps
  equal per-batch device time even when prefill+decode dispatch
  back-to-back (combined dispatch broke dispatch-gap attribution,
  VERDICT weak #2).
- Every timed rep is BRACKETED by the deliverable-bandwidth probe; reps
  whose brackets disagree >20% are flagged as drift-suspect and never win
  best-of-N unless all reps are flagged (VERDICT #9).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# persistent XLA compile cache: bench reruns (and the driver's round-end
# invocation) skip the multi-minute bucket compiles
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp")
)

REPO = os.path.dirname(os.path.abspath(__file__))
# BENCH_MODEL: any bundled asset dir (qwen3-0.6b | llama3-8b | qwen3-14b...)
MODEL = os.path.join(
    REPO, "assets", os.environ.get("BENCH_MODEL", "qwen3-0.6b")
)

NUM_SEQS = int(os.environ.get("BENCH_NUM_SEQS", "128"))
MIN_LEN = int(os.environ.get("BENCH_MIN_LEN", "100"))
MAX_LEN = int(os.environ.get("BENCH_MAX_LEN", "1024"))


def _decimate(xs, n=32):
    """Downsample a series to <=n evenly-spaced points for the stderr line."""
    if len(xs) <= n:
        return xs
    step = len(xs) / n
    return [xs[int(i * step)] for i in range(n)]


# v5e chip peaks (reference analogue: the bandwidth-vs-torch harness,
# /root/reference/python/minisgl/benchmark/perf.py:55-80, relates kernel
# time to device peak; here the whole bench relates to the roofline)
V5E_PEAK_HBM_GBPS = 819.0
V5E_PEAK_BF16_TFLOPS = 197.0


def _probe_hbm_gbps(mb: int = 512, iters: int = 30) -> float:
    """Deliverable HBM bandwidth right now: serial chained int8 adds
    (read+write) on a large array, best of 3, overhead-corrected by a
    small-size run (the tunnel adds ~1 ms fixed per dispatch)."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda a: a + 1)

    def timed(m):
        x = jnp.zeros((m, 1024, 1024), jnp.int8)
        y = f(x)
        np.asarray(y[0, 0, :2])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                y = f(y)
            np.asarray(y[0, 0, :2])
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    t_small, t_big = timed(32), timed(mb)
    dt = t_big - t_small  # fixed dispatch overhead cancels
    return 2 * (mb - 32) * 1024 * 1024 / dt / 1e9 if dt > 0 else 0.0


def _phase_times(events, t0, t1):
    """Integrate per-phase device occupancy from completion stamps.

    The device executes dispatches serially, so the gap between
    consecutive completions is the later batch's device time (the constant
    fetch RTT cancels). The first completion in the window is charged from
    t0 — its interval includes the dispatch lead-in, a fair approximation
    at pass start. Host-idle gaps inflate these numbers; the loop_s
    decomposition says whether the pass was device-bound.

    Returns (phase_s, decode_model_steps_completed)."""
    ev = sorted((t, p, k) for p, t, k in events if t0 <= t <= t1)
    phase_s = {}
    decode_msteps = 0
    prev = t0
    for t, p, k in ev:
        phase_s[p] = phase_s.get(p, 0.0) + (t - prev)
        prev = t
        if p == "decode":
            decode_msteps += k
    return phase_s, decode_msteps


def _snap(llm):
    """Snapshot the scheduler counters a timed window needs for deltas."""
    m = llm.metrics
    return (
        (m.prefill_steps, m.decode_steps),
        (m.decode_tokens, m.decode_rows, m.decode_k_collapsed),
        m.decode_model_steps,
        dict(llm.loop_times),
        # compiled step variants: a rep that grows this paid first-exposure
        # compiles/program loads inside its timed window (the round-4
        # 256-leg collapse: VERDICT #1 root cause)
        len(llm.engine._step_fns),
    )


def _roofline(llm, in_lens, out_lens, phase_s, decode_model_steps, elapsed):
    """MFU + decode HBM bandwidth vs the v5e roofline (phase times from
    completion-event integration, _phase_times)."""
    eng = llm.engine
    cfg_ps = eng.config.page_size
    kvh = eng.model.dims.kv_heads_eff
    hd = eng.model_config.head_dim
    n_layers = eng.model_config.num_layers
    kv_itemsize = eng.state.kv.data.dtype.itemsize
    weight_bytes = sum(p.nbytes for p in eng.params.values())
    n_params = sum(
        int(np.prod(info.shape))  # logical (int4 stores packed)
        for k, info in eng.model.params_spec.items()
        if info.scale_of is None and info.init is None
    )

    # exact decode HBM traffic from the workload: step j of request r reads
    # ceil((in_r + j + 1) / ps) pages of K+V per layer (page-gated kernel),
    # plus one full weight read per decode MODEL step (K per dispatch)
    kv_read = 0
    for i, o in zip(in_lens, out_lens):
        j = np.arange(int(o))
        kv_read += int(np.sum(-(-(i + j + 1) // cfg_ps))) * cfg_ps
    kv_bytes = kv_read * 2 * kvh * hd * kv_itemsize * n_layers
    decode_bytes = kv_bytes + decode_model_steps * weight_bytes
    decode_s = phase_s.get("decode", 0.0)
    decode_gbps = decode_bytes / decode_s / 1e9 if decode_s else 0.0

    # model FLOPs: 2 * params per token (matmuls) + attention score/PV
    # (attention is GQA: q heads attend, 2 dots of [hd] x [kv] per q head)
    # — both terms over ALL computed tokens
    n_tokens = int(np.sum(in_lens) + np.sum(out_lens))
    mm_flops = 2.0 * n_params * n_tokens
    q_heads = eng.model_config.num_qo_heads
    attn_kv = kv_read  # decode side: one token vs its kv
    for i in in_lens:  # prefill: sum_t t ~ i^2/2, causal
        attn_kv += int(i) * (int(i) + 1) // 2
    attn_flops = 4.0 * attn_kv * q_heads * hd * n_layers
    mfu = (mm_flops + attn_flops) / elapsed / (V5E_PEAK_BF16_TFLOPS * 1e12)
    return {
        "phase_s": {k: round(v, 2) for k, v in phase_s.items() if v},
        "decode_hbm_gbps": round(decode_gbps, 1),
        "decode_hbm_frac": round(decode_gbps / V5E_PEAK_HBM_GBPS, 3),
        "decode_ms_per_model_step": round(
            decode_s * 1e3 / decode_model_steps, 2
        )
        if decode_model_steps
        else None,
        "mfu": round(mfu, 4),
    }


def _timed_pass(llm, rng, in_lens, out_lens, params, reps, label):
    """Run the workload `reps` times with fresh token ids (radix can never
    help), bracketing each rep with the bandwidth probe. Returns the best
    unflagged rep's stats dict + prints the full diagnostic stderr line."""
    m = llm.metrics
    rep_rows = []  # (flagged, elapsed, stats)
    for rep in range(reps):
        rep_prompts = [
            rng.integers(10, 10_000, n).astype(np.int32).tolist()
            for n in in_lens
        ]
        p0 = _probe_hbm_gbps()
        snap0 = _snap(llm)
        tic = time.perf_counter()
        results = llm.generate(rep_prompts, params)
        elapsed = time.perf_counter() - tic
        snap1 = _snap(llm)
        p1 = _probe_hbm_gbps()
        out_toks = sum(len(r["token_ids"]) for r in results)
        thr = (int(in_lens.sum()) + out_toks) / elapsed
        flagged = bool(p0 and p1 and abs(p0 - p1) / max(p0, p1) > 0.20)
        phase_s, msteps_done = _phase_times(
            list(m.completion_events), tic, tic + elapsed
        )
        rep_rows.append(
            (
                flagged,
                elapsed,
                {
                    "rep": rep,
                    "elapsed": elapsed,
                    "tic": tic,
                    "throughput": thr,
                    "out_toks": out_toks,
                    "probe_pair": (round(p0, 1), round(p1, 1)),
                    "phase_s": phase_s,
                    "msteps_done": msteps_done,
                    "snap0": snap0,
                    "snap1": snap1,
                },
            )
        )
    # best = fastest among unflagged reps; all-flagged falls back to fastest
    unflagged = [r for r in rep_rows if not r[0]]
    pool = unflagged or rep_rows
    best = min(pool, key=lambda r: r[1])[2]

    steps0, diag0, msteps0, loop0, _ = best["snap0"]
    steps1, diag1, msteps1, loop1, _ = best["snap1"]
    n_prefill = steps1[0] - steps0[0]
    n_decode = steps1[1] - steps0[1]
    lt = {k: v - loop0.get(k, 0.0) for k, v in loop1.items()}
    d_tok = diag1[0] - diag0[0]
    d_rows = diag1[1] - diag0[1]
    d_coll = diag1[2] - diag0[2]
    # slice the best rep's window out of the bounded series deque: one
    # entry lands per decode step, so cumulative decode_steps indexes it
    # (with a 65536 cap nothing evicts within a bench run)
    bs_series = list(m.decode_bs_series)
    shift = m.decode_steps - len(bs_series)
    series = bs_series[max(0, steps0[1] - shift) : max(0, steps1[1] - shift)]
    total_in = int(in_lens.sum())
    print(
        f"# [{label}] rep={best['rep']}/{reps} in={total_in} "
        f"out={best['out_toks']} time={best['elapsed']:.2f}s "
        f"decode_tps={best['out_toks'] / best['elapsed']:.1f} "
        f"steps(prefill={n_prefill} decode={n_decode}) "
        f"decode(avg_bs={d_rows / max(n_decode, 1):.1f} "
        f"dispatched={d_tok} useful={best['out_toks']} "
        f"waste={1 - best['out_toks'] / max(d_tok, 1):.1%} "
        f"k1_dispatches={d_coll} "
        f"bs_series={_decimate(series)}) "
        f"phase_s={{{', '.join(f'{k}: {v:.2f}' for k, v in best['phase_s'].items())}}} "
        f"loop_s={{{', '.join(f'{k}: {v:.2f}' for k, v in lt.items())}}} "
        f"probes={[r[2]['probe_pair'] for r in rep_rows]} "
        f"flagged={[r[0] for r in rep_rows]} "
        f"new_variants={[r[2]['snap1'][4] - r[2]['snap0'][4] for r in rep_rows]} "
        f"rep_tok_s={[round(r[2]['throughput'], 1) for r in rep_rows]}",
        file=sys.stderr,
    )
    best["rep_tok_s"] = [round(r[2]["throughput"], 1) for r in rep_rows]
    best["probe_pairs"] = [r[2]["probe_pair"] for r in rep_rows]
    best["drift_flagged"] = [r[0] for r in rep_rows]
    best["new_variants"] = [
        r[2]["snap1"][4] - r[2]["snap0"][4] for r in rep_rows
    ]
    best["n_prefill_steps"] = n_prefill
    best["n_decode_steps"] = n_decode
    best["avg_decode_bs"] = d_rows / max(n_decode, 1)
    best["k1_dispatches"] = d_coll
    best["loop_s"] = {k: round(v, 2) for k, v in lt.items()}
    return best


def main() -> None:
    from minisgl_tpu.core import SamplingParams
    from minisgl_tpu.llm import LLM

    rng = np.random.default_rng(42)
    in_lens = rng.integers(MIN_LEN, MAX_LEN + 1, NUM_SEQS)
    out_lens = rng.integers(MIN_LEN, MAX_LEN + 1, NUM_SEQS)
    params = [
        SamplingParams(temperature=0.0, max_tokens=int(n), ignore_eos=True)
        for n in out_lens
    ]

    kwargs = {}
    if os.environ.get("BENCH_KV_LAYOUT"):  # plane | heads (A/B runs)
        kwargs["kv_layout"] = os.environ["BENCH_KV_LAYOUT"]
    if os.environ.get("BENCH_PAGE_SIZE"):
        kwargs["page_size"] = int(os.environ["BENCH_PAGE_SIZE"])
    if os.environ.get("BENCH_EXTEND"):  # chunked-prefill budget (tokens)
        kwargs["max_extend_tokens"] = int(os.environ["BENCH_EXTEND"])
    llm = LLM(
        MODEL,
        use_dummy_weight=True,
        max_running_req=int(os.environ.get("BENCH_MAX_RUNNING", "128")),
        max_seq_len_override=2048,
        cache_type="radix",
        decode_steps=int(os.environ.get("BENCH_DECODE_STEPS", "8")),
        attention_backend=os.environ.get("BENCH_ATTN_BACKEND", "auto"),
        # int8 KV is the serving default benched here: it passes the ppl
        # gate (tests/models/test_quantization.py) and decodes 1.65x faster
        # than bf16 at its auto page size while halving KV memory (BENCHLOG
        # round 2). BENCH_KV_DTYPE=auto gives the bf16 baseline.
        kv_dtype=os.environ.get("BENCH_KV_DTYPE", "int8"),
        # int8 weights are the serving default benched here (BASELINE.md
        # north star is INT8-weight + quantized KV): NLL-gated
        # (tests/models/test_quantization.py), +8% total throughput over
        # bf16 weights once the loop is device-bound (BENCHLOG round 3)
        quantization=os.environ.get("BENCH_QUANT", "int8"),
        # keep N result fetches in flight: the host loop is otherwise
        # RTT-bound on the one-behind D2H token fetch (~41 ms/iteration vs
        # ~11 ms device time through the tunnel; BENCHLOG host-loop
        # decomposition)
        pipeline_depth=int(os.environ.get("BENCH_PIPELINE_DEPTH", "4")),
        **kwargs,
    )
    # Warmup pass: the SAME workload shape with different random prompts,
    # so every (phase, bucket) executable the timed pass needs is already
    # compiled (XLA-compile analogue of CUDA-graph capture; the reference's
    # bench pays no capture in its timed region either). Different token ids
    # keep the radix cache from gifting the timed pass free prefills.
    llm.engine.warmup()
    warm_prompts = [
        rng.integers(10_000, 20_000, n).astype(np.int32).tolist()
        for n in in_lens
    ]
    llm.generate(warm_prompts, params)

    # The tunneled chip pool's per-run state varies WILDLY: the identical
    # warm workload measured 13.8 s and 48.8 s decode thirty minutes apart
    # (round-4 BENCHLOG, environment note). Best-of-N with fresh token ids
    # per rep is the defensible estimator of the CODE's speed when the
    # environment is the variable; the probe brackets make per-rep drift
    # visible (drift_flagged).
    reps = int(os.environ.get("BENCH_REPS", "3"))
    best = _timed_pass(llm, rng, in_lens, out_lens, params, reps, "128seq")
    roof = _roofline(
        llm, in_lens, out_lens, best["phase_s"], best["msteps_done"],
        best["elapsed"],
    )
    probe_after = max(best["probe_pair"])
    roof["hbm_gbps_probe"] = probe_after
    roof["decode_hbm_frac_of_probe"] = (
        round(roof["decode_hbm_gbps"] / probe_after, 3) if probe_after else None
    )
    roof["rep_tok_s"] = best["rep_tok_s"]
    roof["probe_pairs"] = best["probe_pairs"]
    roof["drift_flagged"] = best["drift_flagged"]
    roof["new_step_variants"] = best["new_variants"]

    total_in = int(in_lens.sum())
    throughput = best["throughput"]

    # Reference-protocol pass: 256 sequences (the reference's exact count,
    # /root/reference/benchmark/offline/bench.py:18-37) on the same warm
    # engine — twice the sequences per running-set slot, so this is the
    # admission-pacing stressor. Same best-of-N + diagnostics as the
    # headline (round-4 VERDICT #1: the single-shot 256 number collapsed
    # 6.8x and was undiagnosable).
    n2 = int(os.environ.get("BENCH_NUM_SEQS_2", "256"))
    proto256 = {}
    if n2:
        in2 = rng.integers(MIN_LEN, MAX_LEN + 1, n2)
        out2 = rng.integers(MIN_LEN, MAX_LEN + 1, n2)
        params2 = [
            SamplingParams(temperature=0.0, max_tokens=int(n), ignore_eos=True)
            for n in out2
        ]
        reps2 = int(os.environ.get("BENCH_REPS_256", str(reps)))
        b2 = _timed_pass(llm, rng, in2, out2, params2, reps2, "256seq")
        roof2 = _roofline(
            llm, in2, out2, b2["phase_s"], b2["msteps_done"], b2["elapsed"]
        )
        proto256 = {
            "throughput_256seq": round(b2["throughput"], 1),
            "decode_tok_s_256seq": round(b2["out_toks"] / b2["elapsed"], 1),
            "avg_decode_bs_256seq": round(b2["avg_decode_bs"], 1),
            "elapsed_s_256seq": round(b2["elapsed"], 2),
            "rep_tok_s_256seq": b2["rep_tok_s"],
            "probe_pairs_256seq": b2["probe_pairs"],
            "drift_flagged_256seq": b2["drift_flagged"],
            "new_step_variants_256seq": b2["new_variants"],
            "k1_dispatches_256seq": b2["k1_dispatches"],
            "phase_s_256seq": roof2["phase_s"],
            "decode_hbm_frac_256seq": roof2["decode_hbm_frac"],
            "decode_ms_per_model_step_256seq": roof2[
                "decode_ms_per_model_step"
            ],
            "loop_s_256seq": b2["loop_s"],
        }

    print(
        json.dumps(
            {
                "metric": "offline_throughput_"
                + os.path.basename(MODEL).replace("-", "_"),
                "value": round(throughput, 1),
                "unit": "tok/s",
                "vs_baseline": None,
                # round-over-round comparability: the timed pass runs
                # entirely warm (same-shape warmup workload above), and the
                # prefill/decode split makes a decode regression visible
                # even when totals move
                "state": "warm",
                "prefill_tokens": total_in,
                "decode_tokens": best["out_toks"],
                "decode_tok_s": round(best["out_toks"] / best["elapsed"], 1),
                "elapsed_s": round(best["elapsed"], 2),
                "kv_dtype": os.environ.get("BENCH_KV_DTYPE", "int8"),
                "quant": os.environ.get("BENCH_QUANT", "int8"),
                **proto256,
                # roofline accounting (v5e: 819 GB/s HBM, 197 bf16 TFLOPs):
                # decode GB/s = exact workload KV reads + per-step weight
                # reads over decode-attributed (completion-event) time
                **roof,
            }
        )
    )


if __name__ == "__main__":
    main()
