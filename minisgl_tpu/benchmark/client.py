"""Async serving load generator + metric post-processing.

Design parity with /root/reference/python/minisgl/benchmark/client.py
(per-token timestamp capture :350-383, trace readers :410-480, time scaling
:483-500) rebuilt on aiohttp (the openai client package is not in the image):
each request streams /generate SSE and records a timestamp per received
chunk; post-processing derives TTFT (first token latency), TPOT (mean
inter-token latency), and E2E percentiles plus aggregate token/request
throughput.
"""

from __future__ import annotations

import asyncio
import json
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np


@dataclass
class BenchOneResult:
    send_time: float
    tics: List[float] = field(default_factory=list)  # per-chunk timestamps
    text: str = ""
    input_len: Optional[int] = None
    output_len: Optional[int] = None


@dataclass
class BenchStats:
    num_requests: int
    num_tokens: int
    duration: float
    ttft: Tuple[float, float, float, float, float]  # avg/p50/p90/p99/max (ms)
    tpot: Tuple[float, float, float, float, float]  # ms
    # ITL: percentiles over INDIVIDUAL chunk gaps, pooled across requests.
    # With multi-step decode (K>1) the scheduler emits tokens in bursts, so
    # TPOT (burst-amortized mean) understates the worst wait between visible
    # chunks: p50 ITL ~ 0 (within a burst), p99 ITL ~ the K-step interval.
    # Reporting both keeps the burst cadence honest.
    itl: Tuple[float, float, float, float, float]  # ms
    e2e: Tuple[float, float, float, float, float]  # s
    token_throughput: float
    request_throughput: float

    def pretty(self) -> str:
        def row(name, t, unit):
            a, p50, p90, p99, mx = t
            return (
                f"{name}: {a:8.2f} {unit} (p50 {p50:8.2f}, p90 {p90:8.2f}, "
                f"p99 {p99:8.2f}, max {mx:8.2f})"
            )

        return "\n".join(
            [
                f"requests: {self.num_requests}  tokens: {self.num_tokens}  "
                f"duration: {self.duration:.2f}s",
                row("TTFT", self.ttft, "ms"),
                row("TPOT", self.tpot, "ms"),
                row("ITL ", self.itl, "ms"),
                row("E2E ", self.e2e, " s"),
                f"throughput: {self.token_throughput:.1f} tok/s, "
                f"{self.request_throughput:.2f} req/s",
            ]
        )


async def bench_one(
    session,
    base_url: str,
    *,
    text: Optional[str] = None,
    input_ids: Optional[List[int]] = None,
    max_tokens: int = 128,
    ignore_eos: bool = True,
    **sampling: Any,
) -> BenchOneResult:
    """One streaming /generate request; timestamps every SSE chunk.

    Extra keyword args (temperature, top_k, top_p, ...) pass through to the
    request body, so load tests can exercise the non-greedy sampling path
    (its cost is invisible in greedy-only benches)."""
    body: Dict[str, Any] = {
        "stream": True,
        "max_tokens": max_tokens,
        "ignore_eos": ignore_eos,
        **sampling,
    }
    if input_ids is not None:
        body["input_ids"] = input_ids
    else:
        body["text"] = text or ""
    res = BenchOneResult(send_time=time.perf_counter())
    async with session.post(f"{base_url}/generate", json=body) as resp:
        resp.raise_for_status()
        async for raw in resp.content:
            line = raw.decode().strip()
            if not line.startswith("data: "):
                continue
            payload = line[len("data: ") :]
            if payload == "[DONE]":
                break
            res.tics.append(time.perf_counter())
            res.text += json.loads(payload).get("text", "")
    res.input_len = len(input_ids) if input_ids is not None else None
    res.output_len = len(res.tics)
    return res


async def benchmark_batch(
    base_url: str, requests: Sequence[Dict[str, Any]], max_inflight: int = 0
) -> List[BenchOneResult]:
    """Fire all requests at once (optionally capped by a semaphore)."""
    import aiohttp

    sem = asyncio.Semaphore(max_inflight or len(requests))

    async with aiohttp.ClientSession(
        timeout=aiohttp.ClientTimeout(total=None),
        # default TCPConnector caps at 100 concurrent connections: above
        # that, requests queue CLIENT-side after send_time is stamped,
        # manufacturing multi-second phantom TTFTs (round-5 knee A/B
        # diagnosis: server queues empty, client p90 26 s)
        connector=aiohttp.TCPConnector(limit=0),
    ) as session:

        async def one(req):
            async with sem:
                return await bench_one(session, base_url, **req)

        return await asyncio.gather(*(one(r) for r in requests))


async def benchmark_trace(
    base_url: str, trace: Sequence[Tuple[float, Dict[str, Any]]]
) -> List[BenchOneResult]:
    """Replay (arrival_time_s, request) pairs with real inter-arrival gaps."""
    import aiohttp

    t0 = time.perf_counter()
    async with aiohttp.ClientSession(
        timeout=aiohttp.ClientTimeout(total=None),
        connector=aiohttp.TCPConnector(limit=0),  # see benchmark_batch
    ) as session:

        async def one(at, req):
            delay = at - (time.perf_counter() - t0)
            if delay > 0:
                await asyncio.sleep(delay)
            return await bench_one(session, base_url, **req)

        return await asyncio.gather(*(one(at, r) for at, r in trace))


def _stats(values: List[float], scale: float) -> Tuple[float, ...]:
    v = np.sort(np.asarray(values))
    return (
        float(scale * v.mean()),
        float(scale * v[int(len(v) * 0.5)]),
        float(scale * v[min(int(len(v) * 0.9), len(v) - 1)]),
        float(scale * v[min(int(len(v) * 0.99), len(v) - 1)]),
        float(scale * v[-1]),
    )


def process_results(results: Sequence[BenchOneResult]) -> BenchStats:
    results = [r for r in results if r.tics]
    ttfts = [r.tics[0] - r.send_time for r in results]
    tpots = [
        (r.tics[-1] - r.tics[0]) / (len(r.tics) - 1)
        for r in results
        if len(r.tics) > 1
    ] or [0.0]
    itls = [
        g
        for r in results
        if len(r.tics) > 1
        for g in np.diff(np.asarray(r.tics)).tolist()
    ] or [0.0]
    e2es = [r.tics[-1] - r.send_time for r in results]
    t_min = min(r.send_time for r in results)
    t_max = max(r.tics[-1] for r in results)
    num_tokens = sum(len(r.tics) for r in results)
    dur = max(t_max - t_min, 1e-9)
    return BenchStats(
        num_requests=len(results),
        num_tokens=num_tokens,
        duration=dur,
        ttft=_stats(ttfts, 1000),
        tpot=_stats(tpots, 1000),
        itl=_stats(itls, 1000),
        e2e=_stats(e2es, 1),
        token_throughput=num_tokens / dur,
        request_throughput=len(results) / dur,
    )


# ----------------------------- trace readers -------------------------------

# Trace row: (arrival_s, input_len, output_len, prefix_group, prefix_len).
# prefix_group is None for a unique prompt; rows sharing a group id get
# identical leading prefix_len tokens from synth_requests (the radix-cache
# structure real traces carry — mooncake encodes it as block hash_ids,
# reference client.py:445-470).
TraceRow = Tuple[float, int, int, Optional[Any], int]

MOONCAKE_BLOCK = 512  # tokens per mooncake hash block


def read_jsonl_trace(path: str, limit: Optional[int] = None) -> List[TraceRow]:
    """Trace rows from a production jsonl (qwen/mooncake style: timestamp +
    input/output lengths; optional prefix sharing via explicit
    prefix_group/prefix_len fields or mooncake hash_ids)."""
    rows: List[TraceRow] = []
    with open(path) as f:
        for line in f:
            if limit is not None and len(rows) >= limit:
                break
            rec = json.loads(line)
            ts = rec.get("timestamp") or rec.get("arrival_time") or 0.0
            in_len = int(
                rec.get("input_length") or rec.get("input_len") or 128
            )
            out_len = int(
                rec.get("output_length") or rec.get("output_len") or 128
            )
            group = rec.get("prefix_group")
            plen = int(rec.get("prefix_len") or 0)
            if group is None and rec.get("hash_ids"):
                # mooncake: requests sharing the first hash block share at
                # least one block of prefix (coarse but cache-faithful)
                group = ("mc", rec["hash_ids"][0])
                plen = min(MOONCAKE_BLOCK, max(in_len - 1, 0))
            rows.append((float(ts), in_len, out_len, group, plen))
    if rows:
        t0 = rows[0][0]
        rows = [(t - t0, i, o, g, p) for t, i, o, g, p in rows]
        # mooncake traces stamp integer milliseconds (reference
        # client.py:445-470 divides by 1000); qwen traces use seconds.
        # A >3-day span in "seconds" means the file is ms-stamped.
        if rows[-1][0] > 3 * 86400:
            rows = [(t / 1000.0, i, o, g, p) for t, i, o, g, p in rows]
    return rows


def scale_traces(rows: List[TraceRow], time_scale: float) -> List[TraceRow]:
    """time_scale > 1 spreads arrivals out (lower load), < 1 compresses."""
    return [(t * time_scale, *rest) for t, *rest in rows]


def synth_requests(
    rows: List[TraceRow], vocab: int = 10_000, seed: int = 0
) -> List[Tuple[float, Dict[str, Any]]]:
    """Materialize token ids for trace rows. Rows in the same prefix_group
    share their first prefix_len tokens (one prefix drawn per group), so
    replay exercises the radix cache the way the real workload would."""
    rng = np.random.default_rng(seed)
    prefixes: Dict[Any, List[int]] = {}
    out = []
    for at, in_len, out_len, group, plen in rows:
        plen = min(plen, max(in_len - 1, 0)) if group is not None else 0
        if group is not None and group not in prefixes:
            # group prefixes are drawn at max length and sliced per row
            prefixes[group] = rng.integers(10, vocab, 4096).tolist()
        head = prefixes[group][:plen] if group is not None else []
        ids = head + rng.integers(10, vocab, in_len - len(head)).tolist()
        out.append((at, dict(input_ids=ids, max_tokens=out_len)))
    return out
