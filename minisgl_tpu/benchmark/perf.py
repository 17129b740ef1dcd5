"""Device micro-benchmark harness.

TPU counterpart of /root/reference/python/minisgl/benchmark/perf.py:10-80
(CUDA-event timing inside captured graphs + bandwidth comparison): times a
jitted callable with block_until_ready fencing, reports per-call latency and
achieved bytes/s against a caller-supplied bytes-moved estimate.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax


def time_fn(
    fn: Callable[[], jax.Array],
    *,
    warmup: int = 3,
    iters: int = 20,
) -> float:
    """Median seconds per call of ``fn`` (must return a device array)."""
    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def time_fn_chained(
    impl: Callable,
    q: jax.Array,
    *args,
    iters: int = 50,
    repeat: int = 3,
) -> float:
    """Seconds per call of ``impl(q, *args)``, measured by chaining ``iters``
    calls (output feeds the next call's ``q``) inside ONE jitted lax.scan and
    wall-clocking dispatch + host fetch. On tunneled devices
    ``block_until_ready`` returns early, making ``time_fn`` wildly optimistic
    (BENCHLOG round 1) — a host fetch of a value data-dependent on every call
    is the only trustworthy fence. Requires impl's output to have q's shape."""
    import numpy as np

    # args must be jit PARAMETERS, not closure captures: captured arrays are
    # inlined into the HLO as literal constants, and a serving-sized KV pool
    # blows past the remote-compile helper's request-size limit (HTTP 413)
    @jax.jit
    def chain(q0, *a):
        def body(qc, _):
            return impl(qc, *a).astype(qc.dtype), ()

        q_fin, _ = jax.lax.scan(body, q0, None, length=iters)
        return q_fin

    np.asarray(chain(q, *args))  # compile + warm
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        np.asarray(chain(q, *args))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def report(
    name: str,
    seconds: float,
    *,
    bytes_moved: Optional[int] = None,
    flops: Optional[int] = None,
) -> str:
    parts = [f"{name}: {seconds * 1e6:9.1f} us"]
    if bytes_moved is not None:
        parts.append(f"{bytes_moved / seconds / 1e9:8.1f} GB/s")
    if flops is not None:
        parts.append(f"{flops / seconds / 1e12:7.2f} TFLOP/s")
    line = "  ".join(parts)
    print(line, flush=True)
    return line
