"""Typed environment-variable flag system.

TPU-native counterpart of the reference env-flag singleton
(/root/reference/python/minisgl/env.py:16-87): every runtime toggle is a typed
``MSLT_``-prefixed environment variable collected on one singleton object so
flags are discoverable and typo-proof.
"""

from __future__ import annotations

import os
from typing import Callable, Generic, TypeVar

T = TypeVar("T")

_PREFIX = "MSLT_"


class EnvField(Generic[T]):
    """A lazily-read, cached, typed env var descriptor."""

    def __init__(self, name: str, default: T, parse: Callable[[str], T]):
        self.name = _PREFIX + name
        self.default = default
        self.parse = parse
        self._cache: T | None = None
        self._read = False

    def get(self) -> T:
        if not self._read:
            raw = os.environ.get(self.name)
            self._cache = self.default if raw is None else self.parse(raw)
            self._read = True
        return self._cache  # type: ignore[return-value]

    def __get__(self, obj, objtype=None) -> T:
        return self.get()


def _parse_bool(s: str) -> bool:
    return s.strip().lower() in ("1", "true", "yes", "on")


class _Env:
    # Disable the one-iteration-behind overlap scheduling (fetch results
    # synchronously right after dispatch). Mirrors the reference ablation flag
    # (env.py:69 MINISGL_DISABLE_OVERLAP_SCHEDULING).
    DISABLE_OVERLAP_SCHEDULING = EnvField("DISABLE_OVERLAP_SCHEDULING", False, _parse_bool)
    # Force XLA-composite attention instead of Pallas kernels (debug / CPU).
    FORCE_XLA_ATTENTION = EnvField("FORCE_XLA_ATTENTION", False, _parse_bool)
    # Run Pallas kernels in interpreter mode (automatic on CPU backend).
    PALLAS_INTERPRET = EnvField("PALLAS_INTERPRET", False, _parse_bool)
    # Logging level for the engine logger.
    LOG_LEVEL = EnvField("LOG_LEVEL", "INFO", str)
    # Include the PID in log lines (useful with multi-process serving plane).
    LOG_PID = EnvField("LOG_PID", False, _parse_bool)
    # Per-chip HBM budget (GB) used for KV sizing when the device exposes no
    # memory_stats (e.g. tunneled devices) AND the allocation probe is
    # disabled or fails. v5e default.
    HBM_GB = EnvField("HBM_GB", 16.0, float)
    # Allocate-and-verify binary-search probe of free HBM when the device
    # exposes no memory_stats (engine._probe_free_bytes, the reference's
    # memory-probing discipline). Set 0 to skip and trust MSLT_HBM_GB.
    KV_PROBE = EnvField("KV_PROBE", True, _parse_bool)
    # KV pages fetched per double-buffered DMA chunk in the Pallas attention
    # kernel (A/B knob). 0 = auto: per-phase token target / page_size
    # (pallas_backend.default_pages_per_chunk).
    PAGES_PER_CHUNK = EnvField("PAGES_PER_CHUNK", 0, int)
    # Scheduler pipeline depth: how many iterations behind results are
    # processed. 1 = the reference's one-behind overlap. Deeper pipelines
    # keep >1 token fetches in flight, hiding high per-fetch D2H latency
    # (e.g. a tunneled device's ~45 ms RTT) at the cost of up to
    # (depth*K - 1) wasted decode tokens per EOS-finished request.
    PIPELINE_DEPTH = EnvField("PIPELINE_DEPTH", 1, int)
    # Fetch step tokens on a background thread, submitted at dispatch, so
    # the blocking D2H transfer overlaps device execution and host
    # scheduling instead of serializing the loop.
    ASYNC_FETCH = EnvField("ASYNC_FETCH", True, _parse_bool)
    # Persistent XLA compilation cache directory (empty string disables).
    # Compiling one (phase, bucket) step variant costs tens of seconds on a
    # remote-compile device; without this cache a fresh server process pays
    # that inline on the first request that hits each bucket (measured
    # 69-184 s TTFT on a cold serving plane), with it only the first server
    # EVER on the machine does. The reference's CUDA-graph capture has no
    # cross-process analogue — this is strictly better.
    COMPILE_CACHE = EnvField("COMPILE_CACHE", "~/.cache/jax_comp", str)


ENV = _Env()
