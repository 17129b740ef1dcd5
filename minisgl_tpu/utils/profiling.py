"""Tracing hooks: the TPU counterpart of the reference's NVTX annotations
(/root/reference/python/minisgl/utils/torch_utils.py:23-37 nvtx_annotate,
applied per layer/block) — ``scope`` adds XLA metadata names that show up in
jax.profiler / Perfetto traces, ``annotate_host`` marks host-side sections,
and start/stop_device_trace wrap jax.profiler for on-demand capture
(triggered over the wire by ProfileMsg, server endpoint /debug/profile)."""

from __future__ import annotations

import functools
from typing import Optional

import jax


def scope(name: str):
    """Named scope for traced (jitted) code — nests in the XLA op names."""
    return jax.named_scope(name)


def annotate_host(name: str):
    """Decorator: host-side section visible on the profiler's python track."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with jax.profiler.TraceAnnotation(name):
                return fn(*args, **kwargs)

        return wrapper

    return deco


_active_trace_dir: Optional[str] = None


def start_device_trace(log_dir: str) -> bool:
    global _active_trace_dir
    if _active_trace_dir is not None:
        return False
    jax.profiler.start_trace(log_dir)
    _active_trace_dir = log_dir
    return True


def stop_device_trace() -> Optional[str]:
    global _active_trace_dir
    if _active_trace_dir is None:
        return None
    jax.profiler.stop_trace()
    out, _active_trace_dir = _active_trace_dir, None
    return out
