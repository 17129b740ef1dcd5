"""Fast first-mismatch comparison for radix-tree prefix matching.

Counterpart of the reference's C++ ``fast_compare_key``
(/root/reference/python/minisgl/kernel/csrc/src/radix.cpp:19-44 — std::mismatch
over two int arrays). We ship the same thing as a tiny C extension
(csrc/fastcmp.c, loaded via ctypes) with a vectorized numpy fallback.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None


def _try_load():
    global _LIB
    if _LIB is not None:
        return _LIB
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    for cand in (
        os.path.join(here, "csrc", "build", "libfastcmp.so"),
        os.path.join(os.path.dirname(__file__), "libfastcmp.so"),
    ):
        if os.path.exists(cand):
            lib = ctypes.CDLL(cand)
            lib.first_mismatch_i32.restype = ctypes.c_int64
            lib.first_mismatch_i32.argtypes = [
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_int64,
            ]
            _LIB = lib
            return _LIB
    _LIB = False
    return _LIB


def first_mismatch(a: np.ndarray, b: np.ndarray) -> int:
    """Index of the first differing element (== min length if one is a
    prefix of the other)."""
    n = min(len(a), len(b))
    if n == 0:
        return 0
    lib = _try_load()
    if lib:
        a32 = np.ascontiguousarray(a[:n], dtype=np.int32)
        b32 = np.ascontiguousarray(b[:n], dtype=np.int32)
        return int(
            lib.first_mismatch_i32(
                a32.ctypes.data, b32.ctypes.data, ctypes.c_int64(n)
            )
        )
    neq = a[:n] != b[:n]
    idx = np.argmax(neq)
    if not neq[idx]:
        return n
    return int(idx)
