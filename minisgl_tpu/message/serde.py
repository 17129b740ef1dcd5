"""Reflection-based msgpack serialization for message dataclasses.

Counterpart of /root/reference/python/minisgl/message/utils.py:9-67 (recursive
dataclass serializer with tensor->bytes support), torch-free: 1-D numpy int32
arrays are the only tensor payloads (token ids).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Type

import msgpack
import numpy as np

_MSG_TYPES: Dict[str, Type] = {}


def register_msg(cls):
    """Class decorator: make a dataclass wire-serializable by name."""
    _MSG_TYPES[cls.__name__] = cls
    return cls


def _encode(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        name = type(obj).__name__
        if name not in _MSG_TYPES:
            raise TypeError(f"unregistered message type {name}")
        return {
            "__dc__": name,
            "f": {
                f.name: _encode(getattr(obj, f.name))
                for f in dataclasses.fields(obj)
            },
        }
    if isinstance(obj, np.ndarray):
        return {
            "__nd__": 1,
            "d": obj.dtype.str,
            "s": list(obj.shape),
            "b": obj.tobytes(),
        }
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, (list, tuple)):
        return [_encode(x) for x in obj]
    if isinstance(obj, dict):
        return {k: _encode(v) for k, v in obj.items()}
    return obj


def _decode(obj: Any) -> Any:
    if isinstance(obj, dict):
        if "__dc__" in obj:
            cls = _MSG_TYPES[obj["__dc__"]]
            fields = {k: _decode(v) for k, v in obj["f"].items()}
            return cls(**fields)
        if "__nd__" in obj:
            return np.frombuffer(obj["b"], dtype=np.dtype(obj["d"])).reshape(
                obj["s"]
            )
        return {k: _decode(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_decode(x) for x in obj]
    return obj


def dumps(obj: Any) -> bytes:
    return msgpack.packb(_encode(obj), use_bin_type=True)


def loads(data: bytes) -> Any:
    return _decode(msgpack.unpackb(data, raw=False))
