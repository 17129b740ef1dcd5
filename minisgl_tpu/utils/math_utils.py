"""Integer math helpers shared across the stack.

Counterpart of /root/reference/python/minisgl/utils/misc.py:20-41 (div_even /
div_ceil / align helpers); `div_even`'s allow_replicate rule is what makes
KV-head sharding work when kv_heads < tp.
"""

from __future__ import annotations


def div_ceil(a: int, b: int) -> int:
    return -(-a // b)


def div_even(a: int, b: int, allow_replicate: bool = False) -> int:
    """a / b requiring exact division; if allow_replicate and b > a with
    b % a == 0, returns 1 (each shard replicates one unit)."""
    if allow_replicate and b > a:
        if b % a != 0:
            raise ValueError(f"cannot replicate {a} over {b} shards")
        return 1
    if a % b != 0:
        raise ValueError(f"{a} is not divisible by {b}")
    return a // b


def align_up(x: int, align: int) -> int:
    return div_ceil(x, align) * align


def align_down(x: int, align: int) -> int:
    return (x // align) * align


def next_power_of_2(x: int) -> int:
    if x <= 1:
        return 1
    return 1 << (x - 1).bit_length()


def is_power_of_2(x: int) -> bool:
    return x > 0 and (x & (x - 1)) == 0
