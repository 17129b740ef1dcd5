"""Gated activations (counterpart of reference layers/activation.py:9-18).

Input is the merged gate_up projection output [T, 2*I]; gate activations run
in f32 for parity with the CUDA kernels' internal upcast.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def silu_and_mul(x: jnp.ndarray) -> jnp.ndarray:
    gate, up = jnp.split(x, 2, axis=-1)
    return (jax.nn.silu(gate.astype(jnp.float32)) * up.astype(jnp.float32)).astype(
        x.dtype
    )


def gelu_and_mul(x: jnp.ndarray) -> jnp.ndarray:
    gate, up = jnp.split(x, 2, axis=-1)
    return (
        jax.nn.gelu(gate.astype(jnp.float32), approximate=False)
        * up.astype(jnp.float32)
    ).astype(x.dtype)


ACT2FN = {"silu": silu_and_mul, "gelu": gelu_and_mul}
