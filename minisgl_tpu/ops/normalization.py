"""RMSNorm and fused residual-add RMSNorm.

Counterpart of /root/reference/python/minisgl/layers/norm.py:8-38 (flashinfer
rmsnorm / fused_add_rmsnorm). On TPU these stay as jnp expressions — XLA fuses
the add+norm+scale chain into neighbouring ops; a hand-written kernel would
only re-derive the same fusion.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def rmsnorm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def fused_add_rmsnorm(
    x: jnp.ndarray,
    residual: Optional[jnp.ndarray],
    weight: jnp.ndarray,
    eps: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (normed(x + residual), x + residual); residual None on the
    first layer (reference norm.py:23-38 semantics)."""
    if residual is not None:
        x = x + residual
    return rmsnorm(x, weight, eps), x
