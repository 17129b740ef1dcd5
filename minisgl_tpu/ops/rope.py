"""Rotary position embedding: host-precomputed cos/sin cache + fused apply.

Counterpart of /root/reference/python/minisgl/layers/rotary.py:12-145 (which
precomputes a cos/sin cache and applies it in-place via a flashinfer kernel).
TPU design: the cache is a computed buffer in the params pytree (f32,
[max_position, rotary_dim]) and application is a pure jnp function that XLA
fuses into the surrounding QKV projection — no custom kernel needed since the
op is bandwidth-trivial elementwise work on [T, H, D].

Supports rope_type: default / llama3 / yarn (same scaling formulas as the
reference's inv_freq post-processing, rotary.py:69-112).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from minisgl_tpu.models.config import RotaryConfig


def _base_inv_freq(rotary_dim: int, base: float) -> np.ndarray:
    return 1.0 / (
        base ** (np.arange(0, rotary_dim, 2, dtype=np.float64) / rotary_dim)
    )


def _llama3_scaling(inv_freq: np.ndarray, scaling: Dict[str, Any]) -> np.ndarray:
    factor = scaling["factor"]
    low_f = scaling["low_freq_factor"]
    high_f = scaling["high_freq_factor"]
    orig_max = scaling["original_max_position_embeddings"]
    wave_len = 2 * math.pi / inv_freq
    if low_f == high_f:
        return np.where(wave_len < orig_max / high_f, inv_freq, inv_freq / factor)
    smooth = np.clip((orig_max / wave_len - low_f) / (high_f - low_f), 0.0, 1.0)
    return ((1 - smooth) / factor + smooth) * inv_freq


def _yarn_scaling(
    inv_freq: np.ndarray, rotary_dim: int, base: float, scaling: Dict[str, Any]
) -> tuple[np.ndarray, float]:
    factor = scaling["factor"]
    beta_fast = scaling.get("beta_fast", 32.0)
    beta_slow = scaling.get("beta_slow", 1.0)
    orig_max = scaling["original_max_position_embeddings"]

    def correction_dim(num_rotations: float) -> float:
        return (
            rotary_dim
            * math.log(orig_max / (num_rotations * 2 * math.pi))
            / (2 * math.log(base))
        )

    low = max(math.floor(correction_dim(beta_fast)), 0)
    high = min(math.ceil(correction_dim(beta_slow)), rotary_dim // 2 - 1)
    ramp = np.clip(
        (np.arange(rotary_dim // 2, dtype=np.float64) - low) / max(high - low, 1),
        0.0,
        1.0,
    )
    scaled = (inv_freq / factor) * ramp + inv_freq * (1 - ramp)
    # yarn attention temperature (mscale) folded into the cos/sin cache
    mscale = scaling.get("attention_factor")
    if mscale is None:
        mscale = 0.1 * math.log(factor) + 1.0 if factor > 1 else 1.0
    return scaled, float(mscale)


def compute_rope_cache(cfg: RotaryConfig) -> np.ndarray:
    """Returns [max_position, rotary_dim] f32: cos cache in [:, :d/2], sin in
    [:, d/2:]."""
    inv_freq = _base_inv_freq(cfg.rotary_dim, cfg.base)
    mscale = 1.0
    scaling = cfg.scaling
    rope_type = (scaling or {}).get("rope_type") or (scaling or {}).get("type")
    if scaling is not None and rope_type not in (None, "default"):
        if rope_type == "llama3":
            inv_freq = _llama3_scaling(inv_freq, scaling)
        elif rope_type == "yarn":
            inv_freq, mscale = _yarn_scaling(
                inv_freq, cfg.rotary_dim, cfg.base, scaling
            )
        else:
            raise ValueError(f"unsupported rope scaling type: {rope_type}")
    t = np.arange(cfg.max_position, dtype=np.float64)
    freqs = np.outer(t, inv_freq)  # [max_pos, d/2]
    cache = np.concatenate(
        [np.cos(freqs) * mscale, np.sin(freqs) * mscale], axis=1
    )
    return cache.astype(np.float32)


def apply_rope(
    x: jnp.ndarray,  # [T, H, D]
    cos_sin: jnp.ndarray,  # [T, rotary_dim] gathered rows of the cache
    rotary_dim: Optional[int] = None,
) -> jnp.ndarray:
    """Neox-style (non-interleaved) rotary application in f32."""
    d = rotary_dim or x.shape[-1]
    half = d // 2
    cos = cos_sin[:, None, :half]
    sin = cos_sin[:, None, half : 2 * half]
    x_rot = x[..., :d].astype(jnp.float32)
    x1, x2 = x_rot[..., :half], x_rot[..., half:]
    o1 = x1 * cos - x2 * sin
    o2 = x2 * cos + x1 * sin
    rotated = jnp.concatenate([o1, o2], axis=-1).astype(x.dtype)
    if d == x.shape[-1]:
        return rotated
    return jnp.concatenate([rotated, x[..., d:]], axis=-1)
