"""Sampling op: support restriction (top-k / top-p), temperature, greedy
rows (counterpart of reference engine/sample.py:24-45 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from minisgl_tpu.attention.metadata import SamplingMetadata
from minisgl_tpu.ops.sampling import sample_tokens


def _meta(temp, top_k, top_p):
    return SamplingMetadata(
        temperature=jnp.asarray(temp, jnp.float32),
        top_k=jnp.asarray(top_k, jnp.int32),
        top_p=jnp.asarray(top_p, jnp.float32),
    )


def _sample_many(logits, meta, n=200):
    out = []
    for i in range(n):
        key = jax.random.PRNGKey(i)
        out.append(np.asarray(sample_tokens(logits, meta, key)))
    return np.stack(out)  # [n, B]


def test_greedy_rows_deterministic():
    logits = jnp.asarray([[0.1, 2.0, 0.3], [5.0, 1.0, 0.0]])
    meta = _meta([0.0, 0.0], [-1, -1], [1.0, 1.0])
    s = _sample_many(logits, meta, 5)
    assert (s[:, 0] == 1).all() and (s[:, 1] == 0).all()


def test_top_k_restricts_support():
    logits = jnp.asarray([[3.0, 2.0, 1.0, 0.0, -1.0]])
    meta = _meta([1.0], [2], [1.0])
    s = _sample_many(logits, meta)
    assert set(np.unique(s)) <= {0, 1}
    assert len(set(np.unique(s))) == 2  # both eligible tokens appear


def test_top_p_keeps_minimal_prefix():
    # probs ~ [0.97, 0.01, ...]: top_p=0.5 keeps only token 0
    logits = jnp.asarray([[10.0, 5.0, 4.0, 3.0, 2.0]])
    meta = _meta([1.0], [-1], [0.5])
    s = _sample_many(logits, meta, 50)
    assert set(np.unique(s)) == {0}


def test_temperature_flattens():
    logits = jnp.asarray([[2.0, 0.0]])
    hot = _sample_many(logits, _meta([4.0], [-1], [1.0]))
    cold = _sample_many(logits, _meta([0.25], [-1], [1.0]))
    # colder temperature concentrates on the argmax
    assert (cold == 0).mean() > (hot == 0).mean()
    assert (cold == 0).mean() > 0.95


def test_mixed_greedy_and_sampled_batch():
    logits = jnp.asarray([[0.0, 3.0], [0.0, 0.0]])
    meta = _meta([0.0, 1.0], [-1, -1], [1.0, 1.0])
    s = _sample_many(logits, meta, 100)
    assert (s[:, 0] == 1).all()
    assert 0.2 < (s[:, 1] == 0).mean() < 0.8  # uniform row mixes


def test_min_p_filters_tail():
    # probs ~ [0.64, 0.24, 0.09, 0.03]; min_p=0.3 keeps only tokens with
    # prob >= 0.3 * 0.64 ~ 0.19 -> tokens {0, 1}
    logits = jnp.log(jnp.asarray([[0.64, 0.24, 0.09, 0.03]]))
    meta = SamplingMetadata(
        temperature=jnp.asarray([1.0], jnp.float32),
        top_k=jnp.asarray([-1], jnp.int32),
        top_p=jnp.asarray([1.0], jnp.float32),
        min_p=jnp.asarray([0.3], jnp.float32),
    )
    draws = _sample_many(logits, meta, n=300)
    assert set(np.unique(draws)) <= {0, 1}, np.unique(draws)
    # both surviving tokens actually get drawn
    assert {0, 1} <= set(np.unique(draws))


def test_min_p_zero_is_unconstrained():
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    meta = SamplingMetadata(
        temperature=jnp.asarray([1.0], jnp.float32),
        top_k=jnp.asarray([-1], jnp.int32),
        top_p=jnp.asarray([1.0], jnp.float32),
        min_p=jnp.asarray([0.0], jnp.float32),
    )
    draws = _sample_many(logits, meta, n=400)
    # every token reachable
    assert {0, 1, 2, 3} <= set(np.unique(draws))
