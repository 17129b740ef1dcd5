"""Distributed (vocab-sharded) sampling vs the gathered reference
implementation: greedy must be token-exact; constrained sampling must pick
only valid candidates with exact full-vocab probabilities; results must be
replicated across ranks (lockstep safety)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from minisgl_tpu.attention.metadata import SamplingMetadata
from minisgl_tpu.ops.sampling import (
    greedy_sharded,
    sample_tokens,
    sample_tokens_sharded,
)
from minisgl_tpu.parallel.mesh import MODEL_AXIS, create_mesh

B, V = 16, 512
TP = 8


@pytest.fixture(scope="module")
def mesh_info():
    return create_mesh(tp_size=TP, dp_size=1)


def _sharded_logits(mesh_info, logits):
    return jax.device_put(
        logits, mesh_info.sharding(P(None, MODEL_AXIS))
    )


def test_greedy_sharded_token_exact(mesh_info):
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((B, V)).astype(np.float32)
    # inject exact ties spanning shards: argmax must pick the first
    logits[0, :] = 0.0
    logits[1, 100] = logits[1, 400] = 10.0

    fn = jax.jit(
        jax.shard_map(
            lambda x: greedy_sharded(x, MODEL_AXIS),
            mesh=mesh_info.mesh,
            in_specs=P(None, MODEL_AXIS),
            out_specs=P(),
            check_vma=False,
        )
    )
    got = np.asarray(fn(_sharded_logits(mesh_info, logits)))
    ref = np.argmax(logits, axis=-1)
    np.testing.assert_array_equal(got, ref)


def _meta(temperature, top_k, top_p):
    return SamplingMetadata(
        temperature=jnp.full((B,), temperature, jnp.float32),
        top_k=jnp.full((B,), top_k, jnp.int32),
        top_p=jnp.full((B,), top_p, jnp.float32),
    )


def _run_sharded(mesh_info, logits, meta, key):
    fn = jax.jit(
        jax.shard_map(
            lambda x, m, k: sample_tokens_sharded(x, m, k, MODEL_AXIS),
            mesh=mesh_info.mesh,
            in_specs=(P(None, MODEL_AXIS), P(), P()),
            out_specs=P(),
            check_vma=False,
        )
    )
    return np.asarray(fn(_sharded_logits(mesh_info, logits), meta, key))


def test_greedy_rows_match_through_sampler(mesh_info):
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((B, V)).astype(np.float32)
    meta = _meta(0.0, -1, 1.0)
    got = _run_sharded(mesh_info, logits, meta, jax.random.PRNGKey(7))
    np.testing.assert_array_equal(got, np.argmax(logits, -1))


def test_constrained_picks_valid_topk_candidates(mesh_info):
    rng = np.random.default_rng(2)
    logits = rng.standard_normal((B, V)).astype(np.float32)
    k = 8
    meta = _meta(1.0, k, 1.0)
    topk_sets = [
        set(np.argsort(row)[::-1][:k].tolist()) for row in logits
    ]
    for seed in range(5):
        got = _run_sharded(mesh_info, logits, meta, jax.random.PRNGKey(seed))
        for i, t in enumerate(got):
            assert int(t) in topk_sets[i], (i, int(t))


def test_distribution_matches_gathered_sampler(mesh_info):
    """Empirical check: sharded and gathered samplers draw the same
    distribution on a peaked 3-way row (different streams, same law)."""
    logits = np.full((B, V), -20.0, np.float32)
    logits[:, 5] = 2.0
    logits[:, 200] = 1.5
    logits[:, 450] = 1.0
    meta = _meta(1.0, 16, 1.0)
    counts_s = np.zeros(V)
    counts_r = np.zeros(V)
    for seed in range(40):
        key = jax.random.PRNGKey(seed)
        got = _run_sharded(mesh_info, logits, meta, key)
        ref = np.asarray(sample_tokens(jnp.asarray(logits), meta, key))
        for t in got:
            counts_s[t] += 1
        for t in ref:
            counts_r[t] += 1
    n = counts_s.sum()
    assert n == counts_r.sum() == 40 * B
    # both concentrate on the 3 live tokens with similar mass (exp weights
    # ~ 0.59/0.36/0.22 normalized); allow generous sampling noise
    for tok in (5, 200, 450):
        assert abs(counts_s[tok] - counts_r[tok]) / n < 0.1


def test_min_p_sharded(mesh_info):
    logits = np.full((B, V), -20.0, np.float32)
    logits[:, 10] = 3.0   # dominant
    logits[:, 300] = 0.0  # prob ratio exp(-3) ~ 0.05 < min_p
    meta = SamplingMetadata(
        temperature=jnp.full((B,), 1.0, jnp.float32),
        top_k=jnp.full((B,), -1, jnp.int32),
        top_p=jnp.full((B,), 1.0, jnp.float32),
        min_p=jnp.full((B,), 0.2, jnp.float32),
    )
    for seed in range(5):
        got = _run_sharded(mesh_info, logits, meta, jax.random.PRNGKey(seed))
        assert set(np.unique(got)) == {10}, np.unique(got)
