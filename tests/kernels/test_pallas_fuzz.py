"""Randomized ragged-shape fuzz of the Pallas attention kernel against the
XLA reference (interpret mode — cheap, runs in CI). Catches masking / DMA
bound / block-alignment edge cases the targeted tests might miss."""

import numpy as np
import pytest

from tests.kernels.test_pallas_attention import HD, PS, TOL, _check, _mk_case


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_ragged(seed):
    rng = np.random.default_rng(100 + seed)
    B = int(rng.integers(1, 5))
    BQ = int(rng.choice([1, 4, 8]))
    pages_cap = int(rng.choice([8, 16]))
    seqs = []
    for _ in range(B):
        kv_len = int(rng.integers(1, pages_cap * PS + 1))
        if BQ == 1:
            q_len = 1  # decode mode: one token per seq
        else:
            q_len = int(rng.integers(1, kv_len + 1))
        seqs.append((q_len, kv_len))
    if BQ == 1:
        # decode requires T == B (one row per seq)
        pass
    Hq, kvh = int(rng.choice([2, 4])), 2
    q, kv, meta = _mk_case(rng, seqs, Hq=Hq, kvh=kvh, BQ=BQ,
                           pages_cap=pages_cap)
    _check(q, kv, meta, BQ=BQ)
