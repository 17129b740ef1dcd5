"""The quantization quality gate, armed (round-4 VERDICT #2).

Round 3's gate ran on random weights and reported NEGATIVE NLL deltas —
it could not detect genuine quantization damage. These tests run against
the committed structured-weight fixture (assets/fixture-gate, built by
minisgl_tpu/quality/fixture.py: trained on a low-entropy Markov corpus +
function-preserving outlier-channel injection) and assert:

1. every quant mode's NLL delta vs bf16 is strictly POSITIVE (quantization
   hurts a model that actually predicts);
2. the deltas obey the theory-forced partial order (see
   test_deltas_ranked): int4 > int8, w8a8 > int8, w8a8 the worst mode
   overall (the fixture injects activation-outlier channels specifically
   to hit per-token activation quant), int8-KV below w8a8;
3. the gate TRIPS on a deliberately mis-scaled quantizer — the failure
   mode round 3 proved would previously pass unnoticed.
"""

import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
FIXTURE = os.path.join(REPO, "assets", "fixture-gate")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(FIXTURE, "model.safetensors")),
    reason="fixture-gate checkpoint not generated "
    "(python -m minisgl_tpu.quality.fixture assets/fixture-gate)",
)


@pytest.fixture(scope="module")
def scores():
    from minisgl_tpu.quality.fixture import eval_seqs
    from minisgl_tpu.quality.nll import score_nll

    seqs = eval_seqs(n=6, T=257)
    out = {}
    for name, kw in {
        "bf16": dict(),
        "int8": dict(quantization="int8"),
        "w8a8": dict(quantization="w8a8"),
        "int4": dict(quantization="int4"),
        "int8kv": dict(kv_dtype="int8"),
    }.items():
        out[name] = score_nll(
            FIXTURE, seqs, backend="xla", page_size=16, **kw
        )["nll_per_token"]
    return out


def test_deltas_positive(scores):
    base = scores["bf16"]
    for mode in ("int8", "w8a8", "int4", "int8kv"):
        assert scores[mode] > base, (
            f"{mode} NLL {scores[mode]:.5f} did not exceed bf16 {base:.5f} "
            f"— the gate has no teeth on this fixture"
        )


def test_deltas_ranked(scores):
    """Theory-forced partial order on this fixture (measured v2-corpus
    deltas: w8a8 0.0130 > int4 0.0045 > int8kv 0.0033 > int8 0.0006):

    - int4 > int8: strictly coarser weight grid, same per-channel scales;
    - w8a8 > int8: w8a8 carries int8's weight error PLUS per-token
      activation error on the injected outlier channels;
    - w8a8 is the worst mode overall BY DESIGN: the fixture plants
      activation-outlier channels (the real-LLM failure mode SmoothQuant
      exists for), and the gate must see per-token activation quant take
      the largest hit — int4's per-channel scales ride through outlier
      *weights* fine, so a total order int4 > w8a8 is NOT theory-forced
      and does not hold here;
    - int8kv < w8a8: per-(token, head) KV scales are finer than
      per-token-over-hidden activation scales."""
    base = scores["bf16"]
    d = {m: scores[m] - base for m in ("int8", "w8a8", "int4", "int8kv")}
    assert d["int4"] > d["int8"], d
    assert d["w8a8"] > d["int8"], d
    assert d["w8a8"] == max(d.values()), d
    assert d["int8kv"] < d["w8a8"], d


def test_gate_trips_on_broken_quantizer(monkeypatch, scores):
    """An off-by-one in the per-channel scale mapping (each output channel
    dequantized with its neighbor's scale — the kind of silent layout bug
    the gate exists to catch) must blow the delta far past the healthy
    one. NB a *uniform* mis-scale would NOT do: rmsnorm re-normalizes each
    branch input, so globally doubled weights barely move NLL — the probe
    must break per-channel structure."""
    import numpy as np

    import minisgl_tpu.layers.params as P
    import minisgl_tpu.models.weight as W
    from minisgl_tpu.quality.fixture import eval_seqs
    from minisgl_tpu.quality.nll import score_nll

    healthy = scores["int8"] - scores["bf16"]

    real = P.quantize_int8

    def broken(arr):
        q, scale = real(arr)
        return q, np.roll(scale, 1, axis=-1)  # neighbor's scale

    # patch at both import sites (weight.py binds it at module level)
    monkeypatch.setattr(P, "quantize_int8", broken)
    if hasattr(W, "quantize_int8"):
        monkeypatch.setattr(W, "quantize_int8", broken)
    seqs = eval_seqs(n=2, T=129)
    bad = score_nll(
        FIXTURE, seqs, backend="xla", page_size=16, quantization="int8"
    )["nll_per_token"]
    assert bad - scores["bf16"] > max(10 * healthy, 0.3), (
        f"broken quantizer delta {bad - scores['bf16']:.4f} "
        f"did not trip the gate (healthy delta {healthy:.4f})"
    )


def test_fixture_checkpoint_loads_bitfaithfully():
    """The exporter's HF inversion is exact: loading the checkpoint and
    scoring must reproduce a sane trained NLL (far below the 6.24-nat
    uniform floor for a 512-token vocab), proving the name mapping and
    transposes round-trip."""
    from minisgl_tpu.quality.fixture import eval_seqs
    from minisgl_tpu.quality.nll import score_nll

    r = score_nll(FIXTURE, eval_seqs(n=2, T=129), backend="xla", page_size=16)
    assert r["nll_per_token"] < 4.0, r


def test_decode_path_scorer_matches_prefill(scores):
    """score_nll_decode computes the same teacher-forced quantity through
    the DECODE phase (per-position forward, fused KV store, decode
    attention) — on the exact-arithmetic xla backend it must agree with
    the prefill scorer to numerical noise, and its int8-KV delta must be
    positive like the prefill one (round-4 VERDICT #4: the decode path is
    the serving path and was not NLL-gated)."""
    from minisgl_tpu.quality.fixture import eval_seqs
    from minisgl_tpu.quality.nll import score_nll, score_nll_decode

    seqs = eval_seqs(n=2, T=129)
    pre = score_nll(FIXTURE, seqs, backend="xla", page_size=16)
    dec = score_nll_decode(FIXTURE, seqs, backend="xla", page_size=16)
    assert abs(pre["nll_per_token"] - dec["nll_per_token"]) < 2e-3, (pre, dec)
    dec_kv = score_nll_decode(
        FIXTURE, seqs, backend="xla", page_size=16, kv_dtype="int8"
    )
    assert dec_kv["nll_per_token"] > dec["nll_per_token"], (dec, dec_kv)
