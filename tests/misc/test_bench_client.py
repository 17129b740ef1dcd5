"""Benchmark client metric math (counterpart of the reference's client-side
stats, /root/reference/python/minisgl/benchmark/client.py:350-383)."""

import numpy as np

from minisgl_tpu.benchmark import (
    BenchOneResult,
    process_results,
    read_jsonl_trace,
    scale_traces,
)


def _mk(send, tics):
    return BenchOneResult(send_time=send, tics=list(tics))


def test_process_results_basic():
    # req A: sent t=0, tokens at 0.1, 0.2, 0.3; req B: sent 0.05, token 0.25
    res = [
        _mk(0.0, [0.1, 0.2, 0.3]),
        _mk(0.05, [0.25]),
    ]
    st = process_results(res)
    assert st.num_requests == 2
    assert st.num_tokens == 4
    np.testing.assert_allclose(st.ttft[0], 1000 * (0.1 + 0.2) / 2)
    np.testing.assert_allclose(st.tpot[0], 100.0)  # (0.3-0.1)/2 s -> ms
    np.testing.assert_allclose(st.duration, 0.3, atol=1e-9)
    np.testing.assert_allclose(st.token_throughput, 4 / 0.3)


def test_itl_exposes_burst_cadence():
    # K-burst stream: 3 tokens back-to-back, a 0.15s gap, 3 more. TPOT
    # (burst-amortized mean) smears the gap; ITL percentiles must show it.
    res = [_mk(0.0, [0.1, 0.101, 0.102, 0.252, 0.253, 0.254])]
    st = process_results(res)
    gaps = np.diff([0.1, 0.101, 0.102, 0.252, 0.253, 0.254]) * 1000
    np.testing.assert_allclose(st.itl[0], gaps.mean())
    np.testing.assert_allclose(st.itl[1], 1.0)  # p50: within-burst gap
    np.testing.assert_allclose(st.itl[4], 150.0)  # max: the burst interval
    assert st.itl[4] > 4 * st.tpot[1]


def test_empty_results_filtered():
    st = process_results([_mk(0.0, [0.5]), _mk(0.0, [])])
    assert st.num_requests == 1


def test_trace_reader_and_scaling(tmp_path):
    p = tmp_path / "trace.jsonl"
    p.write_text(
        '{"timestamp": 100.0, "input_length": 10, "output_length": 5}\n'
        '{"timestamp": 101.5, "input_length": 20, "output_length": 6}\n'
    )
    rows = read_jsonl_trace(str(p))
    assert rows == [(0.0, 10, 5, None, 0), (1.5, 20, 6, None, 0)]
    scaled = scale_traces(rows, 2.0)
    assert scaled[1][0] == 3.0


def test_trace_prefix_groups(tmp_path):
    """Rows sharing a prefix_group get identical leading tokens from
    synth_requests; mooncake hash_ids map to coarse block groups."""
    from minisgl_tpu.benchmark.client import synth_requests

    p = tmp_path / "trace.jsonl"
    p.write_text(
        '{"timestamp": 0, "input_length": 40, "output_length": 4, '
        '"prefix_group": "a", "prefix_len": 30}\n'
        '{"timestamp": 1, "input_length": 50, "output_length": 4, '
        '"prefix_group": "a", "prefix_len": 30}\n'
        '{"timestamp": 2, "input_length": 50, "output_length": 4}\n'
        '{"timestamp": 3, "input_length": 600, "output_length": 4, '
        '"hash_ids": [7, 9]}\n'
        '{"timestamp": 4, "input_length": 700, "output_length": 4, '
        '"hash_ids": [7, 11]}\n'
    )
    rows = read_jsonl_trace(str(p))
    assert rows[0][3] == "a" and rows[0][4] == 30
    assert rows[3][3] == ("mc", 7) and rows[3][4] == 512
    reqs = synth_requests(rows)
    a0, a1, uniq = reqs[0][1], reqs[1][1], reqs[2][1]
    assert a0["input_ids"][:30] == a1["input_ids"][:30]
    assert a0["input_ids"][30:] != a1["input_ids"][30:40]
    assert uniq["input_ids"][:30] != a0["input_ids"][:30]
    m0, m1 = reqs[3][1], reqs[4][1]
    assert m0["input_ids"][:512] == m1["input_ids"][:512]
    assert len(m0["input_ids"]) == 600 and len(m1["input_ids"]) == 700
