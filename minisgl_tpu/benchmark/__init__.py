from minisgl_tpu.benchmark.client import (
    BenchOneResult,
    BenchStats,
    benchmark_batch,
    benchmark_trace,
    process_results,
    read_jsonl_trace,
    scale_traces,
)

__all__ = [
    "BenchOneResult",
    "BenchStats",
    "benchmark_batch",
    "benchmark_trace",
    "process_results",
    "read_jsonl_trace",
    "scale_traces",
]
