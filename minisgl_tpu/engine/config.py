"""Engine configuration (frozen dataclass, CLI-populated).

Parity with /root/reference/python/minisgl/engine/config.py:15-55, with the
CUDA-specific knobs re-interpreted for TPU:

- ``cuda_graph_*`` -> ``decode_bs_buckets`` / ``max_decode_bs``: the ladder of
  padded decode batch sizes each compiled once by XLA (the jit-bucket
  replacement for CUDA-graph capture, reference graph.py:49-67).
- ``use_pynccl`` -> gone: collectives are XLA ICI/DCN ops on the mesh.
- page_size (the reference uses 1): on TPU the page is the attention
  kernel's DMA granule. Default None = auto by KV dtype, from the
  slope-timed sweep + e2e benches (BENCHLOG round 2): int8 pools take
  128-token pages (per-DMA fixed cost on small strided runs is what made
  int8 KV a loss at 16; at 128 it reads 620 GB/s and wins 1.65x), bf16
  pools take 16 (the mixed-length page overread at 128 costs bf16 more
  than the 686->750 GB/s DMA gain is worth). Cost of big pages: up to
  page_size-1 wasted slots per request and page-granular radix matching.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import cached_property
from typing import List, Optional

from minisgl_tpu.utils import cached_load_hf_config, div_ceil


@dataclass(frozen=True)
class EngineConfig:
    model_path: str
    tp_size: int = 1
    dp_size: int = 1
    # dp request routing: "load" (least-loaded) | "cache" (longest radix
    # prefix match wins; replicas own disjoint KV pools, so affinity
    # routing preserves cache reuse)
    dp_route: str = "load"
    dtype: str = "auto"  # auto | bfloat16 | float32
    max_running_req: int = 256
    attention_backend: str = "auto"  # auto | pallas | xla
    moe_backend: str = "auto"
    max_decode_bs: Optional[int] = None
    page_size: Optional[int] = None  # None = auto by KV dtype (module doc)
    memory_ratio: float = 0.9
    use_dummy_weight: bool = False
    max_seq_len_override: Optional[int] = None
    num_page_override: Optional[int] = None
    # weight-only quantization (BASELINE.md north star):
    # "none" | "int8" (per-output-channel scales, dequant fused into the
    # matmul epilogue) | "w8a8" (+dynamic activation quant, int8 MXU) |
    # "int4" (2 nibbles/byte packed on the contraction axis, grouped scales)
    quantization: str = "none"
    # KV pool storage dtype: "auto" (= model dtype) | "bf16" | "fp8"
    # (float8_e4m3, scale-less — emulated casts make it slow on v5e) |
    # "int8" (per-(token, head) scales fused into the kernels' score path —
    # the v5e-native low-precision KV mode)
    kv_dtype: str = "auto"
    # KV pool memory layout (ops/kv.py): "plane" = plane-major
    # [L*P, 2, ps*kvh, hd] (each page's K/V plane is one contiguous DMA —
    # 1.7x decode streaming on v5e, BENCHLOG round 4); "heads" =
    # head-blocked [L*P, ps, 2*kvh, hd] (legacy; required by the rpa
    # vendor backend). "auto" = plane on the pallas backend, heads
    # elsewhere.
    kv_layout: str = "auto"
    # prefill token-count buckets are powers of two up to max_extend_tokens
    min_prefill_bucket: int = 128
    # decode iterations fused per dispatch when no prefill is pending
    # (device-side loop; tokens stream to the detokenizer in bursts of K)
    decode_steps: int = 1
    # "prefill-first" (the reference's fcfs prefill-priority policy,
    # scheduler.py:219-225; "fcfs" is accepted as an alias) or
    # "interleave": one decode step between consecutive prefill chunks,
    # bounding inter-token latency during long chunked prefills
    schedule_policy: str = "prefill-first"
    # scheduler result-pipeline depth: results are processed this many
    # iterations after dispatch, keeping that many D2H token fetches in
    # flight (hides high per-fetch latency; EOS detection lags by
    # depth*decode_steps tokens). 0 = MSLT_PIPELINE_DEPTH env (default 1,
    # the reference's one-behind overlap)
    pipeline_depth: int = 0
    # speculative decoding (beyond the reference): "none" | "lookup"
    # (prompt-lookup / n-gram self-drafting, spec/lookup.py). Greedy
    # requests whose suffix n-gram recurs in their own history get draft
    # tokens verified in ONE extend forward — every accepted draft is a
    # nearly-free token on a memory-bound decode.
    spec_algo: str = "none"
    # max draft tokens staged per verify step (the verify sampling width is
    # 1 + this, compiled statically into the verify step fn)
    spec_draft_tokens: int = 8
    # suffix n-gram sizes tried (longest first) by the lookup proposer
    spec_ngram_max: int = 4
    spec_ngram_min: int = 2
    # drafting auto-gate: bypass speculative drafting while the running set
    # is larger than this. The crossover is measured (BENCHLOG round 3:
    # 7.9x at bs=2, 5.8x at bs=8, 0.31x at bs=32 — at large batch decode is
    # no longer weights-bound and the verify extend fragments the decode
    # pipeline), so the flag is safe to leave on in a server that sees both
    # regimes. 0 disables the gate (always draft).
    spec_max_batch: int = 8
    # AOT-compile the remaining (phase, bucket, K) step variants on a
    # daemon thread after serving starts: a cold bucket hit by live traffic
    # costs 10-60 s of TTFT through remote compile. On for the HTTP serving
    # plane (server/args.py); off for offline runs, which control their own
    # warmup and would race the bench's timed window
    background_warmup: bool = False

    def __post_init__(self):
        if self.page_size is None:
            object.__setattr__(
                self,
                "page_size",
                128 if self.resolved_kv_dtype == "int8" else 16,
            )

    @cached_property
    def hf_config(self):
        return cached_load_hf_config(self.model_path)

    @cached_property
    def model_config(self):
        from minisgl_tpu.models.config import ModelConfig

        return ModelConfig.from_hf(self.hf_config)

    @property
    def resolved_dtype(self) -> str:
        if self.dtype != "auto":
            return self.dtype
        return "float32" if self.model_config.dtype == "float32" else "bfloat16"

    @property
    def resolved_kv_dtype(self) -> str:
        if self.kv_dtype != "auto":
            return self.kv_dtype
        return "float32" if self.resolved_dtype == "float32" else "bf16"

    @property
    def max_seq_len(self) -> int:
        if self.max_seq_len_override is not None:
            return self.max_seq_len_override
        return self.model_config.rotary_config.max_position

    @property
    def pages_per_req(self) -> int:
        return div_ceil(self.max_seq_len, self.page_size)

    def decode_bs_buckets(self) -> List[int]:
        """[1, 4, 16, ..., max] padded decode batch sizes. The reference's
        CUDA-graph ladder is x2 (graph.py:49-67) because capture is cheap;
        XLA compiles per bucket are not, so the default ladder steps x4 —
        at most 4x padding waste on the small-batch drain tail, which is
        cheap compute anyway."""
        max_bs = min(self.max_decode_bs or self.max_running_req, self.max_running_req)
        buckets = []
        bs = 1
        while bs < max_bs:
            buckets.append(bs)
            bs *= 4
        buckets.append(max_bs)
        return buckets


@dataclass(frozen=True)
class SchedulerConfig(EngineConfig):
    """Parity with reference scheduler/config.py:14-41."""

    max_extend_tokens: int = 8192
    cache_type: str = "radix"
    offline_mode: bool = False
    schedule_policy: str = "fcfs"
    # multi-host continuous batching: every host runs one scheduler in
    # lockstep (io.py counted-broadcast over tcp); node 0 owns the frontend
    num_nodes: int = 1
    node_rank: int = 0
    # host:port of node 0 for the lockstep broadcast + jax.distributed
    master_addr: str = "127.0.0.1"
    lockstep_port: int = 31000
    dist_init_port: int = 31100

    _unique_suffix: str = field(default_factory=lambda: f".pid={__import__('os').getpid()}")

    @property
    def zmq_backend_addr(self) -> str:
        return "ipc:///tmp/minisgl_tpu_0" + self._unique_suffix

    @property
    def zmq_detokenizer_addr(self) -> str:
        return "ipc:///tmp/minisgl_tpu_1" + self._unique_suffix

    @property
    def zmq_scheduler_broadcast_addr(self) -> str:
        return "ipc:///tmp/minisgl_tpu_2" + self._unique_suffix

    @property
    def lockstep_pub_addr(self) -> str:
        return f"tcp://{self.master_addr}:{self.lockstep_port}"

    @property
    def lockstep_ready_addr(self) -> str:
        return f"tcp://{self.master_addr}:{self.lockstep_port + 1}"

    @property
    def dist_init_addr(self) -> str:
        return f"{self.master_addr}:{self.dist_init_port}"

    @property
    def max_forward_len(self) -> int:
        return self.max_extend_tokens

    def prefill_token_buckets(self) -> List[int]:
        buckets = []
        t = self.min_prefill_bucket
        while t < self.max_extend_tokens:
            buckets.append(t)
            t *= 2
        buckets.append(self.max_extend_tokens)
        return buckets
