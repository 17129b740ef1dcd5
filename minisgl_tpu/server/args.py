"""CLI argument parsing -> frozen ServerArgs.

Counterpart of /root/reference/python/minisgl/server/args.py:14-268
(ServerArgs extends SchedulerConfig extends EngineConfig; argparse populates
the frozen chain; dtype/backends resolved from the HF config).
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass
from typing import List, Optional

from minisgl_tpu.attention import validate_attn_backend
from minisgl_tpu.engine.config import SchedulerConfig


@dataclass(frozen=True)
class ServerArgs(SchedulerConfig):
    host: str = "127.0.0.1"
    port: int = 30000
    num_tokenizers: int = 2
    served_model_name: Optional[str] = None

    @property
    def zmq_tokenizer_addr(self) -> str:
        return "ipc:///tmp/minisgl_tpu_tok" + self._unique_suffix

    @property
    def zmq_frontend_addr(self) -> str:
        return "ipc:///tmp/minisgl_tpu_fe" + self._unique_suffix

    @property
    def model_name(self) -> str:
        return self.served_model_name or self.model_path


def parse_args(argv: Optional[List[str]] = None) -> ServerArgs:
    p = argparse.ArgumentParser("minisgl-tpu serving engine")
    p.add_argument("--model", "--model-path", dest="model_path", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=30000)
    p.add_argument("--tp", dest="tp_size", type=int, default=1)
    p.add_argument("--dp", dest="dp_size", type=int, default=1)
    p.add_argument(
        "--dp-route", choices=["load", "cache"], default="load",
        help="dp replica routing: least-loaded, or radix-affinity "
        "(longest cached prefix wins, load breaks ties)",
    )
    p.add_argument(
        "--dtype", choices=["auto", "bfloat16", "float32"], default="auto"
    )
    p.add_argument("--max-running-req", type=int, default=256)
    p.add_argument(
        "--attention-backend",
        choices=["auto", "pallas", "rpa", "xla"],
        default="auto",
    )
    p.add_argument("--page-size", type=int, default=None, help="KV page (tokens); default auto by KV dtype")
    p.add_argument(
        "--quantization",
        choices=["none", "int8", "w8a8", "int4"],
        default="none",
    )
    p.add_argument("--decode-steps", type=int, default=1)
    p.add_argument(
        "--pipeline-depth", type=int, default=0,
        help="scheduler result-fetch pipeline depth (0 = env default 1)",
    )
    p.add_argument("--kv-dtype", dest="kv_dtype",
                   choices=["auto", "bf16", "fp8", "int8"], default="auto")
    p.add_argument(
        "--kv-layout", dest="kv_layout",
        choices=["auto", "plane", "heads"], default="auto",
        help="KV pool layout: plane-major (contiguous per-plane page DMA, "
        "pallas default) or head-blocked (legacy; required by rpa)",
    )
    p.add_argument(
        "--spec-algo", choices=["none", "lookup"], default="none",
        help="speculative decoding: lookup = prompt-lookup (n-gram "
        "self-drafting verified in one extend forward; greedy reqs only)",
    )
    p.add_argument("--spec-draft-tokens", type=int, default=8,
                   help="max draft tokens verified per speculative step")
    p.add_argument("--spec-ngram-max", type=int, default=4)
    p.add_argument("--spec-ngram-min", type=int, default=2)
    p.add_argument(
        "--spec-max-batch", type=int, default=8,
        help="bypass speculative drafting while more than this many "
        "requests are running (measured crossover: drafting wins when "
        "decode is weights-bound at small batch, loses ~3x at bs=32; "
        "0 = always draft)",
    )
    p.add_argument("--memory-ratio", type=float, default=0.9)
    p.add_argument("--max-seq-len", dest="max_seq_len_override", type=int)
    p.add_argument("--num-pages", dest="num_page_override", type=int)
    p.add_argument("--max-extend-tokens", type=int, default=8192)
    p.add_argument("--cache", dest="cache_type", choices=["radix", "naive"],
                   default="radix")
    p.add_argument(
        "--schedule-policy",
        choices=["prefill-first", "fcfs", "interleave"],
        default="prefill-first",
        help="prefill-first (= the reference's fcfs prefill-priority "
        "policy) or interleave: one decode step between prefill chunks, "
        "bounding ITL during long prompts at some prefill throughput cost",
    )
    p.add_argument("--dummy-weight", dest="use_dummy_weight",
                   action="store_true")
    p.add_argument("--num-tokenizers", type=int, default=2)
    p.add_argument("--num-nodes", type=int, default=1)
    p.add_argument("--node-rank", type=int, default=0)
    p.add_argument("--master-addr", default="127.0.0.1")
    p.add_argument("--lockstep-port", type=int, default=31000)
    p.add_argument("--dist-init-port", type=int, default=31100)
    p.add_argument("--served-model-name")
    # serving default ON: cold buckets ambushing live traffic cost 10-60 s
    # of first-hit TTFT (engine.warmup_background)
    p.add_argument(
        "--no-background-warmup",
        dest="background_warmup",
        action="store_false",
        default=True,
    )
    ns = p.parse_args(argv)
    validate_attn_backend(ns.attention_backend)
    fields = {f.name for f in dataclasses.fields(ServerArgs) if f.init}
    kwargs = {k: v for k, v in vars(ns).items() if k in fields and v is not None}
    return ServerArgs(**kwargs)
