"""Large-model geometry sanity on the virtual CPU mesh (VERDICT items 4/8).

The reference benches Qwen3-0.6B/14B/32B (/root/reference/README.md:141-181);
the BASELINE north star adds Llama-3.1-70B INT4 (config 5). Real weights are
unreachable here and >16 GB models don't fit the single tunnel chip, so this
exercises the FULL engine path — config normalization, declarative param
specs, TP sharding, KV sizing, bucket compiles, one prefill + decode burst —
at the real geometries on an 8-virtual-device CPU mesh, and reports
wall-clock build/compile/step times.

Usage:
  python benchmark/geometry_check.py qwen3-32b-int8 [llama31-70b-int4 ...]

Each case prints one JSON line. RAM use is the quantized weight bytes
(int8 32B ~ 32 GB, int4 70B ~ 35 GB) — fits the 125 GB host, far too big
for a bf16 run, which is the point: quantization is what makes these
geometries representable at all.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CASES = {
    # name: (asset dir, quantization, kv_dtype, tp, max_seq_len, pages)
    # pages >= max_seq_len/16 so the requested context length is really
    # representable: the page table is PB=pages wide and the engine does not
    # clamp max_seq_len down to the pool size
    "qwen3-14b-int8": ("qwen3-14b", "int8", "int8", 8, 32768, 2304),
    "qwen3-32b-int8": ("qwen3-32b", "int8", "int8", 8, 32768, 2304),
    "llama31-70b-int4": ("llama31-70b", "int4", "int8", 8, 8192, 768),
}


def run_case(name: str) -> dict:
    asset, quant, kv_dtype, tp, max_seq, pages = CASES[name]
    from minisgl_tpu.core import SamplingParams
    from minisgl_tpu.llm import LLM

    t0 = time.perf_counter()
    llm = LLM(
        os.path.join(REPO, "assets", asset),
        use_dummy_weight=True,
        tp_size=tp,
        max_running_req=8,
        page_size=16,
        max_seq_len_override=max_seq,
        num_page_override=pages,
        quantization=quant,
        kv_dtype=kv_dtype,
        attention_backend="xla",  # CPU mesh: pallas only interprets
        decode_steps=2,
    )
    t_build = time.perf_counter() - t0

    t0 = time.perf_counter()
    llm.warmup()
    t_warmup = time.perf_counter() - t0

    t0 = time.perf_counter()
    toks = llm.generate(
        [list(range(1, 65))], SamplingParams(max_tokens=4, ignore_eos=True)
    )[0]["token_ids"]
    t_e2e = time.perf_counter() - t0
    assert len(toks) == 4, toks
    return {
        "case": name,
        "tp": tp,
        "max_seq_len": llm.engine.max_seq_len,  # effective (engine may clamp)
        "build_s": round(t_build, 1),
        "warmup_s": round(t_warmup, 1),
        "prefill64_decode4_s": round(t_e2e, 1),
    }


if __name__ == "__main__":
    names = sys.argv[1:] or list(CASES)
    for n in names:
        print(json.dumps(run_case(n)), flush=True)
