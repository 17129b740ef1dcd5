"""On-chip quality gate through the PRODUCTION attention paths (round-5
VERDICT #4 + #6).

The committed CPU gate (tests/quality/test_fixture_gate.py) necessarily
pins backend="xla"; the pallas decode kernel's in-kernel int8-KV dequant —
the path that actually serves — was covered only by token-exactness A/Bs.
This script scores the trained fixture checkpoints through:

  prefill path   score_nll(backend=...)        (extend kernel)
  decode path    score_nll_decode(backend=...) (fused store + decode kernel)

for backend in {xla, pallas} x layout in {heads, plane} x quant mode, and
prints a delta-vs-bf16 table. A sidecar-lane-order bug in the pallas
dequant would show as a pallas delta diverging from the xla delta.

--geometry gate    : the committed 2-layer fixture (kvh=2 -> heads layout
                     only, general decode kernel)
--geometry depth28 : flagship-depth 28-layer Qwen3-0.6B stack (kvh=8 ->
                     plane layout + flat/hybrid serving kernel; VERDICT #6
                     quant-error accumulation at depth). Checkpoint is
                     generated on demand (python -m minisgl_tpu.quality.fixture
                     /tmp/fixture-depth28 --geometry depth28).

Usage: python benchmark/quality_gate_chip.py [--geometry gate|depth28]
           [--fixture DIR] [--seqs N] [--len T]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp")
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MODES = {
    "bf16": dict(),
    "int8": dict(quantization="int8"),
    "int8kv": dict(kv_dtype="int8"),
    "int8+int8kv": dict(quantization="int8", kv_dtype="int8"),
    "int4": dict(quantization="int4"),
    "w8a8": dict(quantization="w8a8"),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--geometry", choices=("gate", "depth28"), default="gate")
    ap.add_argument("--fixture", default=None)
    ap.add_argument("--seqs", type=int, default=6)
    # depth28 must evaluate at the TRAINED copy offset (T=256): the
    # 28-layer model learns a positional shortcut (copy = attend exactly
    # 128 back); at T=257 the corpus copy offset shifts to 129 and the
    # model collapses 0.71 -> 4.11 nats, drowning all quant deltas (the
    # 2-layer model generalizes content-based and scores fine at 257).
    ap.add_argument("--len", type=int, dest="T", default=None)
    ap.add_argument("--page-size", type=int, default=16)
    ap.add_argument(
        "--paths", nargs="*", default=None,
        help="substring filters on path labels (e.g. decode/pallas/plane) "
        "— each label kept if it contains ANY filter; default: all",
    )
    args = ap.parse_args()
    if args.T is None:
        args.T = 257 if args.geometry == "gate" else 256

    fixture = args.fixture or (
        os.path.join(REPO, "assets", "fixture-gate")
        if args.geometry == "gate"
        else "/tmp/fixture-depth28"
    )
    if not os.path.exists(os.path.join(fixture, "model.safetensors")):
        sys.exit(
            f"fixture checkpoint missing at {fixture}; generate with\n"
            f"  python -m minisgl_tpu.quality.fixture {fixture} "
            f"--geometry {args.geometry}"
        )

    import jax

    from minisgl_tpu.quality.fixture import GEOMETRIES, eval_seqs
    from minisgl_tpu.quality.nll import score_nll, score_nll_decode

    kvh = GEOMETRIES[args.geometry]["num_key_value_heads"]
    layouts = ["heads"] + (["plane"] if kvh % 8 == 0 else [])
    backends = ["xla"] + (
        ["pallas"] if jax.default_backend() != "cpu" else []
    )
    seqs = eval_seqs(n=args.seqs, T=args.T)

    paths = []  # (label, callable kwargs)
    for be in backends:
        for layout in layouts:
            if be == "xla" and layout != "heads":
                continue  # xla path is layout-agnostic; score once
            paths.append((f"prefill/{be}/{layout}", score_nll, be, layout))
            paths.append((f"decode/{be}/{layout}", score_nll_decode, be, layout))
    if args.paths:
        paths = [p for p in paths if any(f in p[0] for f in args.paths)]

    results = {}
    for label, fn, be, layout in paths:
        row = {}
        for mode, kw in MODES.items():
            r = fn(
                fixture, seqs, backend=be, page_size=args.page_size,
                kv_layout=layout, **kw,
            )
            row[mode] = r["nll_per_token"]
            print(
                f"{label:24s} {mode:12s} nll/token {r['nll_per_token']:.5f}",
                flush=True,
            )
        results[label] = row

    print("\n=== delta vs bf16 (nats/token) ===")
    modes = [m for m in MODES if m != "bf16"]
    print(f"{'path':24s} " + " ".join(f"{m:>12s}" for m in modes))
    for label, row in results.items():
        base = row["bf16"]
        print(
            f"{label:24s} "
            + " ".join(f"{row[m] - base:12.5f}" for m in modes),
            flush=True,
        )


if __name__ == "__main__":
    main()
