"""Structured-weight fixture checkpoint for the quantization quality gate.

Round-3 VERDICT: with pure random ("dummy") weights the NLL gate gates
nothing — quantization deltas come out NEGATIVE (noise), so a broken int8
path would pass. The reference validates its model path against real HF
checkpoints (/root/reference/python/minisgl/models/weight.py:75-124); the
hub is unreachable here, so this module *manufactures* a checkpoint with the
two properties a real one has that make quantization damage measurable:

1. **Predictive structure.** A few hundred seeded optimizer steps on a
   low-entropy Markov corpus, trained through the repo's OWN decoder forward
   (models/common.py, xla attention — pure jnp, hence differentiable).
   A model that actually predicts has a sharpened output distribution;
   perturbing its weights now *raises* NLL instead of diffusing it.
2. **Outlier channels.** Real LLMs develop high-magnitude activation
   channels that are exactly what per-tensor/per-row quantization struggles
   with (the LLM.int8 phenomenon). We inject them FUNCTION-PRESERVINGLY:
   scaling up_proj output-channel j by s and down_proj input-row j by 1/s
   leaves the f32 network identical but (a) puts s-sized outliers in the
   activation tensor (damages W8A8's per-token dynamic quant) and (b) puts
   an s-sized dynamic range across down_proj's contraction axis (damages
   per-output-channel int8 and grouped int4 weight quant). The same trick on
   v_proj-output / o_proj-input pairs puts outlier dims inside the V cache
   rows (damages int8-KV's per-(token, head) scales).

The result: NLL deltas vs bf16 are strictly positive and obey the
theory-forced partial order (int4 > int8; w8a8 worst overall — the
injected activation outliers target exactly per-token activation quant;
int8-KV positive via the copy-corpus induction task and the V-dim
outliers, but below w8a8), so the gate can FAIL when a quant path
regresses (tests/quality/test_fixture_gate.py proves it trips on a
scale-layout off-by-one in the int8 quantizer).

Generate once (seeded, deterministic given the JAX platform):
    python -m minisgl_tpu.quality.fixture assets/fixture-gate
"""

from __future__ import annotations

import json
import os
from typing import Dict, Tuple

import numpy as np

CONFIG = {
    "architectures": ["Qwen3ForCausalLM"],
    "model_type": "qwen3",
    "hidden_size": 256,
    "intermediate_size": 1024,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "head_dim": 128,  # full Mosaic lane width: pallas kernels run on-chip
    "vocab_size": 512,
    "rms_norm_eps": 1e-6,
    "rope_theta": 10000.0,
    "max_position_embeddings": 4096,
    "tie_word_embeddings": True,
    "hidden_act": "silu",
    "torch_dtype": "bfloat16",  # the gate's baseline is the bf16 pipeline
    "eos_token_id": 256,
}

# Flagship-depth geometry (round-5 VERDICT #6): the REAL Qwen3-0.6B layer
# stack — 28 layers, hidden 1024, 16 q / 8 kv heads, hd 128 — so quant
# error ACCUMULATION through a production-depth residual stream is
# measured, and kvh=8 permits the plane-major pool layout + the flat int8
# decode kernel (the serving path; the 2-layer kvh=2 gate fixture can
# only exercise the general kernel). Vocab stays 512 (the corpus task).
# ~440M params: train on the TPU chip (~2 min); too large to commit, so
# the checkpoint is generated on demand and cached (see main()).
CONFIG28 = {
    **CONFIG,
    "hidden_size": 1024,
    "intermediate_size": 3072,
    "num_hidden_layers": 28,
    "num_attention_heads": 16,
    "num_key_value_heads": 8,
}

GEOMETRIES = {"gate": CONFIG, "depth28": CONFIG28}

SEED = 1234
TRAIN_STEPS = 400
BATCH, SEQ = 8, 256
# outlier injection strengths (see module docstring): ffn channels hit
# weight/activation quant, v-dims hit the KV cache quant
FFN_OUTLIERS, FFN_SCALE = 16, 48.0
V_OUTLIERS, V_SCALE = 16, 48.0


CORPUS_VERSION = 2  # bump when the corpus distribution changes (cache key)


def make_corpus(rng: np.random.Generator, n: int, T: int, vocab: int):
    """Seeded Markov-walk-then-COPY sequences: the first half is a
    first-order Markov walk (~0.9 nats/token: 4 plausible successors with
    probs [.7, .15, .1, .05]); the second half REPEATS the first half
    verbatim. Predicting the copy requires induction — attending to the
    history and reading V content — so KV-cache quantization damage lands
    in NLL (a pure Markov task is solvable by the MLP bigram table alone
    and left int8-KV deltas at the noise floor).

    The transition TABLE is fixed (seeded independently of ``rng``): train
    and eval corpora walk the same chain, only the sampled paths differ —
    otherwise eval would measure a chain the model never saw."""
    table_rng = np.random.default_rng(SEED ^ 0x5EED)
    succ = np.stack(
        [table_rng.permutation(vocab) for _ in range(4)], axis=1
    )  # [vocab, 4] distinct-ish successors per token
    probs = np.array([0.7, 0.15, 0.1, 0.05])
    half = (T + 1) // 2
    walk = np.empty((n, half), np.int32)
    state = rng.integers(0, vocab, n)
    for t in range(half):
        walk[:, t] = state
        choice = rng.choice(4, size=n, p=probs)
        state = succ[state, choice]
    return np.concatenate([walk, walk[:, : T - half]], axis=1)


def _batched_nll_fn(model, mesh, attn, B: int, T: int, page_size: int = 16):
    """Returns jitted (params, ids [B, T]) -> mean NLL, running the REAL
    decoder forward (prefill write + paged attention) over B packed seqs."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from minisgl_tpu.attention.metadata import AttnMetadata
    from minisgl_tpu.ops.kv import KV
    from minisgl_tpu.parallel.mesh import MODEL_AXIS

    pages = -(-T // page_size)
    L = model.cfg.num_layers
    kvh = model.dims.kv_heads_eff
    hd = model.cfg.head_dim
    n_rows = (B * pages + 1) * L
    dt = jnp.float32 if model.cfg.dtype == "float32" else jnp.bfloat16

    pt = (1 + np.arange(B * pages, dtype=np.int32)).reshape(B, pages)
    out_slots = (
        pt[:, :, None] * page_size
        + np.arange(page_size, dtype=np.int32)[None, None, :]
    ).reshape(B, pages * page_size)[:, :T].reshape(-1)
    meta = AttnMetadata(
        out_slots=jnp.asarray(out_slots),
        positions=jnp.asarray(np.tile(np.arange(T, dtype=np.int32), B)),
        page_table=jnp.asarray(pt),
        seq_lens=jnp.full((B,), T, jnp.int32),
        q_req_ids=jnp.asarray(np.repeat(np.arange(B, dtype=np.int32), T)),
        last_q_index=jnp.asarray(
            np.arange(B, dtype=np.int32) * T + T - 1
        ),
        cu_q_lens=jnp.asarray(np.arange(B + 1, dtype=np.int32) * T),
        num_seqs=jnp.asarray([B], jnp.int32),
    )

    param_specs = {k: v.spec for k, v in model.params_spec.items()}
    kv_specs = KV(
        data=P(None, None, MODEL_AXIS, None), scale=None, scale_p=None
    )

    def nll(params, ids):
        kv = KV(
            data=jnp.zeros((n_rows, page_size, 2 * kvh, hd), dt),
            scale=None,
            scale_p=None,
        )
        flat = ids.reshape(-1)
        logits, _ = model.forward(
            params, flat, kv, meta, attn, gather_last=False,
            remat=True,  # differentiated: keep activations 1 layer deep
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt = jnp.take_along_axis(
            logp.reshape(B, T, -1)[:, :-1],
            ids[:, 1:, None].astype(jnp.int32),
            axis=2,
        )
        return -jnp.mean(tgt)

    sharded = jax.shard_map(
        lambda p, i: nll(p, i),
        mesh=mesh.mesh,
        in_specs=(param_specs, P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded), kv_specs


def train_params(
    verbose: bool = True, config: Dict | None = None
) -> Tuple[object, Dict, float]:
    """Seeded training run; returns (model, trained params dict, eval NLL)."""
    import jax
    import optax

    from minisgl_tpu.attention import create_attention_backend
    from minisgl_tpu.models.base import create_model
    from minisgl_tpu.models.config import ModelConfig
    from minisgl_tpu.models.weight import init_dummy_params
    from minisgl_tpu.parallel.mesh import create_mesh

    cfg_d = dict(config or CONFIG, torch_dtype="float32")  # train in f32
    cfg = ModelConfig.from_hf(cfg_d)
    model = create_model(cfg, 1, quant="none")
    mesh = create_mesh(tp_size=1)
    attn = create_attention_backend(
        "xla", page_size=16, head_dim=cfg.head_dim, phase="prefill"
    )
    params = init_dummy_params(model.params_spec, mesh)
    # dummy init draws norm gammas from the same 0.02 normal as weights;
    # start them at 1 (the real init) so training has signal from step 0
    import jax.numpy as jnp

    for k in list(params):
        if k.endswith("norm_w") or k == "final_norm":
            params[k] = jnp.ones_like(params[k])
    rng = np.random.default_rng(SEED)
    # the 28-layer geometry (~440M params f32 + adam + grads ~= 8.8 GB
    # resident) needs a small activation footprint to train inside one
    # 15.75 GB chip; batch 2 with 2x steps keeps the token count
    deep = cfg.num_layers > 4
    batch = BATCH if not deep else BATCH // 4
    steps = TRAIN_STEPS * (2 if deep else 1)
    loss_fn, _ = _batched_nll_fn(model, mesh, attn, batch, SEQ)

    frozen = {
        k for k, info in model.params_spec.items() if info.init is not None
    }  # rope cache etc.: buffers, not weights
    tx = optax.adam(
        optax.cosine_decay_schedule(3e-3, steps, alpha=0.1)
    )
    opt_state = tx.init({k: v for k, v in params.items() if k not in frozen})

    import functools

    # ONE fused, donated train step: params/opt_state buffers are reused in
    # place, halving peak HBM vs separate grad/update/apply calls (the
    # 28-layer f32 geometry OOMed a 16 GB chip without this)
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, ids):
        loss, grads = jax.value_and_grad(loss_fn)(params, ids)
        g = {k: v for k, v in grads.items() if k not in frozen}
        updates, opt_state = tx.update(g, opt_state)
        trained = optax.apply_updates(
            {k: v for k, v in params.items() if k not in frozen}, updates
        )
        return {**params, **trained}, opt_state, loss

    corpus = make_corpus(rng, steps * batch, SEQ, cfg.vocab_size)
    for step in range(steps):
        ids = corpus[step * batch : (step + 1) * batch]
        params, opt_state, loss = train_step(params, opt_state, ids)
        if verbose and step % 50 == 0:
            print(f"step {step:4d}  train nll/token {float(loss):.4f}")

    ev = make_corpus(np.random.default_rng(SEED + 1), batch, SEQ, cfg.vocab_size)
    eval_nll = float(loss_fn(params, ev))
    if verbose:
        print(f"eval nll/token {eval_nll:.4f} (corpus entropy ~0.9)")
    return model, params, eval_nll


def inject_outliers(model, params: Dict, rng: np.random.Generator) -> Dict:
    """Function-preserving outlier-channel injection (module docstring)."""
    import jax.numpy as jnp

    L = model.cfg.num_layers
    I = model.cfg.intermediate_size
    hd = model.cfg.head_dim
    q_out = model.dims.q_heads * hd
    kv_out = model.dims.kv_heads_eff * hd

    gate_up = np.array(params["layers/gate_up_w"], np.float32)  # [L, H, 2I]
    down = np.array(params["layers/down_w"], np.float32)  # [L, I, H]
    qkv = np.array(params["layers/qkv_w"], np.float32)  # [L, H, q+2kv]
    o_w = np.array(params["layers/o_w"], np.float32)  # [L, q_out, H]

    for li in range(L):
        ch = rng.choice(I, FFN_OUTLIERS, replace=False)
        s = FFN_SCALE * np.exp(rng.normal(0, 0.3, FFN_OUTLIERS))
        # NB mixed slice+fancy indexing puts the advanced axis FIRST:
        # gate_up[li, :, I+ch] has shape (n_ch, H)
        gate_up[li, :, I + ch] *= s[:, None]  # up output channels
        down[li, ch, :] /= s[:, None]  # matching contraction rows

        # v_proj output dims live at qkv columns [q_out + kv_out, end);
        # the matching o_proj rows: attention output head g uses the V row
        # of its kv head g // G, so every q head in the group compensates
        vdims = rng.choice(kv_out, V_OUTLIERS, replace=False)
        sv = V_SCALE * np.exp(rng.normal(0, 0.2, V_OUTLIERS))
        qkv[li, :, q_out + kv_out + vdims] *= sv[:, None]  # (n_v, H) view
        G = model.dims.q_heads // model.dims.kv_heads_eff
        for d, sc in zip(vdims, sv):
            h, off = divmod(int(d), hd)
            for g in range(G):
                o_w[li, (h * G + g) * hd + off, :] /= sc

    out = dict(params)
    dt = params["layers/gate_up_w"].dtype
    out["layers/gate_up_w"] = jnp.asarray(gate_up, dt)
    out["layers/down_w"] = jnp.asarray(down, dt)
    out["layers/qkv_w"] = jnp.asarray(qkv, dt)
    out["layers/o_w"] = jnp.asarray(o_w, dt)
    return out


def export_hf(
    model, params: Dict, out_dir: str, config: Dict | None = None
) -> None:
    """Write the internal param dict as an HF-format checkpoint that
    models/weight.py load_params re-assembles (inverse of the tp=1
    source transforms in models/common.py build_param_specs)."""
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(config or CONFIG, f, indent=2)

    hd = model.cfg.head_dim
    q_out = model.dims.q_heads * hd
    kv_out = model.dims.kv_heads_eff * hd
    I = model.cfg.intermediate_size
    L = model.cfg.num_layers

    def to_np(k):
        return np.asarray(params[k], np.float32)

    t: Dict[str, np.ndarray] = {
        "model.embed_tokens.weight": to_np("embed"),
        "model.norm.weight": to_np("final_norm"),
    }
    qkv = to_np("layers/qkv_w")
    o_w = to_np("layers/o_w")
    gu = to_np("layers/gate_up_w")
    dw = to_np("layers/down_w")
    inw = to_np("layers/input_norm_w")
    pnw = to_np("layers/post_norm_w")
    qn = to_np("layers/q_norm_w")
    kn = to_np("layers/k_norm_w")
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = inw[i]
        t[p + "post_attention_layernorm.weight"] = pnw[i]
        t[p + "self_attn.q_proj.weight"] = qkv[i, :, :q_out].T.copy()
        t[p + "self_attn.k_proj.weight"] = qkv[
            i, :, q_out : q_out + kv_out
        ].T.copy()
        t[p + "self_attn.v_proj.weight"] = qkv[i, :, q_out + kv_out :].T.copy()
        t[p + "self_attn.o_proj.weight"] = o_w[i].T.copy()
        t[p + "self_attn.q_norm.weight"] = qn[i]
        t[p + "self_attn.k_norm.weight"] = kn[i]
        t[p + "mlp.gate_proj.weight"] = gu[i, :, :I].T.copy()
        t[p + "mlp.up_proj.weight"] = gu[i, :, I:].T.copy()
        t[p + "mlp.down_proj.weight"] = dw[i].T.copy()
    save_file(t, os.path.join(out_dir, "model.safetensors"))


def eval_seqs(n: int = 8, T: int = 257):
    """Held-out gate sequences (page-boundary-crossing length)."""
    return make_corpus(
        np.random.default_rng(SEED + 2), n, T, CONFIG["vocab_size"]
    ).tolist()


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir", nargs="?", default="assets/fixture-gate")
    ap.add_argument(
        "--geometry", choices=sorted(GEOMETRIES), default="gate",
        help="gate: committed 2-layer fixture; depth28: flagship-depth "
        "Qwen3-0.6B stack (~440M params, generated on demand — train on "
        "the TPU chip; round-5 VERDICT #6)",
    )
    args = ap.parse_args()
    config = GEOMETRIES[args.geometry]
    # cache the (expensive) training result so injection/export iterations
    # are instant; keyed by the training hyperparameters
    geo = "" if args.geometry == "gate" else f"_{args.geometry}"
    cache = os.path.expanduser(
        f"~/.cache/mslt_fixture_v{CORPUS_VERSION}_{SEED}_{TRAIN_STEPS}"
        f"_{BATCH}x{SEQ}{geo}.npz"
    )
    if os.path.exists(cache):
        import jax.numpy as jnp

        from minisgl_tpu.models.base import create_model
        from minisgl_tpu.models.config import ModelConfig

        z = np.load(cache)
        params = {k: jnp.asarray(z[k]) for k in z.files}
        model = create_model(
            ModelConfig.from_hf(dict(config, torch_dtype="float32")), 1
        )
        print(f"loaded trained params from {cache}")
    else:
        model, params, eval_nll = train_params(config=config)
        np.savez(cache, **{k: np.asarray(v) for k, v in params.items()})
        print(f"trained (eval nll/token {eval_nll:.4f}); cached -> {cache}")
    params = inject_outliers(model, params, np.random.default_rng(SEED + 3))
    export_hf(model, params, out_dir=args.out_dir, config=config)
    print(f"fixture written to {args.out_dir}")


if __name__ == "__main__":
    main()
