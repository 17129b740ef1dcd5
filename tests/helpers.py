"""Shared test helpers: tiny HF checkpoints and a minimal sequential
generation loop driving the raw step functions (no scheduler) for numerics
parity tests."""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from minisgl_tpu.attention import create_attention_backend
from minisgl_tpu.attention.metadata import AttnMetadata, SamplingMetadata, StepMetadata
from minisgl_tpu.engine.step import DeviceState, build_step_fn
from minisgl_tpu.models.base import create_model
from minisgl_tpu.models.config import ModelConfig
from minisgl_tpu.models.weight import load_params
from minisgl_tpu.ops.kv import KV
from minisgl_tpu.parallel.mesh import create_mesh
from minisgl_tpu.utils import cached_load_hf_config, div_ceil

def to_plane_major(kv: KV) -> KV:
    """Head-blocked pool [N, ps, 2kvh, hd] -> plane-major [N, 2, ps*kvh, hd]
    (plane row t*kvh + h; scale sidecars are layout-independent)."""
    d = np.asarray(kv.data)
    N, ps, kvh2, hd = d.shape
    kvh = kvh2 // 2
    flat = np.stack(
        [
            d[:, :, :kvh, :].reshape(N, ps * kvh, hd),
            d[:, :, kvh:, :].reshape(N, ps * kvh, hd),
        ],
        axis=1,
    )
    return KV(jnp.asarray(flat), kv.scale, kv.scale_p)


def from_plane_major(kv: KV, page_size: int) -> KV:
    """Inverse of to_plane_major (for comparing updated pools)."""
    d = np.asarray(kv.data)
    N, _two, S, hd = d.shape
    kvh = S // page_size
    heads = np.concatenate(
        [
            d[:, 0].reshape(N, page_size, kvh, hd),
            d[:, 1].reshape(N, page_size, kvh, hd),
        ],
        axis=2,
    )
    return KV(jnp.asarray(heads), kv.scale, kv.scale_p)


TINY_LLAMA_KW = dict(
    vocab_size=256,
    hidden_size=64,
    intermediate_size=96,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=128,
    rope_theta=10000.0,
    tie_word_embeddings=False,
)


def save_tiny_hf_model(tmpdir: str, family: str = "llama", **overrides):
    """Create a randomly-initialized tiny HF model and save it (config +
    safetensors) to tmpdir. Returns the torch model (eval mode, float32)."""
    import torch

    torch.manual_seed(0)
    kw = dict(TINY_LLAMA_KW)
    kw.update(overrides)
    if family == "llama":
        from transformers import LlamaConfig, LlamaForCausalLM

        model = LlamaForCausalLM(LlamaConfig(**kw))
    elif family == "qwen2":
        from transformers import Qwen2Config, Qwen2ForCausalLM

        model = Qwen2ForCausalLM(Qwen2Config(**kw))
    elif family == "qwen3":
        from transformers import Qwen3Config, Qwen3ForCausalLM

        kw.setdefault("head_dim", kw["hidden_size"] // kw["num_attention_heads"])
        model = Qwen3ForCausalLM(Qwen3Config(**kw))
    elif family == "qwen3_moe":
        from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

        kw.setdefault("num_experts", 4)
        kw.setdefault("num_experts_per_tok", 2)
        kw.setdefault("moe_intermediate_size", 48)
        kw.setdefault("norm_topk_prob", True)
        kw.setdefault("decoder_sparse_step", 1)
        kw.setdefault("mlp_only_layers", [])
        model = Qwen3MoeForCausalLM(Qwen3MoeConfig(**kw))
    elif family == "mistral":
        from transformers import MistralConfig, MistralForCausalLM

        model = MistralForCausalLM(MistralConfig(**kw))
    else:
        raise ValueError(family)
    model = model.eval().to(torch.float32)
    model.save_pretrained(tmpdir, safe_serialization=True)
    return model


def hf_greedy_generate(model, prompt_ids: List[int], n_new: int):
    """HF reference: returns (tokens, per-step last logits [n_new+1, V])."""
    import torch

    ids = torch.tensor([prompt_ids], dtype=torch.long)
    all_logits = []
    tokens = []
    with torch.no_grad():
        for _ in range(n_new + 1):
            logits = model(ids).logits[0, -1].float()
            all_logits.append(logits.numpy())
            nxt = int(torch.argmax(logits))
            tokens.append(nxt)
            ids = torch.cat([ids, torch.tensor([[nxt]])], dim=1)
    return tokens[:n_new], np.stack(all_logits)


class SimpleRunner:
    """Minimal paged generation driver over the raw step fns: pages allocated
    sequentially, single request, no scheduler. For parity tests."""

    def __init__(
        self,
        model_dir: str,
        tp_size: int = 1,
        page_size: int = 4,
        backend: str = "xla",
        max_seq: int = 128,
    ):
        hf = cached_load_hf_config(model_dir)
        self.cfg = ModelConfig.from_hf(hf)
        self.model = create_model(self.cfg, tp_size)
        self.mesh = create_mesh(tp_size=tp_size)
        self.params = load_params(model_dir, self.model.params_spec, self.mesh)
        self.page_size = page_size
        self.max_seq = max_seq
        self.pages_cap = div_ceil(max_seq, page_size)
        num_pages = self.pages_cap + 1  # + dummy page 0
        L = self.cfg.num_layers
        kvh = self.model.dims.kv_heads_eff
        hd = self.cfg.head_dim
        dtype = jnp.float32 if self.cfg.dtype == "float32" else jnp.bfloat16
        kv_sharding = self.mesh.sharding(
            jax.sharding.PartitionSpec(None, None, "model", None)
        )
        self.state = DeviceState(
            kv=KV(
                data=jax.device_put(
                    jnp.zeros((L * num_pages, page_size, 2 * kvh, hd), dtype),
                    kv_sharding,
                ),
                scale=None,
            ),
            token_slots=jnp.zeros((9,), jnp.int32),
            rng=jax.random.PRNGKey(0),
        )
        self.backend = backend
        self.hd = hd

    def _attn(self, phase):
        return create_attention_backend(
            self.backend, page_size=self.page_size, head_dim=self.hd, phase=phase
        )

    def _meta(self, phase, positions, out_slots, seq_len, input_ids=None):
        T = len(positions)
        B = 1
        page_table = np.arange(1, self.pages_cap + 1, dtype=np.int32)[None, :]
        return StepMetadata(
            attn=AttnMetadata(
                out_slots=jnp.asarray(np.asarray(out_slots, np.int32)),
                positions=jnp.asarray(np.asarray(positions, np.int32)),
                page_table=jnp.asarray(page_table),
                seq_lens=jnp.asarray(np.array([seq_len], np.int32)),
                q_req_ids=jnp.zeros((T,), jnp.int32),
                last_q_index=jnp.asarray(np.array([T - 1], np.int32)),
                cu_q_lens=jnp.asarray(np.array([0, T], np.int32)),
                num_seqs=jnp.asarray(np.array([1], np.int32)),
            ),
            sampling=SamplingMetadata(
                temperature=jnp.zeros((B,)),
                top_k=jnp.full((B,), -1, jnp.int32),
                top_p=jnp.ones((B,)),
            ),
            slot_ids=jnp.asarray(np.array([1], np.int32)),
            input_ids=None if input_ids is None else jnp.asarray(
                np.asarray(input_ids, np.int32)
            ),
        )

    def greedy_generate(self, prompt_ids: List[int], n_new: int):
        """Returns (tokens, per-step logits [n_new+1, V])."""
        p = len(prompt_ids)
        # token slots start at page 1 (page 0 is the dummy page)
        slot0 = self.page_size
        prefill_step = build_step_fn(
            self.model, self.mesh, self._attn("prefill"), "prefill", True, True
        )
        meta = self._meta(
            "prefill",
            positions=np.arange(p),
            out_slots=slot0 + np.arange(p),
            seq_len=p,
            input_ids=prompt_ids,
        )
        self.state, tokens, logits = prefill_step(self.params, self.state, meta)
        out_tokens = [int(np.asarray(tokens)[0])]
        all_logits = [np.asarray(logits)[0]]

        decode_step = build_step_fn(
            self.model, self.mesh, self._attn("decode"), "decode", True, True
        )
        for i in range(n_new):
            pos = p + i
            meta = self._meta(
                "decode",
                positions=[pos],
                out_slots=[slot0 + pos],
                seq_len=pos + 1,
            )
            self.state, tokens, logits = decode_step(self.params, self.state, meta)
            out_tokens.append(int(np.asarray(tokens)[0]))
            all_logits.append(np.asarray(logits)[0])
        return out_tokens[:n_new], np.stack(all_logits)
