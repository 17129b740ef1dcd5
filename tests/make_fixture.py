"""Create a tiny TPU-compilable fixture model (Qwen3 architecture, head_dim
128 so Pallas kernels meet lane tiling) with a byte-level tokenizer — the HF
hub is unreachable in CI/TPU environments, so everything is generated locally.

Usage: python tests/make_fixture.py /tmp/tiny_qwen3
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

CONFIG = {
    "architectures": ["Qwen3ForCausalLM"],
    "model_type": "qwen3",
    "hidden_size": 256,
    "intermediate_size": 512,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "head_dim": 128,
    "vocab_size": 512,
    "rms_norm_eps": 1e-6,
    "rope_theta": 10000.0,
    "max_position_embeddings": 4096,
    "tie_word_embeddings": True,
    "hidden_act": "silu",
    "torch_dtype": "bfloat16",
    "eos_token_id": 256,
}


def make_fixture(out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(CONFIG, f, indent=2)

    # byte-level tokenizer (256 byte alphabet + <|endoftext|> = id 256)
    from tokenizers import Tokenizer
    from tokenizers.decoders import ByteLevel as ByteLevelDecoder
    from tokenizers.models import BPE
    from tokenizers.pre_tokenizers import ByteLevel

    alphabet = sorted(ByteLevel.alphabet())
    vocab = {c: i for i, c in enumerate(alphabet)}
    vocab["<|endoftext|>"] = len(vocab)
    tok = Tokenizer(BPE(vocab=vocab, merges=[]))
    tok.pre_tokenizer = ByteLevel(add_prefix_space=False, use_regex=True)
    tok.decoder = ByteLevelDecoder()
    tok.save(os.path.join(out_dir, "tokenizer.json"))
    with open(os.path.join(out_dir, "tokenizer_config.json"), "w") as f:
        json.dump(
            {
                "tokenizer_class": "PreTrainedTokenizerFast",
                "eos_token": "<|endoftext|>",
                "chat_template": (
                    "{% for m in messages %}<{{ m['role'] }}>"
                    "{{ m['content'] }}{% endfor %}<assistant>"
                ),
                "model_max_length": 4096,
            },
            f,
        )

    # random weights
    from safetensors.numpy import save_file

    c = CONFIG
    H, I, L, hd = (
        c["hidden_size"],
        c["intermediate_size"],
        c["num_hidden_layers"],
        c["head_dim"],
    )
    nh, nkv, V = c["num_attention_heads"], c["num_key_value_heads"], c["vocab_size"]
    rng = np.random.default_rng(0)
    t = {}

    def w(name, shape):
        t[name] = (rng.standard_normal(shape) * 0.02).astype(np.float32)

    w("model.embed_tokens.weight", (V, H))
    w("model.norm.weight", (H,))
    for i in range(L):
        p = f"model.layers.{i}."
        w(p + "input_layernorm.weight", (H,))
        w(p + "post_attention_layernorm.weight", (H,))
        w(p + "self_attn.q_proj.weight", (nh * hd, H))
        w(p + "self_attn.k_proj.weight", (nkv * hd, H))
        w(p + "self_attn.v_proj.weight", (nkv * hd, H))
        w(p + "self_attn.o_proj.weight", (H, nh * hd))
        w(p + "self_attn.q_norm.weight", (hd,))
        w(p + "self_attn.k_norm.weight", (hd,))
        w(p + "mlp.gate_proj.weight", (I, H))
        w(p + "mlp.up_proj.weight", (I, H))
        w(p + "mlp.down_proj.weight", (H, I))
    save_file(t, os.path.join(out_dir, "model.safetensors"))
    return out_dir


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tiny_qwen3"
    print(make_fixture(out))
