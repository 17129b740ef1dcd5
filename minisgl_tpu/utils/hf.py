"""HuggingFace config/tokenizer/weight-file helpers.

Counterpart of /root/reference/python/minisgl/utils/hf.py:17-49. Works with a
local model directory (the common case for serving); falls back to
huggingface_hub download when the path is a repo id and the hub is reachable.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Any, Dict, List


def resolve_model_dir(model_path: str) -> str:
    path = os.path.expanduser(model_path)
    if os.path.isdir(path):
        return path
    try:  # repo id — attempt hub download (offline envs will fail cleanly)
        from huggingface_hub import snapshot_download

        return snapshot_download(model_path)
    except Exception as e:  # pragma: no cover
        raise FileNotFoundError(
            f"model path '{model_path}' is not a local directory and hub "
            f"download failed: {e}"
        ) from e


@functools.lru_cache(maxsize=8)
def cached_load_hf_config(model_path: str) -> Dict[str, Any]:
    model_dir = resolve_model_dir(model_path)
    with open(os.path.join(model_dir, "config.json")) as f:
        return json.load(f)


@functools.lru_cache(maxsize=4)
def cached_load_tokenizer(model_path: str):
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(resolve_model_dir(model_path))


def list_safetensor_files(model_path: str) -> List[str]:
    model_dir = resolve_model_dir(model_path)
    index_path = os.path.join(model_dir, "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        files = sorted(set(index["weight_map"].values()))
        return [os.path.join(model_dir, f) for f in files]
    files = sorted(
        f for f in os.listdir(model_dir) if f.endswith(".safetensors")
    )
    if not files:
        raise FileNotFoundError(f"no .safetensors files under {model_dir}")
    return [os.path.join(model_dir, f) for f in files]
