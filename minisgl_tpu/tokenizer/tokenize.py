"""Prompt -> token ids, including chat-template application.

Counterpart of /root/reference/python/minisgl/tokenizer/tokenize.py:10-31.
"""

from __future__ import annotations

from typing import List, Union

import numpy as np

from minisgl_tpu.utils import cached_load_tokenizer

Prompt = Union[str, List[dict]]


class TokenizeManager:
    def __init__(self, model_path: str):
        self.tokenizer = cached_load_tokenizer(model_path)

    def tokenize(self, prompt: Prompt) -> np.ndarray:
        if isinstance(prompt, str):
            ids = self.tokenizer.encode(prompt)
        else:  # chat messages -> template -> ids
            ids = self.tokenizer.apply_chat_template(
                prompt, tokenize=True, add_generation_prompt=True
            )
        return np.asarray(ids, dtype=np.int32)
