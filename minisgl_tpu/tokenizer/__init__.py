from minisgl_tpu.tokenizer.detokenize import DetokenizeManager
from minisgl_tpu.tokenizer.tokenize import TokenizeManager
from minisgl_tpu.tokenizer.server import detokenize_worker, tokenize_worker

__all__ = [
    "DetokenizeManager",
    "TokenizeManager",
    "detokenize_worker",
    "tokenize_worker",
]
