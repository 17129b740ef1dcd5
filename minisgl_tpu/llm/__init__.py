from minisgl_tpu.llm.llm import LLM, RequestAllFinished

__all__ = ["LLM", "RequestAllFinished"]
