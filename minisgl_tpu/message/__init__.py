"""Typed inter-process messages (three families, counterpart of
/root/reference/python/minisgl/message/: tokenizer 22-41, backend 22-41,
frontend 20-28)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Union

import numpy as np

from minisgl_tpu.core import SamplingParams
from minisgl_tpu.message.serde import dumps, loads, register_msg

register_msg(SamplingParams)


# ---- tokenizer-bound (frontend -> tokenizer) -------------------------------


class BaseTokenizerMsg:
    pass


@register_msg
@dataclass
class TokenizeMsg(BaseTokenizerMsg):
    uid: int
    text: Union[str, List[dict], None]  # raw prompt or chat messages
    sampling_params: SamplingParams
    # pre-tokenized passthrough (/generate with input_ids): skips encoding
    input_ids: Union[List[int], None] = None


@register_msg
@dataclass
class AbortMsg(BaseTokenizerMsg):
    uid: int


@register_msg
@dataclass
class ProfileMsg(BaseTokenizerMsg):
    """Start/stop an on-demand jax.profiler device trace in the scheduler."""

    action: str  # "start" | "stop"
    log_dir: str = "/tmp/minisgl_tpu_trace"


@register_msg
@dataclass
class MetricsMsg(BaseTokenizerMsg):
    """Request a scheduler metrics snapshot (frontend /metrics endpoint)."""

    nonce: int = 0


# ---- backend-bound (tokenizer -> scheduler) --------------------------------


class BaseBackendMsg:
    pass


@register_msg
@dataclass
class UserMsg(BaseBackendMsg):
    uid: int
    input_ids: np.ndarray  # int32
    sampling_params: SamplingParams


@register_msg
@dataclass
class AbortBackendMsg(BaseBackendMsg):
    uid: int


@register_msg
@dataclass
class ProfileBackendMsg(BaseBackendMsg):
    action: str
    log_dir: str = "/tmp/minisgl_tpu_trace"


@register_msg
@dataclass
class MetricsBackendMsg(BaseBackendMsg):
    nonce: int = 0


@register_msg
@dataclass
class ExitMsg(BaseBackendMsg):
    pass


@register_msg
@dataclass
class BatchBackendMsg(BaseBackendMsg):
    data: List[BaseBackendMsg] = field(default_factory=list)


# ---- detokenizer-bound (scheduler -> tokenizer) ----------------------------


@register_msg
@dataclass
class DetokenizeMsg:
    uid: int
    next_token: int
    finished: bool
    # filled on the finished message only (OpenAI usage accounting)
    prompt_tokens: int = 0
    completion_tokens: int = 0
    # client-disconnect abort: the detokenizer drops its per-uid streaming
    # state and emits no reply (nobody is listening)
    aborted: bool = False
    # when the request asked for logprobs: this token's logprob and the
    # top-N alternative (token id, logprob) pairs
    logprob: Optional[float] = None
    top_ids: Optional[List[int]] = None
    top_logprobs: Optional[List[float]] = None


@register_msg
@dataclass
class MetricsSnapshot:
    """Scheduler counters, riding the detokenizer->frontend reply stream
    (the detokenize worker forwards it untouched)."""

    nonce: int = 0
    stats: dict = field(default_factory=dict)


@register_msg
@dataclass
class BatchDetokenizeMsg:
    data: List[DetokenizeMsg] = field(default_factory=list)


# ---- frontend-bound (tokenizer -> api server) ------------------------------


class BaseFrontendMsg:
    pass


@register_msg
@dataclass
class UserReply(BaseFrontendMsg):
    uid: int
    incremental_output: str
    finished: bool
    prompt_tokens: int = 0
    completion_tokens: int = 0
    # when logprobs were requested: OpenAI-shaped entry for THIS token —
    # {"token": str, "logprob": float,
    #  "top_logprobs": [{"token": str, "logprob": float}, ...]}
    logprobs: Optional[dict] = None


@register_msg
@dataclass
class BatchFrontendMsg(BaseFrontendMsg):
    data: List[UserReply] = field(default_factory=list)


__all__ = [
    "AbortBackendMsg",
    "AbortMsg",
    "MetricsBackendMsg",
    "MetricsMsg",
    "MetricsSnapshot",
    "ProfileMsg",
    "ProfileBackendMsg",
    "BaseBackendMsg",
    "BaseFrontendMsg",
    "BaseTokenizerMsg",
    "BatchBackendMsg",
    "BatchDetokenizeMsg",
    "BatchFrontendMsg",
    "DetokenizeMsg",
    "ExitMsg",
    "TokenizeMsg",
    "UserMsg",
    "UserReply",
    "dumps",
    "loads",
]
