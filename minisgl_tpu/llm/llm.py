"""Offline LLM API: synchronous generate() over the scheduler loop.

Parity with /root/reference/python/minisgl/llm/llm.py:28-98: LLM subclasses
Scheduler with offline_mode=True, feeds pending prompts through the virtual
receive hook respecting the prefill budget, accumulates tokens through the
virtual send hook, and drains the loop via RequestAllFinished.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple, Union

import numpy as np

from minisgl_tpu.core import SamplingParams
from minisgl_tpu.engine.config import SchedulerConfig
from minisgl_tpu.message import BaseBackendMsg, DetokenizeMsg, UserMsg
from minisgl_tpu.scheduler.scheduler import Scheduler
from minisgl_tpu.utils import cached_load_tokenizer


class RequestAllFinished(Exception):
    pass


@dataclass
class RequestStatus:
    uid: int
    input_ids: List[int]
    output_ids: List[int]
    # per-token (logprob, [(token_id, logprob), ...]) when requested
    logprobs: Optional[List[tuple]] = None


Prompt = Union[str, List[int]]


class LLM(Scheduler):
    def __init__(self, model_path: str, **kwargs):
        config = SchedulerConfig(
            model_path=model_path, offline_mode=True, **kwargs
        )
        super().__init__(config)
        try:
            self.tokenizer = cached_load_tokenizer(model_path)
        except Exception:  # token-id prompts still work without a tokenizer
            self.tokenizer = None
        self.pending_requests: List[Tuple[Prompt, SamplingParams]] = []
        self.status_map: Dict[int, RequestStatus] = {}
        self.counter = 0

    def _tokenize_one(self, prompt: Prompt) -> np.ndarray:
        if isinstance(prompt, str):
            assert self.tokenizer is not None, "no tokenizer for str prompts"
            return np.asarray(self.tokenizer.encode(prompt), dtype=np.int32)
        return np.asarray(prompt, dtype=np.int32)

    def offline_receive_msg(self, blocking: bool = False) -> List[BaseBackendMsg]:
        if blocking and not self.pending_requests:
            raise RequestAllFinished()
        results: List[BaseBackendMsg] = []
        added, sum_input_len = 0, 0
        for prompt, sp in self.pending_requests:
            if sum_input_len >= self.prefill_budget:
                break
            input_ids = self._tokenize_one(prompt)
            sum_input_len += len(input_ids)
            uid = self.counter + added
            added += 1
            results.append(
                UserMsg(uid=uid, input_ids=input_ids, sampling_params=sp)
            )
            self.status_map[uid] = RequestStatus(
                uid=uid,
                input_ids=[int(t) for t in input_ids],
                output_ids=[],
            )
        self.counter += added
        self.pending_requests = self.pending_requests[added:]
        return results

    def offline_send_result(self, reply: List[DetokenizeMsg]) -> None:
        for msg in reply:
            status = self.status_map[msg.uid]
            if not (msg.finished and msg.next_token in self.eos_token_ids):
                status.output_ids.append(msg.next_token)
                if msg.logprob is not None:
                    if status.logprobs is None:
                        status.logprobs = []
                    status.logprobs.append(
                        (
                            msg.logprob,
                            list(zip(msg.top_ids or [], msg.top_logprobs or [])),
                        )
                    )

    def generate(
        self,
        prompts: List[Prompt],
        sampling_params: Union[SamplingParams, List[SamplingParams]],
    ) -> List[Dict[str, Union[str, List[int]]]]:
        self.pending_requests = []
        self.status_map = {}
        self.counter = 0
        if isinstance(sampling_params, SamplingParams):
            sampling_params = [sampling_params] * len(prompts)
        for prompt, sp in zip(prompts, sampling_params):
            self.pending_requests.append((prompt, sp))
        try:
            self.run_forever()
        except RequestAllFinished:
            pass
        results: List[Dict[str, Union[str, List[int]]]] = []
        for i in range(len(prompts)):
            status = self.status_map[i]
            text = (
                self.tokenizer.decode(status.output_ids)
                if self.tokenizer is not None
                else ""
            )
            out: Dict[str, Union[str, List[int], list]] = {
                "text": text, "token_ids": status.output_ids
            }
            if status.logprobs is not None:
                out["logprobs"] = status.logprobs
            results.append(out)
        return results
