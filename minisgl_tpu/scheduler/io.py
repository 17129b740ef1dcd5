"""Scheduler I/O: message intake + result output.

Counterpart of /root/reference/python/minisgl/scheduler/io.py:15-133. The
reference runs one scheduler process per TP rank and keeps ranks in lockstep
with a PUB/SUB byte-stream + gloo msg-count broadcast. On TPU a single
controller process per host owns all local chips, so single-host serving needs
no lockstep at all; the multi-host design keeps the same principle (host 0
PULLs from the tokenizer, re-PUBs raw bytes to peer hosts with a counted
header so every host sees a byte-identical request stream) and plugs in behind
the same two methods.

Offline mode swaps both methods for virtual ones the offline LLM API
overrides (reference io.py:30-33).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, List

from minisgl_tpu.message import BaseBackendMsg, BatchDetokenizeMsg, DetokenizeMsg
from minisgl_tpu.utils import ZmqPullQueue, ZmqPushQueue

if TYPE_CHECKING:
    from minisgl_tpu.engine.config import SchedulerConfig


class SchedulerIOMixin:
    def __init__(self, config: "SchedulerConfig"):
        self._offline = config.offline_mode
        if self._offline:
            return
        self.recv_queue: ZmqPullQueue[BaseBackendMsg] = ZmqPullQueue(
            config.zmq_backend_addr, bind=True
        )
        self.send_queue: ZmqPushQueue[BatchDetokenizeMsg] = ZmqPushQueue(
            config.zmq_detokenizer_addr, bind=False
        )

    # -- online ---------------------------------------------------------

    def receive_msg(self, blocking: bool) -> List[BaseBackendMsg]:
        if self._offline:
            return self.offline_receive_msg(blocking)
        return self.recv_queue.drain(first_block=blocking)

    def send_result(self, replies: List[DetokenizeMsg]) -> None:
        if not replies:
            return
        if self._offline:
            return self.offline_send_result(replies)
        self.send_queue.put(BatchDetokenizeMsg(data=replies))

    def shutdown_io(self) -> None:
        if not self._offline:
            self.recv_queue.stop()
            self.send_queue.stop()

    # -- offline hooks (overridden by llm.LLM) --------------------------

    def offline_receive_msg(self, blocking: bool) -> List[BaseBackendMsg]:
        raise NotImplementedError

    def offline_send_result(self, replies: List[DetokenizeMsg]) -> None:
        raise NotImplementedError
