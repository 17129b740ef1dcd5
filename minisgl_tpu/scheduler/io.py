"""Scheduler I/O: message intake + result output, single- and multi-host.

Counterpart of /root/reference/python/minisgl/scheduler/io.py:15-133. The
reference runs one scheduler process per TP rank and keeps ranks in lockstep
with a PUB/SUB byte-stream + a gloo msg-count broadcast per loop iteration
(io.py:88-122). On TPU a single controller process per host owns all local
chips, so single-host serving needs no lockstep; multi-host serving keeps the
reference's principle with ZMQ alone:

- node 0 PULLs from the tokenizer, then publishes the drained batch — as ONE
  multipart frame [count, msg0, msg1, ...] — to follower nodes over tcp PUB;
  it publishes on EVERY receive call (zero-count frames included) so every
  node's scheduling loop consumes a byte-identical message stream in the
  same iteration order (the gloo counted-broadcast made lockstep, io.py:100-122).
- followers SUB and block on the frame; a PUSH/PULL ready-rendezvous before
  the first publish avoids the PUB slow-joiner race.
- only node 0 pushes results to the detokenizer (io.py:124-133).

Offline mode swaps both methods for virtual ones the offline LLM API
overrides (reference io.py:30-33).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, List

from minisgl_tpu.message import BaseBackendMsg, BatchDetokenizeMsg, DetokenizeMsg
from minisgl_tpu.message.serde import dumps, loads
from minisgl_tpu.utils import ZmqPullQueue, ZmqPushQueue, init_logger

if TYPE_CHECKING:
    from minisgl_tpu.engine.config import SchedulerConfig

logger = init_logger(__name__, "SchedulerIO")


class SchedulerIOMixin:
    def __init__(self, config: "SchedulerConfig"):
        self._offline = config.offline_mode
        self._node_rank = getattr(config, "node_rank", 0)
        self._num_nodes = getattr(config, "num_nodes", 1)
        if self._offline:
            return
        self._is_primary = self._node_rank == 0
        if self._is_primary:
            self.recv_queue: ZmqPullQueue[BaseBackendMsg] = ZmqPullQueue(
                config.zmq_backend_addr, bind=True
            )
            self.send_queue: ZmqPushQueue[BatchDetokenizeMsg] = ZmqPushQueue(
                config.zmq_detokenizer_addr, bind=False
            )
        if self._num_nodes > 1:
            self._init_lockstep(config)

    # -- multi-host lockstep --------------------------------------------

    def _init_lockstep(self, config: "SchedulerConfig") -> None:
        import zmq

        ctx = zmq.Context.instance()
        if self._is_primary:
            # XPUB (not PUB): the socket surfaces one \x01 subscription frame
            # per joining subscriber, so waiting for those proves every
            # follower's SUBSCRIBE actually reached this socket — no
            # slow-joiner race, no sleep. (A PUSH rendezvous only proves the
            # follower's *other* socket connected.)
            self._bcast = ctx.socket(zmq.XPUB)
            self._bcast.setsockopt(zmq.XPUB_VERBOSE, 1)  # 1 event per peer
            self._bcast.bind(config.lockstep_pub_addr)
            joined = 0
            while joined < self._num_nodes - 1:
                ev = self._bcast.recv()
                if ev[:1] == b"\x01":
                    joined += 1
            logger.info(f"lockstep: {joined} followers subscribed")
        else:
            self._bcast = ctx.socket(zmq.SUB)
            self._bcast.connect(config.lockstep_pub_addr)
            self._bcast.setsockopt(zmq.SUBSCRIBE, b"")

    def _publish_msgs(self, msgs: List[BaseBackendMsg]) -> None:
        frames = [str(len(msgs)).encode()] + [dumps(m) for m in msgs]
        self._bcast.send_multipart(frames)

    def _recv_broadcast(self) -> List[BaseBackendMsg]:
        frames = self._bcast.recv_multipart()
        count = int(frames[0])
        return [loads(f) for f in frames[1 : 1 + count]]

    # -- online ---------------------------------------------------------

    def receive_msg(self, blocking: bool) -> List[BaseBackendMsg]:
        if self._offline:
            return self.offline_receive_msg(blocking)
        if self._num_nodes <= 1:
            return self.recv_queue.drain(first_block=blocking)
        if self._is_primary:
            msgs = self.recv_queue.drain(first_block=blocking)
            # publish every call (empty included): followers' loops advance
            # in lockstep with ours
            self._publish_msgs(msgs)
            return msgs
        return self._recv_broadcast()

    def send_result(self, replies: List[DetokenizeMsg]) -> None:
        if not replies:
            return
        if self._offline:
            return self.offline_send_result(replies)
        if self._node_rank == 0:
            self.send_queue.put(BatchDetokenizeMsg(data=replies))

    def shutdown_io(self) -> None:
        if self._offline:
            return
        if self._is_primary:
            self.recv_queue.stop()
            self.send_queue.stop()
        if self._num_nodes > 1:
            self._bcast.close()

    # -- offline hooks (overridden by llm.LLM) --------------------------

    def offline_receive_msg(self, blocking: bool) -> List[BaseBackendMsg]:
        raise NotImplementedError

    def offline_send_result(self, replies: List[DetokenizeMsg]) -> None:
        raise NotImplementedError
