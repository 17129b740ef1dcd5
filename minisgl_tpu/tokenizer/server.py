"""Tokenizer / detokenizer worker processes.

Counterpart of /root/reference/python/minisgl/tokenizer/server.py:31-110,
split into two roles (the reference runs N+1 combined workers): N stateless
tokenize workers round-robin on the frontend PUSH socket, and ONE stateful
detokenize worker (incremental per-uid streaming state must live in a single
process). Both ack on an mp queue at startup for the launcher rendezvous
(reference launch.py:110-111).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from minisgl_tpu.message import (
    AbortBackendMsg,
    AbortMsg,
    MetricsBackendMsg,
    MetricsMsg,
    MetricsSnapshot,
    ProfileBackendMsg,
    ProfileMsg,
    BatchBackendMsg,
    BatchDetokenizeMsg,
    BatchFrontendMsg,
    BaseTokenizerMsg,
    TokenizeMsg,
    UserMsg,
    UserReply,
)
from minisgl_tpu.utils import ZmqPullQueue, ZmqPushQueue, init_logger

if TYPE_CHECKING:
    from minisgl_tpu.server.args import ServerArgs

logger = init_logger(__name__, "Tokenizer")


def tokenize_worker(args: "ServerArgs", worker_id: int, ack_queue) -> None:
    from minisgl_tpu.server.launch import _watch_parent
    from minisgl_tpu.tokenizer.tokenize import TokenizeManager

    _watch_parent()

    manager = TokenizeManager(args.model_path)
    recv: ZmqPullQueue[BaseTokenizerMsg] = ZmqPullQueue(
        args.zmq_tokenizer_addr, bind=False
    )
    send: ZmqPushQueue[BatchBackendMsg] = ZmqPushQueue(
        args.zmq_backend_addr, bind=False
    )
    ack_queue.put(f"tokenizer-{worker_id}")
    try:
        while True:
            msgs = recv.drain(first_block=True)
            out = []
            for msg in msgs:
                if isinstance(msg, TokenizeMsg):
                    if msg.input_ids is not None:
                        import numpy as np

                        input_ids = np.asarray(msg.input_ids, np.int32)
                    else:
                        input_ids = manager.tokenize(msg.text)
                    out.append(
                        UserMsg(
                            uid=msg.uid,
                            input_ids=input_ids,
                            sampling_params=msg.sampling_params,
                        )
                    )
                elif isinstance(msg, AbortMsg):
                    out.append(AbortBackendMsg(uid=msg.uid))
                elif isinstance(msg, MetricsMsg):
                    out.append(MetricsBackendMsg(nonce=msg.nonce))
                elif isinstance(msg, ProfileMsg):
                    out.append(
                        ProfileBackendMsg(action=msg.action, log_dir=msg.log_dir)
                    )
                else:
                    raise NotImplementedError(f"unknown message {type(msg)}")
            if out:
                send.put(BatchBackendMsg(data=out))
    except KeyboardInterrupt:
        pass


def detokenize_worker(args: "ServerArgs", ack_queue) -> None:
    from minisgl_tpu.server.launch import _watch_parent
    from minisgl_tpu.tokenizer.detokenize import DetokenizeManager
    from minisgl_tpu.utils import cached_load_tokenizer

    _watch_parent()

    tokenizer = cached_load_tokenizer(args.model_path)
    manager = DetokenizeManager(tokenizer)
    recv: ZmqPullQueue[BatchDetokenizeMsg] = ZmqPullQueue(
        args.zmq_detokenizer_addr, bind=True
    )
    send: ZmqPushQueue[BatchFrontendMsg] = ZmqPushQueue(
        args.zmq_frontend_addr, bind=False
    )
    ack_queue.put("detokenizer")
    try:
        while True:
            batches = recv.drain(first_block=True)
            replies = []
            for batch in batches:
                for msg in batch.data:
                    if isinstance(msg, MetricsSnapshot):
                        replies.append(msg)  # passthrough to the frontend
                        continue
                    if msg.aborted:
                        manager.abort(msg.uid)
                        continue
                    text = manager.detokenize(
                        msg.uid, msg.next_token, msg.finished
                    )
                    lp = None
                    if msg.logprob is not None:
                        # OpenAI logprobs entry for this token; alternative
                        # token ids render standalone (decode of one id)
                        lp = {
                            "token": tokenizer.decode([msg.next_token]),
                            "logprob": msg.logprob,
                            "top_logprobs": [
                                {
                                    "token": tokenizer.decode([t]),
                                    "logprob": v,
                                }
                                for t, v in zip(
                                    msg.top_ids or [],
                                    msg.top_logprobs or [],
                                )
                            ],
                        }
                    replies.append(
                        UserReply(
                            uid=msg.uid,
                            incremental_output=text,
                            finished=msg.finished,
                            prompt_tokens=msg.prompt_tokens,
                            completion_tokens=msg.completion_tokens,
                            logprobs=lp,
                        )
                    )
            if replies:
                send.put(BatchFrontendMsg(data=replies))
    except KeyboardInterrupt:
        pass
