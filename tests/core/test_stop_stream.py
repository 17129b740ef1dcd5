"""Unit test for the stop-string stream filter: hold-back window catches
matches straddling chunk boundaries; nothing past the match is emitted."""

import asyncio

import pytest

from minisgl_tpu.message import UserReply
from minisgl_tpu.server.api_server import FrontendManager


class _FakeSendQueue:
    def __init__(self):
        self.sent = []

    async def put(self, msg):
        self.sent.append(msg)


def _manager_with_tokens(uid, chunks, finished_last=True):
    m = FrontendManager.__new__(FrontendManager)
    m.queues = {uid: asyncio.Queue()}
    m.send_queue = _FakeSendQueue()
    for i, c in enumerate(chunks):
        m.queues[uid].put_nowait(
            UserReply(
                uid=uid,
                incremental_output=c,
                finished=finished_last and i == len(chunks) - 1,
                prompt_tokens=5 if i == len(chunks) - 1 else 0,
                completion_tokens=len(chunks) if i == len(chunks) - 1 else 0,
            )
        )
    return m


async def _drain(agen):
    out = []
    async for r in agen:
        out.append(r)
    return out


def test_match_across_chunk_boundary():
    m = _manager_with_tokens(1, ["ab", "cST", "OPxy", "zz"], finished_last=False)
    replies = asyncio.run(_drain(m.stream_replies(1, stop=["STOP"])))
    text = "".join(r.incremental_output for r in replies)
    assert text == "abc"
    assert replies[-1].finished
    # abort sent because the backend had not finished
    assert len(m.send_queue.sent) == 1


def test_no_match_emits_everything():
    m = _manager_with_tokens(2, ["hel", "lo ", "wor", "ld"])
    replies = asyncio.run(_drain(m.stream_replies(2, stop=["XYZ"])))
    text = "".join(r.incremental_output for r in replies)
    assert text == "hello world"
    assert replies[-1].finished
    assert replies[-1].prompt_tokens == 5
    assert not m.send_queue.sent


def test_match_inside_single_chunk():
    m = _manager_with_tokens(3, ["abcSTOPdef"], finished_last=True)
    replies = asyncio.run(_drain(m.stream_replies(3, stop=["STOP"])))
    assert "".join(r.incremental_output for r in replies) == "abc"
    # backend already finished: no abort needed
    assert not m.send_queue.sent


def test_earliest_of_multiple_stops_wins():
    m = _manager_with_tokens(4, ["aaBBccDD"], finished_last=True)
    replies = asyncio.run(_drain(m.stream_replies(4, stop=["DD", "BB"])))
    assert "".join(r.incremental_output for r in replies) == "aa"
