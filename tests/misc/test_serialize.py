"""Wire-serializer round trips (counterpart of
/root/reference/tests/misc/test_serialize.py:23-35: nested dataclasses +
tensor payloads through msgpack)."""

import numpy as np

from minisgl_tpu.core import SamplingParams
from minisgl_tpu.message import (
    AbortMsg,
    BatchBackendMsg,
    BatchDetokenizeMsg,
    DetokenizeMsg,
    ExitMsg,
    TokenizeMsg,
    UserMsg,
    UserReply,
)
from minisgl_tpu.message.serde import dumps, loads


def rt(msg):
    out = loads(dumps(msg))
    assert type(out) is type(msg)
    return out


def test_user_msg_roundtrip():
    msg = UserMsg(
        uid=7,
        input_ids=np.arange(33, dtype=np.int32),
        sampling_params=SamplingParams(temperature=0.7, top_k=5, max_tokens=99),
    )
    out = rt(msg)
    assert out.uid == 7
    np.testing.assert_array_equal(out.input_ids, msg.input_ids)
    assert out.sampling_params == msg.sampling_params


def test_batch_nested_roundtrip():
    batch = BatchBackendMsg(
        data=[
            UserMsg(
                uid=1,
                input_ids=np.asarray([1, 2, 3], np.int32),
                sampling_params=SamplingParams(),
            ),
            ExitMsg(),
        ]
    )
    out = rt(batch)
    assert len(out.data) == 2
    assert isinstance(out.data[0], UserMsg)
    assert isinstance(out.data[1], ExitMsg)


def test_tokenizer_family():
    msg = TokenizeMsg(
        uid=3,
        text=[{"role": "user", "content": "hi"}],
        sampling_params=SamplingParams(),
        input_ids=[5, 6, 7],
    )
    out = rt(msg)
    assert out.text == msg.text and out.input_ids == [5, 6, 7]
    rt(AbortMsg(uid=3))


def test_frontend_family():
    out = rt(
        BatchDetokenizeMsg(
            data=[DetokenizeMsg(uid=1, next_token=42, finished=False)]
        )
    )
    assert out.data[0].next_token == 42
    reply = rt(UserReply(uid=1, incremental_output="héllo — ∂", finished=True))
    assert reply.incremental_output == "héllo — ∂"
