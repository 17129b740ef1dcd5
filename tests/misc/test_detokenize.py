"""Incremental streaming detokenization (counterpart of the reference's
DecodeStatus logic, /root/reference/python/minisgl/tokenizer/detokenize.py:
54-111): emitted chunks must concatenate to the full decode, and multi-byte
UTF-8 sequences split across byte-level tokens must never stream as U+FFFD."""

import pytest

from minisgl_tpu.tokenizer.detokenize import DetokenizeManager
from tests.make_fixture import make_fixture


@pytest.fixture(scope="module")
def tokenizer(tmp_path_factory):
    from transformers import AutoTokenizer

    d = make_fixture(str(tmp_path_factory.mktemp("tok")))
    return AutoTokenizer.from_pretrained(d)


def _stream(tokenizer, text, uid=0):
    ids = tokenizer.encode(text)
    mgr = DetokenizeManager(tokenizer)
    chunks = [
        mgr.detokenize(uid, t, finished=(i == len(ids) - 1))
        for i, t in enumerate(ids)
    ]
    return chunks


def test_ascii_stream_concatenates(tokenizer):
    text = "hello world, this is a test"
    chunks = _stream(tokenizer, text)
    assert "".join(chunks) == text


def test_multibyte_utf8_held_back(tokenizer):
    text = "héllo ∂ß — 漢字"
    chunks = _stream(tokenizer, text)
    assert "".join(chunks) == text
    # no partial replacement chars ever streamed
    assert all("�" not in c for c in chunks)


def test_long_stream_with_window_slide(tokenizer):
    text = "abcdefghij " * 30  # long enough to trigger the window slide
    chunks = _stream(tokenizer, text)
    assert "".join(chunks) == text


def test_independent_uids(tokenizer):
    mgr = DetokenizeManager(tokenizer)
    a = tokenizer.encode("aaaa")
    b = tokenizer.encode("bbbb")
    out_a = out_b = ""
    for i in range(4):
        out_a += mgr.detokenize(1, a[i], finished=i == 3)
        out_b += mgr.detokenize(2, b[i], finished=i == 3)
    assert out_a == "aaaa" and out_b == "bbbb"


def test_emoji_split_multibyte(tokenizer):
    # a 4-byte emoji split across byte-level tokens renders as SEVERAL
    # replacement chars mid-stream; none may be emitted early
    text = "ok 🎉🎊 done"
    chunks = _stream(tokenizer, text)
    assert "".join(chunks) == text
    assert all("�" not in c for c in chunks)


def test_find_safe_len_strips_all_trailing_fffd():
    from minisgl_tpu.tokenizer.detokenize import find_safe_len

    assert find_safe_len("ab��") == 2
    assert find_safe_len("ab�") == 2
    assert find_safe_len("���") == 0
    assert find_safe_len("abc") == 3


def test_abort_clears_state(tokenizer):
    mgr = DetokenizeManager(tokenizer)
    mgr.detokenize(5, tokenizer.encode("x")[0], finished=False)
    mgr.abort(5)
    assert 5 not in mgr.states
