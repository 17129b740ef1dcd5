"""Incremental streaming detokenization.

Role parity with /root/reference/python/minisgl/tokenizer/detokenize.py:54-111
(DecodeStatus / DetokenizeManager): emit only text that is safe to stream —
hold back characters that could still change when more tokens arrive
(incomplete UTF-8 / combining sequences the tokenizer renders as U+FFFD, and
a trailing window that multi-token graphemes may rewrite).

Implementation is the standard two-offset scheme: ``prefix_offset`` marks the
start of a context window re-decoded every step (so BPE merges across token
boundaries render correctly), ``read_offset`` marks text already emitted.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List

_CONTEXT_TOKENS = 5


def find_safe_len(text: str) -> int:
    """Length of the prefix that cannot change with more input: stop before a
    trailing replacement char (incomplete UTF-8 from a split multi-byte
    token)."""
    n = len(text)
    # an incomplete multi-byte sequence can render as SEVERAL replacement
    # chars (e.g. a 4-byte emoji split after 2 bytes) — hold back all of them
    while n > 0 and text[n - 1] == "�":
        n -= 1
    return n


@dataclass
class DecodeStatus:
    token_ids: List[int] = field(default_factory=list)
    prefix_offset: int = 0  # token index where the decode window starts
    read_offset: int = 0  # chars of the window already emitted
    emitted: str = ""


class DetokenizeManager:
    def __init__(self, tokenizer):
        self.tokenizer = tokenizer
        self.states: Dict[int, DecodeStatus] = {}

    def detokenize(self, uid: int, token: int, finished: bool) -> str:
        st = self.states.setdefault(uid, DecodeStatus())
        st.token_ids.append(token)

        window = st.token_ids[st.prefix_offset :]
        text = self.tokenizer.decode(window, skip_special_tokens=True)

        if finished:
            out = text[st.read_offset :]
            self.states.pop(uid, None)
            st.emitted += out
            return out

        safe = find_safe_len(text)
        out = text[st.read_offset : safe]
        st.read_offset = safe
        st.emitted += out

        # slide the window: keep a small token context so cross-token BPE
        # renders identically, then re-anchor offsets
        if len(window) > 2 * _CONTEXT_TOKENS and safe == len(text):
            new_prefix = len(st.token_ids) - _CONTEXT_TOKENS
            kept = self.tokenizer.decode(
                st.token_ids[new_prefix:], skip_special_tokens=True
            )
            if text.endswith(kept):
                st.prefix_offset = new_prefix
                st.read_offset = len(kept)
        return out

    def abort(self, uid: int) -> None:
        self.states.pop(uid, None)
