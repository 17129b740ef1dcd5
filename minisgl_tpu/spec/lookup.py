"""Prompt-lookup speculative decoding: host-side draft proposal.

No reference counterpart (/root/reference has no speculative decoding); this
is a beyond-parity feature. The algorithm is prompt-lookup decoding (PLD,
a.k.a. n-gram speculation): the draft "model" is the request's own token
history. If the current suffix n-gram occurred earlier in the sequence, the
tokens that followed that earlier occurrence are proposed as drafts and
verified in ONE extend-phase forward (engine/step.py verify phase) — on a
memory-bound TPU decode, verifying k+1 tokens costs roughly one decode step
(weights are read once), so every accepted draft is a nearly-free token.
Wins are workload-dependent: summarization, code editing, and RAG-style
prompts (output quotes the input) accept heavily; random text accepts ~0.

Host cost: one vectorized numpy scan over the request's history per proposal
(~µs at 32k tokens), no drafting forward pass, no extra weights.
"""

from __future__ import annotations

import numpy as np

_EMPTY = np.empty(0, dtype=np.int32)


def propose_lookup_drafts(
    ids: np.ndarray,
    max_drafts: int,
    ngram_max: int = 4,
    ngram_min: int = 2,
) -> np.ndarray:
    """Propose up to ``max_drafts`` continuation tokens for ``ids``.

    Tries suffix n-grams from ``ngram_max`` down to ``ngram_min``; on the
    first n that matches earlier in ``ids``, returns the tokens following
    the MOST RECENT earlier occurrence (recency beats primacy for repetitive
    structures like code edits). Returns an empty array when nothing matches.
    """
    n = len(ids)
    if max_drafts <= 0 or n < ngram_min + 1:
        return _EMPTY
    ids = np.asarray(ids, dtype=np.int32)
    # candidate match windows live in ids[:n-1]: a window ending at the last
    # token is the suffix itself (trivial self-match, no continuation)
    hay = ids[: n - 1]
    for k in range(min(ngram_max, n - 1), ngram_min - 1, -1):
        if len(hay) < k:
            continue
        suffix = ids[n - k :]
        win = np.lib.stride_tricks.sliding_window_view(hay, k)
        idx = np.nonzero((win == suffix).all(axis=1))[0]
        if idx.size:
            start = int(idx[-1]) + k
            out = ids[start : start + max_drafts]
            if out.size:
                return out.astype(np.int32, copy=True)
    return _EMPTY
