"""Scoring: BM25 (the engine's primary scorer) and a faithful port of the
reference's proximity match score (the conformance scorer).

BM25 constants are pinned by the north rule: k1=1.2, b=0.75, with the
Lucene-style non-negative idf ``ln(1 + (N - df + 0.5)/(df + 0.5))``.
Score sums iterate query terms in sorted order with float64 operands so
distributed and single-process evaluations are bitwise identical
(SURVEY.md §7.0).

The reference scorer reproduces ``Match`` from ``include/match_score.h:
106-216`` (best window of size 10 over token offsets → (words_present,
distance)) and the packed score ``(words<<16)|(255-cost)<<8|distance``
(``include/match_score.h:49-57``). Offsets are cast to uint16 to mirror
``populate_token_positions``'s vector<uint16> (``src/index.cpp:1957-2018``).
"""

from __future__ import annotations

import numpy as np

K1 = 1.2
B = 0.75
WINDOW_SIZE = 10
MAX_DISPLACEMENT = 65535


def bm25_idf(df, n_docs: int):
    """Non-negative BM25 idf (per-term, float64)."""
    df = np.asarray(df, dtype=np.float64)
    return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_term_scores(tf, dl, idf: float, avgdl: float, k1: float = K1, b: float = B):
    """Per-doc BM25 contribution of one term (vectorized, float64)."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def pack_match_score(words_present: int, total_cost: int, distance: int) -> int:
    return (words_present << 16) | ((255 - total_cost) << 8) | distance


def match_words_distance(token_offsets: list[np.ndarray]) -> tuple[int, int]:
    """Port of ``Match::Match(doc_id, token_offsets, populate_window=false)``
    (``include/match_score.h:122-216``): sliding candidate window over the
    per-token sorted offset lists; returns (words_present, distance).
    """
    tokens_size = min(len(token_offsets), WINDOW_SIZE)
    offsets = [np.asarray(o).astype(np.uint16) for o in token_offsets[:tokens_size]]
    # window entries: (token_id, offset, offset_index)
    window = [(tid, int(offsets[tid][0]), 0) for tid in range(tokens_size)]

    best_num_match = 1
    best_displacement = MAX_DISPLACEMENT

    while len(window) > 1:
        # descending by offset (ties keep stable order like std::sort's
        # strict-weak ordering on offset only — relative order of equal
        # offsets is unspecified in C++; offsets within a doc are unique
        # per token but can collide across tokens; sort by offset only)
        window.sort(key=lambda e: -e[1])
        min_offset = window[-1][1]

        this_displacement = 0
        this_num_match = 0
        for i in range(len(window)):
            if window[i][1] - min_offset <= WINDOW_SIZE:
                next_offset = window[i][1] if i == len(window) - 1 else window[i + 1][1]
                this_displacement += window[i][1] - next_offset
                this_num_match += 1

        if this_num_match > best_num_match or (
            this_num_match == best_num_match and this_displacement < best_displacement
        ):
            best_displacement = this_displacement
            best_num_match = this_num_match

        if best_num_match == tokens_size and best_displacement == len(window) - 1:
            break  # cannot improve

        tid, off, oi = window.pop()
        toks = offsets[tid]
        if off == int(toks[-1]):
            continue  # token exhausted
        window.append((tid, int(toks[oi + 1]), oi + 1))

    if best_displacement == MAX_DISPLACEMENT:
        best_displacement = 0
    distance = (100 - best_displacement) & 0xFF
    return best_num_match, distance


def reference_match_score(token_offsets: list[np.ndarray], total_cost: int = 0) -> int:
    """Packed reference text-match score for one doc (single-value field:
    one positions-list per query token, mirroring ``Index::score_results``
    ``src/index.cpp:1841-1870``)."""
    if len(token_offsets) <= 1:
        return pack_match_score(1, total_cost, 0)
    words, dist = match_words_distance(token_offsets)
    return pack_match_score(words, total_cost, dist)
