"""Block-max WAND: disjunctive (OR) BM25 top-k with block-level skipping.

The conjunctive path (``query.SegmentSearcher.search_bm25``) is the
reference-compat default; this module adds the north-star's block-max
WAND evaluator over the same segment files. Per-term *cursors* decode one
block at a time using the per-block byte offsets stored at build time
(``bm_ids_boff``/``bm_tfs_boff``) — delta streams restart implicitly at
block boundaries because the previous block's ``bm_last`` is the base —
and per-block score upper bounds come from the stored (max_tf, min_dl):

    ub(block) = idf * (k1+1) * max_tf / (max_tf + k1*(1-b+b*min_dl/avgdl))

Algorithm: WAND pivoting (Broder et al., CIKM'03) with the block-max
refinement (Ding & Suel, SIGIR'11): sort cursors by current doc,
accumulate *global* term upper bounds to find the pivot, then re-check
with the tighter *block* bounds at the pivot; on failure skip shallowly
to the earliest block boundary instead of scoring.
"""

from __future__ import annotations

import numpy as np

from typesense_ray.codec import varbyte_decode
from typesense_ray.scoring import bm25_term_scores

INF = np.iinfo(np.int64).max


class TermCursor:
    def __init__(
        self,
        raw: dict,
        idf: float,
        k1: float,
        b: float,
        avgdl: float,
        doclen: np.ndarray,
        block_size: int,
        term: str = "",
    ):
        self.term = term
        self.ids_vb = raw["ids_vb"]
        self.tfs_vb = raw["tfs_vb"]
        self.df = int(raw["df"])
        self.bm_last = np.asarray(raw["bm_last"], dtype=np.int64)
        self.ids_boff = np.asarray(raw["bm_ids_boff"], dtype=np.int64)
        self.tfs_boff = np.asarray(raw["bm_tfs_boff"], dtype=np.int64)
        self.n_blocks = len(self.bm_last)
        self.block_size = block_size
        self.idf = idf
        self.k1, self.b, self.avgdl = k1, b, avgdl
        self.doclen = doclen
        max_tf = np.asarray(raw["bm_max_tf"], dtype=np.float64)
        min_dl = np.asarray(raw["bm_min_dl"], dtype=np.float64)
        self.block_ub = (
            idf * (max_tf * (k1 + 1.0))
            / (max_tf + k1 * (1.0 - b + b * min_dl / avgdl))
        )
        self.global_ub = float(self.block_ub.max()) if self.n_blocks else 0.0
        self._blk = -1
        self._ids: np.ndarray | None = None
        self._tfs: np.ndarray | None = None
        self._i = 0
        self.doc = -1
        self._load_block(0)
        self._set_current()

    # -- block machinery ---------------------------------------------------

    def _block_len(self, j: int) -> int:
        return min(self.block_size, self.df - j * self.block_size)

    def _load_block(self, j: int):
        if j >= self.n_blocks:
            self._blk = self.n_blocks
            self._ids = None
            return
        n = self._block_len(j)
        lo = self.ids_boff[j]
        hi = self.ids_boff[j + 1] if j + 1 < self.n_blocks else len(self.ids_vb)
        deltas = varbyte_decode(self.ids_vb[lo:hi], n)
        base = np.uint64(self.bm_last[j - 1]) if j > 0 else np.uint64(0)
        self._ids = (np.cumsum(deltas, dtype=np.uint64) + base).astype(np.int64)
        lo = self.tfs_boff[j]
        hi = self.tfs_boff[j + 1] if j + 1 < self.n_blocks else len(self.tfs_vb)
        self._tfs = varbyte_decode(self.tfs_vb[lo:hi], n).astype(np.int64)
        self._blk = j
        self._i = 0

    def _set_current(self):
        if self._ids is None or self._blk >= self.n_blocks:
            self.doc = INF
        else:
            self.doc = int(self._ids[self._i])

    def exhausted(self) -> bool:
        return self.doc == INF

    def score(self) -> float:
        tf = float(self._tfs[self._i])
        dl = float(self.doclen[self.doc])
        return float(
            bm25_term_scores(tf, dl, self.idf, self.avgdl, self.k1, self.b)
        )

    def next(self):
        self._i += 1
        if self._i >= len(self._ids):
            self._load_block(self._blk + 1)
        self._set_current()

    def seek(self, target: int):
        """Advance to the first doc ≥ target (block skip + binary search)."""
        if self.doc >= target:
            return
        j = int(np.searchsorted(self.bm_last, target))
        if j >= self.n_blocks:
            self._blk = self.n_blocks
            self._ids = None
            self._set_current()
            return
        if j != self._blk:
            self._load_block(j)
        self._i = int(np.searchsorted(self._ids[self._i :], target)) + self._i
        if self._i >= len(self._ids):
            self._load_block(self._blk + 1)
        self._set_current()

    def current_block_ub(self) -> float:
        """Upper bound of the block that would contain ≥ current doc."""
        if self._blk >= self.n_blocks:
            return 0.0
        return float(self.block_ub[self._blk])

    def current_block_last(self) -> int:
        if self._blk >= self.n_blocks:
            return INF
        return int(self.bm_last[self._blk])


def wand_topk(cursors: list[TermCursor], k: int) -> tuple[np.ndarray, np.ndarray]:
    """Block-max WAND over one segment; returns (local_ids, scores) sorted
    by (score desc, id desc)."""
    import heapq

    # min-heap of (score, doc): evicts lowest score, then lowest doc — the
    # (score desc, doc_id desc) tie-break of the conjunctive path.
    heap: list[tuple[float, int]] = []
    theta = -1.0  # strict lower bound; ≥-comparisons keep θ-ties exact

    cursors = [c for c in cursors if not c.exhausted()]
    while cursors:
        cursors.sort(key=lambda c: c.doc)
        # find pivot: smallest prefix whose global-UB sum reaches theta
        ub = 0.0
        pivot_idx = -1
        for i, c in enumerate(cursors):
            ub += c.global_ub
            if ub >= theta:
                pivot_idx = i
                break
        if pivot_idx < 0:
            break  # no remaining doc can enter the heap
        pivot_doc = cursors[pivot_idx].doc
        if pivot_doc == INF:
            break
        # extend the prefix over every list already positioned at the pivot
        # doc — they all contribute to its score and to the block bound
        while (
            pivot_idx + 1 < len(cursors)
            and cursors[pivot_idx + 1].doc == pivot_doc
        ):
            pivot_idx += 1

        # block-max refinement: tighter per-block bounds at the pivot
        block_ub = sum(c.current_block_ub() for c in cursors[: pivot_idx + 1])
        if block_ub < theta:
            # shallow skip (Ding & Suel): no doc up to d can win, where d is
            # the earliest prefix block boundary, capped by the next list's
            # current doc
            boundary = min(
                c.current_block_last() for c in cursors[: pivot_idx + 1]
            )
            next_doc = (
                cursors[pivot_idx + 1].doc
                if pivot_idx + 1 < len(cursors)
                else INF - 1
            )
            d = min(boundary, next_doc - 1)
            adv = cursors[0]
            adv.seek(max(d + 1, adv.doc + 1))
            cursors = [c for c in cursors if not c.exhausted()]
            continue

        if cursors[0].doc == pivot_doc:
            # all prefix cursors aligned on pivot → score it fully; sum in
            # sorted-term order so scores are bitwise identical to the
            # dense/conjunctive evaluators (SURVEY §7.0 determinism)
            score = 0.0
            for c in sorted(
                (c for c in cursors if c.doc == pivot_doc),
                key=lambda c: c.term,
            ):
                score += c.score()
            item = (score, pivot_doc)
            if len(heap) < k:
                heapq.heappush(heap, item)
                if len(heap) == k:
                    theta = heap[0][0]
            elif item > heap[0]:
                heapq.heapreplace(heap, item)
                theta = heap[0][0]
            for c in cursors:
                if c.doc == pivot_doc and not c.exhausted():
                    c.next()
        else:
            # advance the first unaligned cursor up to the pivot
            cursors[0].seek(pivot_doc)
        cursors = [c for c in cursors if not c.exhausted()]

    out = sorted(heap, key=lambda t: (t[0], t[1]), reverse=True)
    ids = np.array([d for _, d in out], dtype=np.int64)
    scores = np.array([s for s, _ in out], dtype=np.float64)
    return ids, scores
