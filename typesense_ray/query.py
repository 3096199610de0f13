"""Query path: per-segment top-k → tiny global merge.

Ray-Data-first rendition of the reference search fan-out
(``src/collection.cpp:771-863``: all shard threads search concurrently,
main thread barriers and merges topsters). Here the "shards" are durable
Parquet segments; execution modes:

- :class:`LocalIndexSearcher` — all segments in one process (tests,
  conformance, and the per-query latency path on one node).
- :func:`search_index` — one-shot Dataset fan-out: one row per segment →
  stateless task-pool ``map_batches`` (plain tasks dispatch with no
  actor cold-start; ``src/index.cpp:1197-1230``'s shard-thread role) →
  small per-segment top-k tables → driver merge
  ``sort(score desc, doc_id desc).limit(k)``.
- :class:`IndexServer` — persistent actor pool with preloaded postings
  for repeated-query serving (the always-in-RAM model).

Scoring within a segment is fully vectorized: local doc ids are dense
ordinals, so conjunctive evaluation is sorted-array intersection
(``ArrayUtils::and_scalar``, ``src/array_utils.cpp:4-37``, re-expressed as
``np.intersect1d``) and disjunctive evaluation is a dense score
accumulator (``scores[ids] += term_scores``) with block-max pruning
available from the stored per-block (max_tf, min_dl) metadata.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from typesense_ray.codec import decode_posting_ids, decode_positions, varbyte_decode
from typesense_ray.index_build import DOCS_FILE, POSTINGS_FILE
from typesense_ray.scoring import (
    bm25_idf,
    bm25_term_scores,
    reference_match_score,
)


class SegmentSearcher:
    """Holds one segment's docs sidecar; reads postings on demand
    (or preloaded into an in-memory term dict with ``preload=True``)."""

    def __init__(self, seg_dir: str, preload: bool = False):
        self.seg_dir = seg_dir
        docs = pq.read_table(os.path.join(seg_dir, DOCS_FILE))
        self.docs = docs
        self.doc_ids = docs["doc_id"].to_numpy()
        self.doclen = docs["doclen"].to_numpy().astype(np.int64)
        self.n_docs = docs.num_rows
        self._postings_path = os.path.join(seg_dir, POSTINGS_FILE)
        # preload keeps the postings as ONE Arrow table + a term→row hash:
        # the encoded buffers stay contiguous Arrow memory (no per-term
        # Python bytes objects — a dict-of-dicts costs several× the Arrow
        # footprint at large vocab and a long warmup); rows decode per
        # query, a handful of terms at a time
        self._tbl: pa.Table | None = None
        self._row_of: dict[str, int] | None = None
        # decoded-postings cache: segments are IMMUTABLE (content-addressed
        # dirs; merges/upserts write new segments), so decoded (ids, tfs)
        # arrays never go stale within a searcher. Byte-budgeted FIFO —
        # repeated query terms skip the varbyte decode entirely.
        self._dec_cache: dict[str, dict | None] = {}
        self._dec_cache_bytes = 0
        self._dec_cache_budget = 8 << 20
        if preload:
            t = pq.read_table(self._postings_path).combine_chunks()
            self._tbl = t
            self._row_of = {
                term: i for i, term in enumerate(t["term"].to_pylist())
            }
            self._val_names = [c for c in t.column_names if c != "term"]

    def postings(self, terms: list[str]) -> dict[str, dict]:
        """term → raw posting row (encoded); absent terms omitted."""
        if self._row_of is not None:
            out = {}
            for term in terms:
                i = self._row_of.get(term)
                if i is not None:
                    out[term] = {
                        c: self._tbl[c][i].as_py() for c in self._val_names
                    }
            return out
        tbl = pq.read_table(
            self._postings_path, filters=[("term", "in", list(terms))]
        )
        out = {}
        for i in range(tbl.num_rows):
            out[tbl["term"][i].as_py()] = {
                c: tbl[c][i].as_py() for c in tbl.column_names if c != "term"
            }
        return out

    # -- core evaluation ---------------------------------------------------

    def candidates(
        self,
        include_terms: list[str],
        exclude_terms: list[str] = (),
        filter_mask: np.ndarray | None = None,
        with_postings: bool = False,
    ):
        """Conjunctive candidate set as *local* ids (+ decoded postings).

        Mirrors the reference AND-intersection of posting lists with
        exclusion difference (``src/index.cpp:826-952``).
        """
        if include_terms == ["*"]:
            cand = np.arange(self.n_docs, dtype=np.int64)
            post = {}
        else:
            want = set(include_terms)
            decoded = {}
            misses = []
            for t in want:
                hit = self._dec_cache.get(t, False)
                if hit is False:
                    misses.append(t)
                elif hit is not None:  # None = known-absent
                    decoded[t] = hit
            if misses:
                fresh = self.postings(misses)
                for t in misses:
                    p = fresh.get(t)
                    if p is None:
                        self._dec_cache[t] = None
                        continue
                    ids = decode_posting_ids(
                        p["ids_vb"], p["df"]
                    ).astype(np.int64)
                    tfs = varbyte_decode(p["tfs_vb"], p["df"]).astype(
                        np.int64
                    )
                    entry = {"ids": ids, "tfs": tfs, "raw": p}
                    decoded[t] = entry
                    self._dec_cache[t] = entry
                    self._dec_cache_bytes += ids.nbytes + tfs.nbytes
                while (self._dec_cache_bytes > self._dec_cache_budget
                       and self._dec_cache):
                    old = self._dec_cache.pop(next(iter(self._dec_cache)))
                    if old is not None:
                        self._dec_cache_bytes -= (
                            old["ids"].nbytes + old["tfs"].nbytes
                        )
            if len(decoded) < len(want):
                return np.empty(0, np.int64), {}
            post = decoded
            # intersect smallest-df first
            order = sorted(post, key=lambda t: post[t]["ids"].size)
            cand = post[order[0]]["ids"]
            for t in order[1:]:
                cand = np.intersect1d(cand, post[t]["ids"], assume_unique=True)
                if cand.size == 0:
                    break
        if cand.size and exclude_terms:
            ex = self.postings(list(exclude_terms))
            for t, p in ex.items():
                ex_ids = decode_posting_ids(p["ids_vb"], p["df"]).astype(np.int64)
                cand = np.setdiff1d(cand, ex_ids, assume_unique=True)
                if cand.size == 0:
                    break
        if cand.size and filter_mask is not None:
            cand = cand[filter_mask[cand]]
        return cand, (post if with_postings or include_terms != ["*"] else {})

    def term_positions_for(
        self, post: dict, cand: np.ndarray
    ) -> dict[str, list[np.ndarray]]:
        """Per term: positions array for each candidate doc (decoded lazily
        only for candidates — used by the reference scorer / highlighter)."""
        out = {}
        for t, p in post.items():
            tfs = p["tfs"]
            allpos = decode_positions(p["raw"]["pos_vb"], tfs)
            starts = np.zeros(len(tfs), dtype=np.int64)
            np.cumsum(tfs[:-1], out=starts[1:])
            idx = np.searchsorted(p["ids"], cand)
            out[t] = [
                allpos[starts[i] : starts[i] + tfs[i]].astype(np.int64) for i in idx
            ]
        return out

    def phrase_candidates(
        self, phrase_terms: list[str], filter_mask: np.ndarray | None = None
    ) -> np.ndarray:
        """Global doc_ids whose text contains ``phrase_terms`` at strictly
        consecutive slot positions (positions are separator-slot indices, so
        a punctuation-only or empty slot between two words breaks adjacency
        — exactly the normalized-string containment semantics).

        Beyond the reference: it stores positions (``src/index.cpp:526-545``)
        but only consumes them for proximity scoring; phrase matching is the
        natural positional-index extension. Evaluation: conjunctive candidate
        intersection first, then per-candidate shifted position intersection
        (P ∩ (pos(t_i) - i) for each i) — cost is bounded by the rarest
        term's df, not the corpus.
        """
        cand, post = self.candidates(list(phrase_terms), (), filter_mask, True)
        if cand.size == 0:
            return np.empty(0, np.uint64)
        if len(phrase_terms) == 1:
            return self.doc_ids[cand]

        # Vectorized across ALL candidates at once (no per-candidate
        # Python loop): per term, gather its candidate position slices
        # into one flat array of (candidate, shifted-position) keys
        # packed into int64 — candidate ordinal in the high bits,
        # ``pos - term_offset`` in the low 42 (positions are
        # (element << 16) | uint16-slot, so 42 bits hold ~67M array
        # elements per doc) — then the phrase test is a progressive
        # sorted-key intersection: a key surviving every term's set is a
        # phrase start. Cost stays bounded by the rarest term's df.
        shift = np.int64(42)
        k_terms = len(phrase_terms)
        surv: np.ndarray | None = None
        for i, t in enumerate(phrase_terms):
            p = post[t]
            tfs = p["tfs"]
            allpos = decode_positions(p["raw"]["pos_vb"], tfs)
            starts = np.zeros(len(tfs), dtype=np.int64)
            np.cumsum(tfs[:-1], out=starts[1:])
            idx = np.searchsorted(p["ids"], cand)
            lens = tfs[idx].astype(np.int64)
            offs = starts[idx]
            tot = int(lens.sum())
            grp_off = np.repeat(
                np.concatenate(([0], np.cumsum(lens)[:-1])), lens
            )
            within = np.arange(tot, dtype=np.int64) - grp_off
            flat_pos = allpos[np.repeat(offs, lens) + within].astype(
                np.int64
            )
            cidx = np.repeat(np.arange(cand.size, dtype=np.int64), lens)
            # +k_terms keeps the low field positive for every term offset
            keys = (cidx << shift) | (flat_pos - i + k_terms)
            # duplicates possible (uint16 position wrap) — intersect1d
            # dedups both sides
            surv = keys if surv is None else np.intersect1d(surv, keys)
            if surv.size == 0:
                return np.empty(0, np.uint64)
        keep_idx = np.unique(surv >> shift)
        return self.doc_ids[cand[keep_idx]]

    def search_bm25(
        self,
        include_terms: list[str],
        exclude_terms: list[str],
        k: int,
        global_df: dict[str, int],
        n_docs_total: int,
        avgdl: float,
        k1: float,
        b: float,
        filter_mask: np.ndarray | None = None,
    ):
        """Segment-local BM25 top-k (conjunctive). Returns (doc_ids, scores)
        sorted by (score desc, doc_id desc) — the tie-break the reference
        applies via ``Topster::is_greater`` (``include/topster.h:254-257``)."""
        cand, post = self.candidates(include_terms, exclude_terms, filter_mask, True)
        if cand.size == 0:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        scores = np.zeros(cand.size, dtype=np.float64)
        if include_terms != ["*"]:
            dl = self.doclen[cand]
            # fixed term order (sorted) + float64 ⇒ deterministic sums
            for t in sorted(set(include_terms)):
                p = post[t]
                idx = np.searchsorted(p["ids"], cand)
                tf = p["tfs"][idx]
                idf = float(bm25_idf(global_df[t], n_docs_total))
                scores += bm25_term_scores(tf, dl, idf, avgdl, k1, b)
        return self._topk(cand, scores, k)

    def search_bm25_disjunctive(
        self,
        include_terms: list[str],
        exclude_terms: list[str],
        k: int,
        global_df: dict[str, int],
        n_docs_total: int,
        avgdl: float,
        k1: float,
        b: float,
        filter_mask: np.ndarray | None = None,
        method: str = "auto",
        block_size: int | None = None,
    ):
        """Segment-local disjunctive (OR) BM25 top-k.

        ``method="dense"``: score-all accumulator — local ids are dense
        ordinals, so ``scores[ids] += term_scores`` per term is a
        branch-free vectorized pass (the fast path for segment-sized doc
        counts). ``method="wand"``: block-max WAND (``wand.py``) — decodes
        only the blocks that can beat the running threshold; the scale
        path for very long postings. ``"auto"`` uses WAND for unfiltered
        queries over large segments. Exclusions/filters force dense (the
        mask must suppress docs before they enter the heap)."""
        terms = sorted(set(t for t in include_terms if t != "*"))
        if not terms:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        post = self.postings(terms)
        if not post:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        if method == "auto":
            method = (
                "wand"
                if filter_mask is None and not exclude_terms
                and self.n_docs > 65536
                else "dense"
            )
        if method == "wand" and any(
            "bm_ids_boff" not in p for p in post.values()
        ):
            method = "dense"  # pre-v2 segment without block byte offsets
        if method == "wand" and filter_mask is None and not exclude_terms:
            from typesense_ray.codec import BLOCK_SIZE
            from typesense_ray.wand import TermCursor, wand_topk

            from typesense_ray.scoring import bm25_idf as _idf

            if block_size is None:
                block_size = BLOCK_SIZE
            cursors = [
                TermCursor(
                    post[t],
                    float(_idf(global_df[t], n_docs_total)),
                    k1, b, avgdl, self.doclen, block_size, term=t,
                )
                for t in terms
                if t in post
            ]
            lids, scores = wand_topk(cursors, k)
            return self.doc_ids[lids], scores

        scores = np.zeros(self.n_docs, dtype=np.float64)
        present = np.zeros(self.n_docs, dtype=bool)
        for t in terms:
            if t not in post:
                continue
            p = post[t]
            ids = decode_posting_ids(p["ids_vb"], p["df"]).astype(np.int64)
            tfs = varbyte_decode(p["tfs_vb"], p["df"]).astype(np.int64)
            idf = float(bm25_idf(global_df[t], n_docs_total))
            scores[ids] += bm25_term_scores(
                tfs, self.doclen[ids], idf, avgdl, k1, b
            )
            present[ids] = True
        if exclude_terms:
            ex = self.postings(list(exclude_terms))
            for t, p in ex.items():
                ex_ids = decode_posting_ids(p["ids_vb"], p["df"]).astype(np.int64)
                present[ex_ids] = False
        if filter_mask is not None:
            present &= filter_mask
        cand = np.flatnonzero(present)
        if cand.size == 0:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        return self._topk(cand, scores[cand], k)

    def search_reference(
        self,
        include_terms: list[str],
        exclude_terms: list[str],
        k: int,
        static_order: np.ndarray | None,
        filter_mask: np.ndarray | None = None,
        total_cost: int = 0,
    ):
        """Segment-local top-k under reference semantics: packed proximity
        match score, then static sort field desc, then doc_id desc.
        Returns (doc_ids, s0, s1)."""
        cand, post = self.candidates(include_terms, exclude_terms, filter_mask, True)
        if cand.size == 0:
            e = np.empty(0, np.int64)
            return np.empty(0, np.uint64), e, e
        if include_terms == ["*"] or len(include_terms) <= 1:
            s0 = np.full(
                cand.size,
                reference_match_score([None], total_cost)
                if include_terms != ["*"]
                else 0,
                dtype=np.int64,
            )
        else:
            perterm = self.term_positions_for(post, cand)
            ordered = [perterm[t] for t in include_terms]
            s0 = np.fromiter(
                (
                    reference_match_score([tp[i] for tp in ordered], total_cost)
                    for i in range(cand.size)
                ),
                dtype=np.int64,
                count=cand.size,
            )
        s1 = (
            static_order[cand].astype(np.int64)
            if static_order is not None
            else np.zeros(cand.size, np.int64)
        )
        gids = self.doc_ids[cand]
        order = np.lexsort((gids, s1, s0))[::-1][:k]
        return gids[order], s0[order], s1[order]

    def search_tfidf(
        self,
        terms: list[str],
        global_df: dict[str, int],
        n_docs_total: int,
        k: int,
        exclude_gid: int | None = None,
    ):
        """Segment-local disjunctive tf·idf top-k: score = Σ_t tf·ln(N/df)
        over ``terms`` — the scoring body of more-like-this. Dense
        scatter-add per term in sorted order (deterministic float sums),
        (score desc, doc_id desc) tie-break via ``_topk``."""
        post = self.postings(sorted(set(terms)))
        if not post:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        scores = np.zeros(self.n_docs, dtype=np.float64)
        present = np.zeros(self.n_docs, dtype=bool)
        for t in sorted(post):
            p = post[t]
            ids = decode_posting_ids(p["ids_vb"], p["df"]).astype(np.int64)
            tfs = varbyte_decode(p["tfs_vb"], p["df"]).astype(np.float64)
            scores[ids] += tfs * np.log(n_docs_total / global_df[t])
            present[ids] = True
        if exclude_gid is not None:
            present[self.doc_ids == np.uint64(exclude_gid)] = False
        cand = np.flatnonzero(present)
        if cand.size == 0:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        return self._topk(cand, scores[cand], k)

    def _topk(self, cand: np.ndarray, scores: np.ndarray, k: int):
        gids = self.doc_ids[cand]
        if cand.size > k * 8 and k < cand.size:
            # argpartition on scores alone would retain an arbitrary subset
            # of boundary-score ties; widen the selection to every doc at or
            # above the k-th score so the final lexsort can apply the
            # documented (score desc, doc_id desc) tie-break exactly.
            part = np.argpartition(scores, cand.size - k)[cand.size - k :]
            sel = np.flatnonzero(scores >= scores[part].min())
            gids, scores = gids[sel], scores[sel]
        order = np.lexsort((gids, scores))[::-1][:k]
        return gids[order], scores[order]


def load_stats(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "manifest.json")) as f:
        return json.load(f)


def load_global_df(index_dir: str, terms: list[str] | None = None) -> dict[str, int]:
    d = pads.dataset(os.path.join(index_dir, "global", "df"))
    if terms is not None:
        tbl = d.to_table(filter=pads.field("term").isin(list(terms)))
    else:
        tbl = d.to_table()
    return dict(zip(tbl["term"].to_pylist(), tbl["df"].to_pylist()))


def segment_dirs(index_dir: str) -> list[str]:
    stats = load_stats(index_dir)
    return [
        os.path.join(index_dir, "segments", f"seg-{sid}") for sid in stats["segments"]
    ]


def merge_topk(parts: list[tuple], k: int):
    """Merge per-segment (doc_ids, *score_cols) into global top-k with the
    (scores..., doc_id) desc tie-break."""
    if not parts:
        return None
    ids = np.concatenate([p[0] for p in parts])
    score_cols = [
        np.concatenate([p[j] for p in parts]) for j in range(1, len(parts[0]))
    ]
    order = np.lexsort((ids, *reversed(score_cols)))[::-1][:k]
    return (ids[order], *[c[order] for c in score_cols])


def fused_bm25(
    segments,
    include: list[str],
    exclude: list[str],
    k: int,
    dfs: dict[str, int],
    n_docs_total: int,
    avgdl: float,
    k1: float,
    b: float,
    filter_masks=None,
):
    """Conjunctive BM25 over MANY segments in one scoring pass: gather
    every segment's (candidate ids, tf, dl) first, then score and select
    the global top-k once. Bitwise-equal to per-segment ``search_bm25`` +
    ``merge_topk`` (same per-doc float64 op sequence, same (score,
    doc_id) desc tie-break), but pays numpy call overhead per QUERY
    instead of per (query, segment) — at 224 small segments the per-call
    overhead was ~2× the useful arithmetic (idf alone was recomputed
    224× per term). Returns (doc_ids, scores)."""
    from typesense_ray.scoring import bm25_idf, bm25_term_scores

    # match-all carries no scored terms (search_bm25 leaves scores at 0)
    terms = sorted(set(include)) if include != ["*"] else []
    # Stopword-like terms (candidate set rivalling the corpus) score faster
    # segment-at-a-time: per-candidate work is identical either way, but
    # per-segment chunks stay cache-sized, skip the concatenation pass, and
    # per-segment top-k keeps the merge input at n_segments*k rows (measured
    # crossover ~1.3e5 on a 400k-doc/224-segment index: fused 2.7x faster
    # below it, ~1.4x slower at df=0.96*corpus). min(df) bounds the
    # conjunctive candidate count, so the switch needs no gather first.
    if terms and min(dfs[t] for t in terms) > 131072:
        parts = []
        for i, seg in enumerate(segments):
            mask = filter_masks[i] if filter_masks else None
            ids, scores = seg.search_bm25(
                include, exclude, k, dfs, n_docs_total, avgdl, k1, b, mask
            )
            if ids.size:
                parts.append((ids, scores))
        merged = merge_topk(parts, k)
        if merged is None:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        return merged
    if not terms:
        # match-all: every score is 0.0, so the (score desc, doc_id desc)
        # order reduces to doc_id desc — per-segment k-largest ids, no
        # scoring or global lexsort pass.
        gid_parts = []
        for i, seg in enumerate(segments):
            mask = filter_masks[i] if filter_masks else None
            cand, _ = seg.candidates(include, exclude, mask, False)
            if cand.size == 0:
                continue
            g = seg.doc_ids[cand]
            if g.size > k:
                g = g[np.argpartition(g, g.size - k)[g.size - k:]]
            gid_parts.append(g)
        if not gid_parts:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        gids = np.sort(np.concatenate(gid_parts))[::-1][:k]
        return gids, np.zeros(gids.size, dtype=np.float64)
    idfs = {t: float(bm25_idf(dfs[t], n_docs_total)) for t in terms}
    gid_parts, dl_parts = [], []
    tf_parts: dict[str, list] = {t: [] for t in terms}
    for i, seg in enumerate(segments):
        mask = filter_masks[i] if filter_masks else None
        cand, post = seg.candidates(include, exclude, mask, True)
        if cand.size == 0:
            continue
        gid_parts.append(seg.doc_ids[cand])
        dl_parts.append(seg.doclen[cand])
        for t in terms:
            p = post[t]
            if p["ids"] is cand:  # 1-term, unfiltered: cand IS the list
                tf_parts[t].append(p["tfs"])
            else:
                tf_parts[t].append(p["tfs"][np.searchsorted(p["ids"], cand)])
    if not gid_parts:
        return np.empty(0, np.uint64), np.empty(0, np.float64)
    gids = np.concatenate(gid_parts)
    dl = np.concatenate(dl_parts)
    scores = np.zeros(gids.size, dtype=np.float64)
    for t in terms:
        scores += bm25_term_scores(
            np.concatenate(tf_parts[t]), dl, idfs[t], avgdl, k1, b
        )
    n = gids.size
    if n > k * 8 and k < n:
        part = np.argpartition(scores, n - k)[n - k:]
        sel = np.flatnonzero(scores >= scores[part].min())
        gids, scores = gids[sel], scores[sel]
    order = np.lexsort((gids, scores))[::-1][:k]
    return gids[order], scores[order]


class LocalIndexSearcher:
    """All segments in one process; query fan-out is a simple loop.

    This is the per-node executor the distributed paths build on, and the
    conformance/latency harness. ``preload=True`` pins all postings in RAM
    (the reference's always-in-RAM model, ``src/collection_manager.cpp:
    153-232``)."""

    def __init__(self, index_dir: str, preload: bool = False):
        self.index_dir = index_dir
        self.stats = load_stats(index_dir)
        self.segments = [
            SegmentSearcher(d, preload=preload) for d in segment_dirs(index_dir)
        ]
        self._df_cache: dict[str, int] = {}
        if preload:
            self._df_cache = load_global_df(index_dir)
            self._df_all = True
        else:
            self._df_all = False

    def _dfs(self, terms: list[str]) -> dict[str, int]:
        missing = [t for t in terms if t not in self._df_cache]
        if missing and not self._df_all:
            self._df_cache.update(load_global_df(self.index_dir, missing))
        return {t: self._df_cache.get(t, 0) for t in terms}

    def search(
        self,
        query: str | list[str],
        k: int = 10,
        mode: str = "bm25",
        exclude_terms: list[str] = (),
        static_field: str | None = None,
        filter_masks: list[np.ndarray] | None = None,
        total_cost: int = 0,
        disjunctive_method: str = "auto",
    ) -> pa.Table:
        from typesense_ray.tokenizer import tokenize_query

        if isinstance(query, str):
            include, exc = tokenize_query(query)
            exclude = list(exc) + list(exclude_terms)
        else:
            include, exclude = list(query), list(exclude_terms)
        if mode in ("bm25", "bm25_or"):
            dfs = self._dfs([t for t in include if t != "*"])
            if mode == "bm25" and any(dfs[t] == 0 for t in dfs):
                return pa.table(
                    {"doc_id": pa.array([], pa.uint64()),
                     "score": pa.array([], pa.float64())}
                )
            if mode == "bm25":
                ids, scores = fused_bm25(
                    self.segments, include, exclude, k, dfs,
                    self.stats["n_docs"], self.stats["avgdl"],
                    self.stats["k1"], self.stats["b"], filter_masks,
                )
                return pa.table({"doc_id": ids, "score": scores})
            parts = []
            for i, seg in enumerate(self.segments):
                mask = filter_masks[i] if filter_masks else None
                ids, scores = seg.search_bm25_disjunctive(
                    include, exclude, k, dfs, self.stats["n_docs"],
                    self.stats["avgdl"], self.stats["k1"], self.stats["b"],
                    mask, method=disjunctive_method,
                    block_size=self.stats["config"].get("block_size"),
                )
                if ids.size:
                    parts.append((ids, scores))
            merged = merge_topk(parts, k)
            if merged is None:
                return pa.table(
                    {"doc_id": pa.array([], pa.uint64()),
                     "score": pa.array([], pa.float64())}
                )
            return pa.table({"doc_id": merged[0], "score": merged[1]})
        elif mode == "reference":
            parts = []
            for i, seg in enumerate(self.segments):
                mask = filter_masks[i] if filter_masks else None
                static = (
                    seg.docs[static_field].to_numpy() if static_field else None
                )
                ids, s0, s1 = seg.search_reference(
                    include, exclude, k, static, mask, total_cost
                )
                if ids.size:
                    parts.append((ids, s0, s1))
            merged = merge_topk(parts, k)
            if merged is None:
                return pa.table(
                    {"doc_id": pa.array([], pa.uint64()),
                     "s0": pa.array([], pa.int64()),
                     "s1": pa.array([], pa.int64())}
                )
            return pa.table({"doc_id": merged[0], "s0": merged[1], "s1": merged[2]})
        raise ValueError(f"unknown mode {mode}")

    def more_like_this(self, seed_doc_id: int, k: int = 20) -> pa.Table:
        """Lucene MoreLikeThis role (no reference counterpart): rank
        OTHER docs by Σ_t tf_d(t)·ln(N/df_t) over the seed doc's distinct
        terms, (score desc, doc_id desc). Requires the text field stored
        in the docs sidecar (hydrate supplies the seed's text); reuses
        the same postings + global-df machinery as BM25 — per segment
        one decode + dense scatter-add, then cross-segment merge_topk."""
        from typesense_ray.tokenizer import normalized_slots

        tf_name = self.stats.get("config", {}).get("text_field", "text")
        txt = self.hydrate(
            np.array([seed_doc_id], dtype=np.uint64), columns=[tf_name]
        )
        empty = pa.table(
            {"doc_id": pa.array([], pa.uint64()),
             "score": pa.array([], pa.float64())}
        )
        if txt.num_rows == 0:
            return empty
        terms = sorted(
            {t for t in normalized_slots(txt[tf_name][0].as_py() or "") if t}
        )
        dfs = self._dfs(terms)
        terms = [t for t in terms if dfs[t] > 0]
        if not terms:
            return empty
        n = self.stats["n_docs"]
        parts = []
        for seg in self.segments:
            ids, scores = seg.search_tfidf(
                terms, dfs, n, k, exclude_gid=seed_doc_id
            )
            if ids.size:
                parts.append((ids, scores))
        merged = merge_topk(parts, k)
        if merged is None:
            return empty
        return pa.table({"doc_id": merged[0], "score": merged[1]})

    def phrase_match(self, phrase: str) -> pa.Table:
        """All doc_ids containing ``phrase`` as consecutive tokens, sorted
        ascending. The phrase must normalize to non-empty tokens in every
        slot (an all-punctuation word has no indexable token to anchor on)."""
        from typesense_ray.tokenizer import normalize_token

        terms = [normalize_token(s) for s in phrase.replace("\n", " ").split(" ")]
        if not terms or any(not t for t in terms):
            raise ValueError(
                "phrase must normalize to a non-empty token per word: "
                f"{phrase!r} -> {terms}"
            )
        parts = [seg.phrase_candidates(terms) for seg in self.segments]
        ids = (
            np.sort(np.concatenate(parts))
            if any(p.size for p in parts)
            else np.empty(0, np.uint64)
        )
        return pa.table({"doc_id": pa.array(ids.astype(np.int64), pa.int64())})

    def hydrate(self, doc_ids: np.ndarray, columns: list[str] | None = None) -> pa.Table:
        """Fetch stored doc rows for top-k ids (the reference's per-hit
        RocksDB fetch, ``src/collection.cpp:948-957``) — a broadcast-k-ids
        lookup against segment docs sidecars."""
        want = set(int(x) for x in doc_ids)
        sel = list(dict.fromkeys(["doc_id"] + list(columns))) if columns else None
        out = []
        for seg in self.segments:
            m = np.isin(seg.doc_ids, np.array(sorted(want), dtype=np.uint64))
            if m.any():
                t = seg.docs.filter(pa.array(m))
                out.append(t.select(sel) if sel else t)
        if not out:
            return None
        tbl = pa.concat_tables(out)
        # order by requested doc_ids
        pos = {int(d): i for i, d in enumerate(doc_ids)}
        idx = sorted(range(tbl.num_rows), key=lambda r: pos[int(tbl["doc_id"][r].as_py())])
        return tbl.take(pa.array(idx))


class IndexServer:
    """Persistent distributed serving pool: N raw Ray actors, each owning a
    round-robin shard of segments with postings preloaded once (the
    reference's always-in-RAM serving model, ``src/collection_manager.cpp:
    153-232``; concurrent-throughput headline ``README.md:170-173``).

    Raw actors (not a Dataset) because serving is standing state + many
    tiny requests — the one place the Dataset API genuinely doesn't fit;
    per-query cost is one broadcast of (terms, dfs) and a merge of
    per-actor top-k arrays. Scale model: actors = nodes × cores_per_node;
    each actor's shard fits its heap; query fan-out cost grows with actor
    count, not corpus size.
    """

    def __init__(
        self,
        index_dir: str,
        num_actors: int | None = None,
        preload: bool = True,
        placement=None,
    ):
        """``placement`` controls multi-node actor scheduling:

        * ``None`` — Ray's default placement (single-node testing).
        * ``"spread"`` — ``scheduling_strategy="SPREAD"``: actors land on
          distinct nodes where possible, so each node loads only its own
          DISJOINT segment shard's postings (once per node, not once per
          actor piled on one box).
        * a ``ray.util.placement_group`` handle — actors are pinned to the
          group's bundles round-robin (bundle i ← actor i % n_bundles),
          for explicit co-location with other pools.

        Shard assignment itself is always a partition — ``self.shards``
        are pairwise disjoint and union to every segment — so no posting
        list is ever resident twice regardless of placement.
        """
        import ray

        self.index_dir = index_dir
        self.stats = load_stats(index_dir)
        dirs = segment_dirs(index_dir)
        if num_actors is None:
            # fan-out budget: every query pays one RPC per actor, so more
            # actors only help while each still owns several segments'
            # worth of work; 8 is the single-node sweet spot (on a real
            # cluster, size to nodes x a few actors each)
            num_actors = max(
                1,
                min(len(dirs), int(ray.cluster_resources().get("CPU", 4)) // 2, 8),
            )
        shards = [dirs[i::num_actors] for i in range(num_actors)]
        self.shards = [s for s in shards if s]
        self._actor_cls = ray.remote(num_cpus=1)(_SegmentGroup)
        self.actors = [
            self._actor_cls.options(
                **self._placement_opts(placement, i)
            ).remote(index_dir, shard, preload)
            for i, shard in enumerate(self.shards)
        ]
        self._df_cache: dict[str, int] = (
            load_global_df(index_dir) if preload else {}
        )
        self._df_all = preload

    @staticmethod
    def _placement_opts(placement, actor_index: int) -> dict:
        if placement is None:
            return {}
        if placement == "spread":
            return {"scheduling_strategy": "SPREAD"}
        from ray.util.scheduling_strategies import (
            PlacementGroupSchedulingStrategy,
        )

        n_bundles = len(placement.bundle_specs)
        return {
            "scheduling_strategy": PlacementGroupSchedulingStrategy(
                placement_group=placement,
                placement_group_bundle_index=actor_index % n_bundles,
            )
        }

    def _dfs(self, terms: list[str]) -> dict[str, int]:
        missing = [t for t in terms if t not in self._df_cache]
        if missing and not self._df_all:
            self._df_cache.update(load_global_df(self.index_dir, missing))
        return {t: self._df_cache.get(t, 0) for t in terms}

    def warmup(self) -> None:
        """Block until every actor has loaded its shard."""
        import ray

        ray.get([a.ping.remote() for a in self.actors])

    def search(
        self, query: str, k: int = 10, mode: str = "bm25"
    ) -> pa.Table:
        import ray

        from typesense_ray.tokenizer import tokenize_query

        include, exclude = tokenize_query(query)
        dfs = self._dfs([t for t in include if t != "*"])
        empty = pa.table(
            {"doc_id": pa.array([], pa.uint64()),
             "score": pa.array([], pa.float64())}
        )
        if mode == "bm25" and include != ["*"] and any(
            dfs[t] == 0 for t in dfs
        ):
            return empty
        futs = [
            a.search.remote(include, exclude, k, dfs, mode) for a in self.actors
        ]
        parts = [p for p in ray.get(futs) if p[0].size]
        merged = merge_topk(parts, k)
        if merged is None:
            return empty
        return pa.table({"doc_id": merged[0], "score": merged[1]})

    def search_many(
        self, queries: list[str], k: int = 10, mode: str = "bm25"
    ) -> list[pa.Table]:
        """Batched query fan-out: ONE RPC per actor carrying every query
        (the actor loops its shard locally and returns per-query top-k's),
        so a 60-query burst costs n_actors RPCs instead of
        n_queries × n_actors — the concurrent-search-throughput shape the
        reference benchmarks (README.md:170-173)."""
        import ray

        from typesense_ray.tokenizer import tokenize_query

        parsed = [tokenize_query(q) for q in queries]
        all_terms = sorted(
            {t for inc, _ in parsed for t in inc if t != "*"}
        )
        dfs_all = self._dfs(all_terms)
        reqs = []  # (query_index, include, exclude, dfs)
        empty = pa.table(
            {"doc_id": pa.array([], pa.uint64()),
             "score": pa.array([], pa.float64())}
        )
        out: list[pa.Table | None] = [None] * len(queries)
        for qi, (include, exclude) in enumerate(parsed):
            dfs = {t: dfs_all[t] for t in include if t != "*"}
            if mode == "bm25" and include != ["*"] and any(
                dfs[t] == 0 for t in dfs
            ):
                out[qi] = empty
                continue
            reqs.append((qi, include, exclude, dfs))
        if reqs:
            batch = [(inc, exc, k, dfs, mode) for _, inc, exc, dfs in reqs]
            per_actor = ray.get(
                [a.search_batch.remote(batch) for a in self.actors]
            )
            for ri, (qi, *_rest) in enumerate(reqs):
                parts = [
                    pa_res[ri] for pa_res in per_actor if pa_res[ri][0].size
                ]
                merged = merge_topk(parts, k)
                out[qi] = (
                    empty if merged is None
                    else pa.table({"doc_id": merged[0], "score": merged[1]})
                )
        return out

    def shutdown(self) -> None:
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []


class _SegmentGroup:
    """Actor body: one shard of segments, searched sequentially per query
    (each actor is one core; parallelism comes from the actor count)."""

    def __init__(self, index_dir: str, seg_dirs: list[str], preload: bool):
        self.stats = load_stats(index_dir)
        self.segs = [SegmentSearcher(d, preload=preload) for d in seg_dirs]

    def ping(self) -> int:
        return len(self.segs)

    def search(
        self,
        include: list[str],
        exclude: list[str],
        k: int,
        dfs: dict[str, int],
        mode: str = "bm25",
    ):
        if mode == "bm25":
            return fused_bm25(
                self.segs, include, exclude, k, dfs, self.stats["n_docs"],
                self.stats["avgdl"], self.stats["k1"], self.stats["b"],
            )
        parts = []
        for seg in self.segs:
            ids, scores = seg.search_bm25_disjunctive(
                include, exclude, k, dfs, self.stats["n_docs"],
                self.stats["avgdl"], self.stats["k1"], self.stats["b"],
                block_size=self.stats["config"].get("block_size"),
            )
            if ids.size:
                parts.append((ids, scores))
        merged = merge_topk(parts, k)
        if merged is None:
            return (np.empty(0, np.uint64), np.empty(0, np.float64))
        return merged

    def search_batch(self, requests: list[tuple]):
        """One RPC, many queries: evaluate each (include, exclude, k, dfs,
        mode) request against this shard sequentially and return the list
        of per-query (doc_ids, scores)."""
        return [
            self.search(inc, exc, k, dfs, mode)
            for inc, exc, k, dfs, mode in requests
        ]


def search_index(
    index_dir: str,
    query: str,
    k: int = 10,
    concurrency: int | None = None,
) -> pa.Table:
    """Distributed BM25 top-k for ONE-SHOT queries: raw-task fan-out over
    segment chunks, driver merge of the tiny per-segment top-k sets.

    This is a deliberate drop to raw Ray tasks — the Dataset API cannot
    express an interactive-latency query: the streaming executor's fixed
    per-pipeline startup is ~1–3 s regardless of input size (measured:
    a 23-row identity ``from_items → map_batches → take_all`` costs
    2–4 s; the same fan-out as 6 raw tasks costs ~0.1 s). Bulk/streaming
    paths in this repo stay on Datasets; repeated-query serving with warm
    postings is :class:`IndexServer`. Reference shard-thread fan-out role:
    ``src/collection.cpp:771-863``, ``src/index.cpp:1197-1230``."""
    import ray

    from typesense_ray.tokenizer import tokenize_query

    include, exclude = tokenize_query(query)
    dfs = (
        load_global_df(index_dir, [t for t in include if t != "*"])
        if include != ["*"]
        else {}
    )
    if include != ["*"] and any(dfs.get(t, 0) == 0 for t in include):
        return pa.table(
            {"doc_id": pa.array([], pa.uint64()), "score": pa.array([], pa.float64())}
        )
    segs = segment_dirs(index_dir)
    if not segs:
        return pa.table(
            {"doc_id": pa.array([], pa.uint64()), "score": pa.array([], pa.float64())}
        )
    if concurrency is None:
        concurrency = min(
            len(segs), max(2, int(ray.cluster_resources().get("CPU", 4)) // 2)
        )
    st = load_stats(index_dir)
    g_n_docs, g_avgdl, g_k1, g_b = st["n_docs"], st["avgdl"], st["k1"], st["b"]

    @ray.remote(num_cpus=1)
    def score_chunk(seg_chunk: list[str]):
        out_ids, out_scores = [], []
        for d in seg_chunk:
            ids, scores = SegmentSearcher(d, preload=False).search_bm25(
                include, exclude, k, dfs, g_n_docs, g_avgdl, g_k1, g_b
            )
            out_ids.append(ids)
            out_scores.append(scores)
        return (
            np.concatenate(out_ids) if out_ids else np.empty(0, np.uint64),
            np.concatenate(out_scores) if out_scores else np.empty(0, np.float64),
        )

    step = -(-len(segs) // concurrency)
    chunks = [segs[i : i + step] for i in range(0, len(segs), step)]
    parts = ray.get([score_chunk.remote(c) for c in chunks])
    ids = np.concatenate([p[0] for p in parts])
    scores = np.concatenate([p[1] for p in parts])
    if ids.size == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.uint64()), "score": pa.array([], pa.float64())}
        )
    order = np.lexsort((ids, scores))[::-1][:k]
    return pa.table(
        {"doc_id": pa.array(ids[order], pa.uint64()), "score": scores[order]}
    )
