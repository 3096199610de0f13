"""Single-process pure-Python reference engine (the conformance oracle).

Implements the reference search semantics end-to-end on plain dicts —
tokenize → AND-intersect → score → full sort — independently of the Ray
engine's segments/codecs, so golden-ordering and rank-identity tests
(SURVEY.md §7.0) compare two independent implementations:

- ``mode="reference"``: packed proximity match score + static sort field,
  ordering ``[_text_match desc, default_sorting_field desc, doc_id desc]``
  (``src/index.cpp:1806-1935``, ``include/topster.h:254-257``).
- ``mode="bm25"``: the north-rule BM25 (k1=1.2, b=0.75); term
  contributions summed in sorted-term order with float64 so results are
  bitwise comparable with the distributed engine.
"""

from __future__ import annotations

import numpy as np

from typesense_ray.scoring import K1, B, bm25_idf, bm25_term_scores, reference_match_score
from typesense_ray.tokenizer import doc_term_positions, tokenize_query


class OracleIndex:
    def __init__(
        self,
        rows: list[dict],
        text_field: str = "content",
        doc_id_of=None,
        static_field: str | None = None,
    ):
        self.postings: dict[str, dict[int, list[int]]] = {}
        self.doclen: dict[int, int] = {}
        self.static: dict[int, int] = {}
        self.all_ids: list[int] = []
        for row in rows:
            did = doc_id_of(row) if doc_id_of else int(row["doc_id"])
            self.all_ids.append(did)
            text = row.get(text_field) or ""
            d, n = doc_term_positions(text)
            self.doclen[did] = n
            if static_field:
                self.static[did] = int(row.get(static_field) or 0)
            for term, pos in d.items():
                self.postings.setdefault(term, {})[did] = pos
        self.n_docs = len(self.all_ids)
        self.avgdl = (
            sum(self.doclen.values()) / self.n_docs if self.n_docs else 0.0
        )

    def df(self, term: str) -> int:
        return len(self.postings.get(term, ()))

    def candidates(
        self, include: list[str], exclude: list[str], conjunctive: bool = True
    ) -> list[int]:
        if include == ["*"]:
            cand = set(self.all_ids)
        elif not conjunctive:
            cand = set()
            for t in set(include):
                cand |= set(self.postings.get(t, {}).keys())
        else:
            sets = []
            for t in set(include):
                p = self.postings.get(t)
                if not p:
                    return []
                sets.append(set(p.keys()))
            cand = set.intersection(*sets)
        for t in exclude:
            p = self.postings.get(t)
            if p:
                cand -= set(p.keys())
        return sorted(cand)

    def search(
        self,
        query: str | list[str],
        k: int | None = None,
        mode: str = "bm25",
        exclude_terms: list[str] = (),
        total_cost: int = 0,
    ) -> list[tuple]:
        if isinstance(query, str):
            include, exc = tokenize_query(query)
            exclude = list(exc) + list(exclude_terms)
        else:
            include, exclude = list(query), list(exclude_terms)
        conjunctive = mode != "bm25_or"
        cand = self.candidates(include, exclude, conjunctive)
        results = []
        if mode in ("bm25", "bm25_or"):
            for did in cand:
                score = 0.0
                if include != ["*"]:
                    dl = self.doclen[did]
                    for t in sorted(set(include)):
                        if did not in self.postings.get(t, {}):
                            continue  # disjunctive: absent term adds nothing
                        tf = len(self.postings[t][did])
                        idf = float(bm25_idf(self.df(t), self.n_docs))
                        score += float(
                            bm25_term_scores(
                                np.float64(tf), np.float64(dl), idf, self.avgdl, K1, B
                            )
                        )
                results.append((did, score))
            results.sort(key=lambda r: (r[1], r[0]), reverse=True)
        elif mode == "reference":
            for did in cand:
                if include == ["*"]:
                    s0 = 0
                elif len(include) <= 1:
                    s0 = reference_match_score([None], total_cost)
                else:
                    offs = [np.array(self.postings[t][did]) for t in include]
                    s0 = reference_match_score(offs, total_cost)
                s1 = self.static.get(did, 0)
                results.append((did, s0, s1))
            results.sort(key=lambda r: (r[1], r[2], r[0]), reverse=True)
        else:
            raise ValueError(mode)
        return results[:k] if k else results
