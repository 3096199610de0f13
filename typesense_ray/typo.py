"""Typo tolerance + prefix expansion — the index-time-table rendition of
the reference's trie-walk fuzzy search.

The reference walks an ART with incremental optimal-string-alignment
(OSA) Damerau-Levenshtein rows (``src/art.cpp:1149-1177, 1239-1379``).
A distributed trie is non-idiomatic for Ray, so per SURVEY.md §7 the
engine precomputes a SymSpell-style **deletion-neighborhood table** from
the global vocabulary (term → all variants obtainable by deleting ≤ d
characters): two terms within OSA distance d share at least one deletion
variant, so lookup = generate the query token's variants → bucket join →
verify true OSA distance. Prefix search is a sorted-vocabulary range scan.

Reference thresholds mirrored (``src/index.cpp:1644-1755``): max cost 2;
tokens of length 1-2 capped at len-1 (``get_bounded_typo_cost``,
``src/index.cpp:1786-1792``); 3 candidates per token (10 for prefix);
candidate ordering FREQUENCY = ascending df (``include/art.h:124-127``,
``src/art.cpp:44-79``: the reference's FREQUENCY comparator prefers the
*less* frequent leaf first at equal cost — we rank by (cost asc, df desc,
term asc) which matches its observable "best candidates first" behavior
for MAX_SCORE ordering; pick ``order="rare"`` for the FREQUENCY one).

The table is built once per index by a Dataset pipeline over the global
df table and stored under ``global/typo/``; resolution happens once per
query on the driver (the resolved term variants — not the table — fan
out to segment scorers).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MAX_COST = 2
MAX_CANDIDATES = 3
MAX_PREFIX_CANDIDATES = 10
DELETE_PREFIX_LEN = 10  # SymSpell-style prefix limit keeps the table small


def bounded_typo_cost(max_cost: int, token_len: int) -> int:
    """``Index::get_bounded_typo_cost`` (src/index.cpp:1786-1792)."""
    if token_len > 0 and max_cost >= token_len and token_len in (1, 2):
        return token_len - 1
    return max_cost


def osa_distance(a: str, b: str, cap: int = MAX_COST) -> int:
    """Optimal-string-alignment Damerau-Levenshtein (adjacent transposition
    counted once, no substring moves) with an early-exit cap."""
    la, lb = len(a), len(b)
    if abs(la - lb) > cap:
        return cap + 1
    prev2: list[int] | None = None
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        row_min = i
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (
                i > 1 and j > 1
                and a[i - 1] == b[j - 2] and a[i - 2] == b[j - 1]
            ):
                cur[j] = min(cur[j], prev2[j - 2] + 1)
            row_min = min(row_min, cur[j])
        if row_min > cap:
            return cap + 1
        prev2, prev = prev, cur
    return prev[lb]


def deletes(token: str, max_deletes: int = MAX_COST,
            prefix_len: int = DELETE_PREFIX_LEN) -> set[str]:
    """All strings obtainable by deleting ≤ max_deletes chars from the
    (prefix-limited) token, including the token prefix itself."""
    base = token[:prefix_len]
    out = {base}
    frontier = {base}
    for _ in range(max_deletes):
        nxt = set()
        for s in frontier:
            for i in range(len(s)):
                nxt.add(s[:i] + s[i + 1 :])
        nxt -= out
        out |= nxt
        frontier = nxt
    return out


TYPO_DIR = os.path.join("global", "typo")
TERM_STATS_DIR = os.path.join("global", "term_stats")
# build-parameter sidecars, so index-mutation commits (ops.upsert /
# delete / merge) can replay the builds without the caller's arguments;
# kept OUTSIDE the parquet dirs so dataset scans never see them
TYPO_META = os.path.join("global", "typo_meta.json")
TERM_STATS_META = os.path.join("global", "term_stats_meta.json")


def _write_meta(index_dir: str, rel: str, payload: dict) -> None:
    import json

    with open(os.path.join(index_dir, rel), "w") as f:
        json.dump(payload, f)


def read_meta(index_dir: str, rel: str) -> dict | None:
    import json

    p = os.path.join(index_dir, rel)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def build_term_max_static(index_dir: str, static_field: str) -> str:
    """Per-term MAX of a static ranking field over the term's posting
    docs — the role of the reference ART leaf's ``max_score``
    (``src/art.cpp:411-412``, consulted for MAX_SCORE candidate ordering
    at ``src/art.cpp:913-916``). Computed per segment as a Ray task fan-out
    (decode each term's postings, one vectorized gather+max against the
    docs sidecar) and stream-merged like the global df (vocab ≪ corpus);
    stored under ``global/term_stats``."""
    import ray

    from typesense_ray.index_build import DOCS_FILE, POSTINGS_FILE
    from typesense_ray.query import segment_dirs

    @ray.remote(num_cpus=1)
    def seg_stats(seg_dir: str):
        from typesense_ray.codec import decode_posting_ids

        docs = pq.read_table(
            os.path.join(seg_dir, DOCS_FILE), columns=[static_field]
        )
        stat = docs[static_field].to_numpy().astype(np.int64)
        post = pq.read_table(
            os.path.join(seg_dir, POSTINGS_FILE), columns=["term", "df", "ids_vb"]
        )
        terms = post["term"].to_pylist()
        dfs = post["df"].to_pylist()
        out = np.empty(len(terms), np.int64)
        for i, (df, vb) in enumerate(zip(dfs, post["ids_vb"].to_pylist())):
            ids = decode_posting_ids(vb, df).astype(np.int64)
            out[i] = stat[ids].max() if ids.size else 0
        return terms, out

    results = ray.get([seg_stats.remote(d) for d in segment_dirs(index_dir)])
    best: dict[str, int] = {}
    for terms, maxs in results:
        for t, m in zip(terms, maxs.tolist()):
            if m > best.get(t, -(1 << 62)):
                best[t] = m
    out_dir = os.path.join(index_dir, TERM_STATS_DIR)
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    terms_sorted = sorted(best)
    pq.write_table(
        pa.table(
            {"term": pa.array(terms_sorted, pa.string()),
             "max_static": pa.array(
                 [best[t] for t in terms_sorted], pa.int64()
             )}
        ),
        os.path.join(out_dir, "term_stats.parquet"),
    )
    _write_meta(index_dir, TERM_STATS_META, {"static_field": static_field})
    return out_dir


def build_typo_table(index_dir: str, max_deletes: int = MAX_COST) -> str:
    """Dataset pipeline: global df terms → explode deletion variants →
    (variant, term, df) parquet sorted by variant. The explode is a
    stateless vectorized map_batches; the sort is the only wide step and
    runs over (variant, term) string pairs."""
    import ray.data as rd

    src = os.path.join(index_dir, "global", "df")
    out_dir = os.path.join(index_dir, TYPO_DIR)

    def explode(batch: pa.Table) -> pa.Table:
        from typesense_ray.index_build import FIELD_SEP

        v_col, t_col, d_col = [], [], []
        for term, df in zip(batch["term"].to_pylist(), batch["df"].to_pylist()):
            # secondary-field terms ('field\x1fterm') delete-expand over
            # the BARE term (the reference keeps one ART per field,
            # include/index.h:109) — variants re-attach the field prefix
            # so lookups stay field-scoped in one shared table
            if FIELD_SEP in term:
                fld, bare = term.split(FIELD_SEP, 1)
                pre = fld + FIELD_SEP
            else:
                pre, bare = "", term
            for v in deletes(bare, max_deletes):
                v_col.append(pre + v)
                t_col.append(term)
                d_col.append(df)
        return pa.table(
            {"variant": pa.array(v_col, pa.string()),
             "term": pa.array(t_col, pa.string()),
             "df": pa.array(d_col, pa.int64())}
        )

    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    (
        rd.read_parquet(src)
        .map_batches(explode, batch_format="pyarrow")
        .sort("variant")
        .write_parquet(out_dir)
    )
    _write_meta(index_dir, TYPO_META, {"max_deletes": max_deletes})
    return out_dir


class TypoResolver:
    """Per-process resolver: loads the variant table (hash dict) and the
    sorted vocabulary once; resolves query tokens to (term, cost)
    candidates. At larger-than-RAM vocabularies, swap the dict for
    filtered parquet reads over the variant-sorted files (row-group
    pruning on the sorted ``variant`` column)."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        typo_path = os.path.join(index_dir, TYPO_DIR)
        self._variants: dict[str, list[int]] = {}
        self._terms: list[str] = []
        self._dfs: np.ndarray | None = None
        df_path = os.path.join(index_dir, "global", "df")
        import pyarrow.dataset as pads

        tbl = pads.dataset(df_path).to_table()
        order = np.argsort(np.asarray(tbl["term"].to_pylist(), dtype=object))
        self._terms = [tbl["term"][int(i)].as_py() for i in order]
        self._dfs = np.asarray(tbl["df"].to_pylist(), dtype=np.int64)[order]
        self._term_index = {t: i for i, t in enumerate(self._terms)}
        self._terms_np = np.asarray(self._terms, dtype=object)
        if os.path.exists(typo_path):
            vt = pads.dataset(typo_path).to_table()
            for v, t in zip(vt["variant"].to_pylist(), vt["term"].to_pylist()):
                ti = self._term_index.get(t)
                if ti is None:
                    continue
                self._variants.setdefault(v, []).append(ti)
        self.has_typo_table = bool(self._variants)
        # per-term max static score (reference ART leaf max_score,
        # src/art.cpp:411-412) for MAX_SCORE candidate ordering; falls
        # back to df ordering when the sidecar wasn't built
        self._max_static: np.ndarray | None = None
        stats_path = os.path.join(index_dir, TERM_STATS_DIR)
        if os.path.exists(stats_path):
            st = pads.dataset(stats_path).to_table()
            by_term = dict(
                zip(st["term"].to_pylist(), st["max_static"].to_pylist())
            )
            self._max_static = np.asarray(
                [by_term.get(t, 0) for t in self._terms], dtype=np.int64
            )

    # -- lookups -----------------------------------------------------------

    def fuzzy(
        self,
        token: str,
        max_cost: int = MAX_COST,
        max_candidates: int = MAX_CANDIDATES,
        order: str = "common",
        field: str | None = None,
    ) -> list[tuple[str, int]]:
        """(term, cost) candidates within bounded OSA distance, best cost
        first; within a cost ranked by the chosen comparator:
        ``order="common"`` — df desc; ``"rare"`` — df asc (the reference
        FREQUENCY comparator, ``src/art.cpp:44-79``); ``"max_score"`` —
        stored per-term max static score desc (the reference MAX_SCORE
        ordering over ART leaf max_scores, ``src/art.cpp:913-916``;
        requires :func:`build_term_max_static`, else falls back to df).

        ``field`` scopes the lookup to a secondary indexed field's
        vocabulary (the reference keeps one ART per field); returned
        candidate terms are BARE (no field prefix)."""
        from typesense_ray.index_build import FIELD_SEP

        pre = field + FIELD_SEP if field else ""
        cost_cap = bounded_typo_cost(max_cost, len(token))
        cand_ids: set[int] = set()
        for v in deletes(token, cost_cap):
            cand_ids.update(self._variants.get(pre + v, ()))
        rank_col = (
            self._max_static
            if order == "max_score" and self._max_static is not None
            else self._dfs
        )
        # exact term always first if present
        results: list[tuple[str, int, int]] = []
        for ti in cand_ids:
            term = self._terms[ti]
            bare = term[len(pre):] if pre and term.startswith(pre) else term
            d = osa_distance(token, bare, cost_cap)
            if d <= cost_cap:
                results.append((bare, d, int(rank_col[ti])))
        exact = self._term_index.get(pre + token)
        if exact is not None and not any(r[0] == token for r in results):
            results.append((token, 0, int(rank_col[exact])))
        sign = 1 if order == "rare" else -1
        results.sort(key=lambda r: (r[1], sign * r[2], r[0]))
        return [(t, c) for t, c, _ in results[:max_candidates]]

    def prefix(
        self, token: str, max_candidates: int = MAX_PREFIX_CANDIDATES,
        order: str = "common", field: str | None = None,
    ) -> list[str]:
        """Terms starting with ``token``, top-N by the chosen comparator
        (df desc for ``"common"``/FREQUENCY, stored per-term max-static
        for ``"max_score"``; term asc ties). Mirrors the last-token
        prefix expansion (src/index.cpp:1697-1702) whose candidate cap
        is ranked by the search's token_order. ``field`` scopes the scan
        to that field's vocabulary; results are bare terms."""
        from typesense_ray.index_build import FIELD_SEP

        pre = field + FIELD_SEP if field else ""
        lo = np.searchsorted(self._terms_np, pre + token)
        hi = np.searchsorted(self._terms_np, pre + token + "￿")
        if hi <= lo:
            return []
        rank = (
            self._max_static
            if order == "max_score" and self._max_static is not None
            else self._dfs
        )[lo:hi]
        terms = self._terms[lo:hi]
        if pre:
            terms = [t[len(pre):] for t in terms]
        else:
            # the shared sorted vocab interleaves 'field\x1fterm' keys;
            # a primary-field scan must not leak them (e.g. prefix 'cat'
            # ranging into 'categories\x1f…')
            keep = [i for i, t in enumerate(terms) if FIELD_SEP not in t]
            if len(keep) != len(terms):
                terms = [terms[i] for i in keep]
                rank = rank[keep]
        idx = sorted(range(len(terms)), key=lambda i: (-rank[i], terms[i]))
        return [terms[i] for i in idx[:max_candidates]]

    def candidates_per_token(
        self, tokens: list[str], num_typos: int = MAX_COST
    ) -> list[list[tuple[str, int]]]:
        """UNCAPPED (term, cost) candidates for each query token — the
        id-set view of fuzzy search (every vocabulary term within bounded
        OSA distance), mirrored by the DuckDB ``damerau_levenshtein``
        oracle. Returns [] if any token has no candidates (conjunctive
        queries can then short-circuit to empty)."""
        out: list[list[tuple[str, int]]] = []
        for tok in tokens:
            if num_typos > 0:
                cands = self.fuzzy(tok, num_typos, max_candidates=1 << 30)
            else:
                cands = [(tok, 0)] if tok in self._term_index else []
            if not cands:
                return []
            out.append(cands)
        return out

    def expand_query(
        self,
        tokens: list[str],
        num_typos: int = MAX_COST,
        prefix_last: bool = False,
        combination_limit: int = 10,
        order: str = "common",
        field: str | None = None,
    ) -> list[tuple[list[str], int, int]]:
        """Query variants as (term-list, total_cost, score_cost), best
        (lowest total cost) first — the reference's cost-combination
        cartesian loop (``src/index.cpp:1673-1755``) flattened into an
        ordered variant list capped at ``combination_limit``.
        ``score_cost`` adds +1 per matched term whose LENGTH differs from
        its query token (prefix expansions and insert/delete typo
        neighbours) — the reference penalizes those at scoring time but
        not at candidate selection (``next_suggestion``,
        ``src/index.cpp:2040-2042``: ``key_len != token_size+1`` →
        ``total_cost++``), which is what ranks an exact 'roti' hit above
        a prefix-expanded 'rotini' one
        (CollectionTest.PrefixRankedAfterExactMatch). ``field`` scopes
        candidate lookup to a secondary field's vocabulary (bare terms
        returned)."""
        from typesense_ray.index_build import FIELD_SEP

        pre = field + FIELD_SEP if field else ""
        per_token: list[list[tuple[str, int, int]]] = []
        for i, tok in enumerate(tokens):
            if prefix_last and i == len(tokens) - 1:
                cands = [(t, 0, 0 if len(t) == len(tok) else 1)
                         for t in self.prefix(tok, order=order, field=field)]
                if not cands:
                    cands = [
                        (t, c, c + (0 if len(t) == len(tok) else 1))
                        for t, c in self.fuzzy(tok, num_typos, order=order,
                                               field=field)
                    ]
            elif num_typos > 0:
                cands = [
                    (t, c, c + (0 if len(t) == len(tok) else 1))
                    for t, c in self.fuzzy(tok, num_typos, order=order,
                                           field=field)
                ]
            else:
                cands = (
                    [(tok, 0, 0)] if (pre + tok) in self._term_index else []
                )
            if not cands:
                return []  # a token with no candidates → no conjunctive hit
            per_token.append(cands)

        import itertools

        variants = []
        for combo in itertools.product(*per_token):
            terms = [c[0] for c in combo]
            if len(set(terms)) < len(terms):
                continue  # two query tokens mapping to the same term
            variants.append(
                (terms, sum(c[1] for c in combo), sum(c[2] for c in combo))
            )
        variants.sort(key=lambda v: (v[1], v[2]))
        return variants[:combination_limit]
