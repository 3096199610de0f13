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


def build_typo_table(index_dir: str, max_deletes: int = MAX_COST) -> str:
    """Dataset pipeline: global df terms → explode deletion variants →
    (variant, term, df) parquet sorted by variant. The explode is a
    stateless vectorized map_batches; the sort is the only wide step and
    runs over (variant, term) string pairs."""
    import ray.data as rd

    src = os.path.join(index_dir, "global", "df")
    out_dir = os.path.join(index_dir, TYPO_DIR)

    def explode(batch: pa.Table) -> pa.Table:
        v_col, t_col, d_col = [], [], []
        for term, df in zip(batch["term"].to_pylist(), batch["df"].to_pylist()):
            for v in deletes(term, max_deletes):
                v_col.append(v)
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

    # -- lookups -----------------------------------------------------------

    def fuzzy(
        self,
        token: str,
        max_cost: int = MAX_COST,
        max_candidates: int = MAX_CANDIDATES,
        order: str = "common",
    ) -> list[tuple[str, int]]:
        """(term, cost) candidates within bounded OSA distance, best cost
        first; within a cost ranked by df (``order="common"``: df desc —
        MAX_SCORE-ish; ``"rare"``: df asc — FREQUENCY)."""
        cost_cap = bounded_typo_cost(max_cost, len(token))
        cand_ids: set[int] = set()
        for v in deletes(token, cost_cap):
            cand_ids.update(self._variants.get(v, ()))
        # exact term always first if present
        results: list[tuple[str, int, int]] = []
        for ti in cand_ids:
            term = self._terms[ti]
            d = osa_distance(token, term, cost_cap)
            if d <= cost_cap:
                results.append((term, d, int(self._dfs[ti])))
        exact = self._term_index.get(token)
        if exact is not None and not any(r[0] == token for r in results):
            results.append((token, 0, int(self._dfs[exact])))
        sign = -1 if order == "common" else 1
        results.sort(key=lambda r: (r[1], sign * r[2], r[0]))
        return [(t, c) for t, c, _ in results[:max_candidates]]

    def prefix(
        self, token: str, max_candidates: int = MAX_PREFIX_CANDIDATES
    ) -> list[str]:
        """Terms starting with ``token``, top-N by df desc (term asc ties).
        Mirrors the last-token prefix expansion (src/index.cpp:1697-1702)."""
        lo = np.searchsorted(self._terms_np, token)
        hi = np.searchsorted(self._terms_np, token + "￿")
        if hi <= lo:
            return []
        dfs = self._dfs[lo:hi]
        terms = self._terms[lo:hi]
        order = sorted(range(len(terms)), key=lambda i: (-dfs[i], terms[i]))
        return [terms[i] for i in order[:max_candidates]]

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
    ) -> list[tuple[list[str], int]]:
        """Query variants as (term-list, total_cost), best (lowest total
        cost) first — the reference's cost-combination cartesian loop
        (``src/index.cpp:1673-1755``) flattened into an ordered variant
        list capped at ``combination_limit``."""
        per_token: list[list[tuple[str, int]]] = []
        for i, tok in enumerate(tokens):
            if prefix_last and i == len(tokens) - 1:
                cands = [(t, 0) for t in self.prefix(tok)]
                if not cands:
                    cands = self.fuzzy(tok, num_typos)
            elif num_typos > 0:
                cands = self.fuzzy(tok, num_typos)
            else:
                cands = [(tok, 0)] if tok in self._term_index else []
            if not cands:
                return []  # a token with no candidates → no conjunctive hit
            per_token.append(cands)

        import itertools

        variants = []
        for combo in itertools.product(*per_token):
            terms = [c[0] for c in combo]
            if len(set(terms)) < len(terms):
                continue  # two query tokens mapping to the same term
            variants.append((terms, sum(c[1] for c in combo)))
        variants.sort(key=lambda v: v[1])
        return variants[:combination_limit]
