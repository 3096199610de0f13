"""``filter_by`` DSL: parse + vectorized per-segment evaluation.

Grammar mirrors the reference (``Collection::parse_filter_query``,
``src/collection.cpp:1741-1891``; comparator extraction
``include/field.h:105-142``):

- clauses joined by ``&&`` (AND);
- numeric/float: ``field:42``, ``field:>=10``, ``field:[10,>=20,<5]``
  (list = OR, each element may carry its own comparator);
- bool: ``field:true`` / ``field:[true,false]``;
- string: ``field:value`` = CONTAINS (docs whose field contains *all*
  tokens of the value, ``src/index.cpp:1026-1060``), ``field:= value`` =
  EQUALS (token count must also match — the reference's facet-hash exact
  check, ``src/index.cpp:1062-1105``), ``field:[v1,v2]`` = OR over values.

Evaluation is vectorized over a segment's docs sidecar (Arrow columns →
numpy); string token sets are computed once per segment+field and cached
by the caller.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from typesense_ray.tokenizer import tokenize

_NUM_RE = re.compile(r"^-?\d+(\.\d+)?$")


@dataclass
class FilterClause:
    field: str
    values: list[str]
    comparators: list[str]  # per value: '=', '<', '<=', '>', '>=', 'CONTAINS', 'EQUALS'


def _extract_comparator(v: str) -> tuple[str, str]:
    v = v.strip()
    if _NUM_RE.match(v):
        return "=", v
    for op in ("<=", ">=", "<", ">"):
        if v.startswith(op):
            return op, v[len(op):].strip()
    raise ValueError(f"invalid numeric comparator in {v!r}")


def _check_numeric(v: str, kind: str, fname: str) -> None:
    """Value/type validation is a PARSE error (the reference rejects a
    float literal against an int field at filter-parse time with
    "Not an int32", ``include/field.h:105-142``) — so the search path's
    swallow-malformed-filters behavior covers it, and the strict paths
    raise before touching the index."""
    if kind == "int" and not re.match(r"^-?\d+$", v):
        raise ValueError(f"filter field {fname!r}: {v!r} is not an int")
    if kind == "float" and not _NUM_RE.match(v):
        raise ValueError(f"filter field {fname!r}: {v!r} is not a number")


def parse_filter(filter_by: str, field_types: dict[str, str]) -> list[FilterClause]:
    """``field_types``: field → 'int' | 'float' | 'bool' | 'str' (list types
    use the element kind)."""
    clauses = []
    if not filter_by or not filter_by.strip():
        return clauses
    for block in filter_by.split("&&"):
        if ":" not in block:
            # reference 400 Option for a malformed block
            # (src/collection.cpp:1751)
            raise ValueError("Could not parse the filter query.")
        fname, raw = block.split(":", 1)
        fname = fname.strip()
        raw = raw.strip()
        if fname not in field_types:
            raise KeyError(f"no filter field named {fname!r}")
        kind = field_types[fname]
        if kind in ("int", "float", "bool") and raw.startswith("="):
            raw = raw[1:].strip()  # ':=' is a no-op for non-string kinds
        if kind in ("int", "float"):
            if raw.startswith("[") and raw.endswith("]"):
                vals, comps = [], []
                for piece in raw[1:-1].split(","):
                    op, v = _extract_comparator(piece)
                    _check_numeric(v, kind, fname)
                    vals.append(v)
                    comps.append(op)
                clauses.append(FilterClause(fname, vals, comps))
            else:
                op, v = _extract_comparator(raw)
                _check_numeric(v, kind, fname)
                clauses.append(FilterClause(fname, [v], [op]))
        elif kind == "bool":
            raws = (
                raw[1:-1].split(",") if raw.startswith("[") and raw.endswith("]")
                else [raw]
            )
            vals = []
            for r in raws:
                r = r.strip()
                if r not in ("true", "false"):
                    raise ValueError(f"bool filter value must be true/false: {r!r}")
                vals.append(r)
            clauses.append(FilterClause(fname, vals, ["="] * len(vals)))
        else:  # string
            comp = "CONTAINS"
            if raw.startswith("="):
                comp = "EQUALS"
                raw = raw[1:].strip()
            if raw.startswith("[") and raw.endswith("]"):
                vals = [v.strip() for v in raw[1:-1].split(",")]
            else:
                vals = [raw]
            clauses.append(FilterClause(fname, vals, [comp] * len(vals)))
    return clauses


def norm_tokens(value: str) -> tuple[str, ...]:
    return tuple(t for t in tokenize(value or "", keep_empty=False) if t)


class StringTokenCache:
    """Per-(segment, field) cache of each doc's normalized token tuples.
    For scalar string columns: one tuple per doc. For list<string>
    columns: a list of tuples (one per array element) per doc."""

    def __init__(self):
        self._cache: dict[str, list] = {}

    def get(self, docs: pa.Table, field: str):
        if field in self._cache:
            return self._cache[field]
        col = docs[field]
        if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            vals = [
                [norm_tokens(x) for x in (elem or [])] for elem in col.to_pylist()
            ]
        else:
            vals = [norm_tokens(x) for x in col.to_pylist()]
        self._cache[field] = vals
        return vals


class NumericIndexCache:
    """Per-(segment, field) value-sorted numeric index — the reference
    ``num_tree`` role (``include/num_tree.h:8-120``): every comparator
    becomes an O(log n + k) ``searchsorted`` range scan over the sorted
    values instead of an O(n) full-column compare per query. Built lazily
    (one argsort per segment+field) and cached for the collection's
    lifetime, like the string token cache. Null entries surface as NaN in
    the numpy view and sort to the end, where finite range bounds never
    reach them — matching the compare path, where NaN comparisons are
    false."""

    def __init__(self):
        self._cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}

    def get(self, docs: pa.Table, field: str):
        hit = self._cache.get(field)
        if hit is None:
            col = docs[field].to_numpy(zero_copy_only=False)
            order = np.argsort(col, kind="stable").astype(np.int64)
            sv = col[order]
            # nulls/NaNs sort to the end; unbounded-above ranges must stop
            # before them (NaN comparisons are false in the compare path)
            n_valid = sv.size
            if sv.dtype.kind == "f":
                n_valid = sv.size - int(np.isnan(sv).sum())
            hit = self._cache[field] = (sv, order, n_valid)
        return hit


def _numeric_mask_sorted(
    docs: pa.Table, clause: FilterClause, kind: str,
    cache: NumericIndexCache, n: int,
) -> np.ndarray:
    sorted_vals, order, n_valid = cache.get(docs, clause.field)
    mask = np.zeros(n, dtype=bool)
    cast = float if kind == "float" else int
    for v, op in zip(clause.values, clause.comparators):
        x = cast(v)
        if op == "=":
            lo = np.searchsorted(sorted_vals, x, side="left")
            hi = np.searchsorted(sorted_vals, x, side="right")
        elif op == "<":
            lo, hi = 0, np.searchsorted(sorted_vals, x, side="left")
        elif op == "<=":
            lo, hi = 0, np.searchsorted(sorted_vals, x, side="right")
        elif op == ">":
            lo = np.searchsorted(sorted_vals, x, side="right")
            hi = n_valid
        else:  # '>='
            lo = np.searchsorted(sorted_vals, x, side="left")
            hi = n_valid
        if hi > lo:
            mask[order[lo:hi]] = True
    return mask


def _numeric_mask(col: np.ndarray, clause: FilterClause, kind: str) -> np.ndarray:
    mask = np.zeros(len(col), dtype=bool)
    cast = float if kind == "float" else int
    for v, op in zip(clause.values, clause.comparators):
        x = cast(v)
        if op == "=":
            mask |= col == x
        elif op == "<":
            mask |= col < x
        elif op == "<=":
            mask |= col <= x
        elif op == ">":
            mask |= col > x
        elif op == ">=":
            mask |= col >= x
    return mask


def eval_filters(
    docs: pa.Table,
    clauses: list[FilterClause],
    field_types: dict[str, str],
    token_cache: StringTokenCache,
    numeric_cache: NumericIndexCache | None = None,
    vocab_fn=None,
) -> np.ndarray:
    """AND of all clauses → boolean mask over the segment's docs. With a
    ``numeric_cache``, scalar numeric clauses take the sorted-sidecar
    range-scan path (sublinear per query after the first build); without
    one (one-shot callers like bulk delete) they fall back to the
    vectorized full-column compare.

    ``vocab_fn(field) -> frozenset`` supplies the field's GLOBAL token
    vocabulary. The reference ANDs a multi-token string filter value but
    SKIPS tokens whose ART lookup returns no leaf (src/index.cpp:1036-1043
    just ``continue``s on a null leaf), so ``starring: samuel johnson``
    matches every doc containing ``samuel`` when ``johnson`` occurs
    nowhere in the corpus — and the scalar ``:=`` count check compares
    the doc's token count against the number of FOUND filter tokens
    (``query_suggestion.size() == fvalues.size()``, src/index.cpp:1070).
    Because our evaluation is per-segment, the vocabulary must be global
    (a token present only in ANOTHER segment still participates in the
    AND here and correctly matches nothing). Without ``vocab_fn``
    (one-shot destructive callers like bulk delete) every token
    participates — strictly-narrower, never deletes more than asked."""
    n = docs.num_rows
    mask = np.ones(n, dtype=bool)
    for clause in clauses:
        kind = field_types[clause.field]
        if kind in ("int", "float"):
            col_arrow = docs[clause.field]
            if pa.types.is_list(col_arrow.type) or pa.types.is_large_list(col_arrow.type):
                # array numeric field: value matches if ANY element does
                m = np.zeros(n, dtype=bool)
                pylist = col_arrow.to_pylist()
                for v, op in zip(clause.values, clause.comparators):
                    cast = float if kind == "float" else int
                    x = cast(v)
                    cmp = {
                        "=": lambda e: e == x,
                        "<": lambda e: e < x,
                        "<=": lambda e: e <= x,
                        ">": lambda e: e > x,
                        ">=": lambda e: e >= x,
                    }[op]
                    m |= np.array(
                        [any(cmp(e) for e in (row or [])) for row in pylist], dtype=bool
                    )
            elif numeric_cache is not None:
                m = _numeric_mask_sorted(docs, clause, kind, numeric_cache, n)
            else:
                col = col_arrow.to_numpy(zero_copy_only=False)
                m = _numeric_mask(col, clause, kind)
        elif kind == "bool":
            col_arrow = docs[clause.field]
            if pa.types.is_list(col_arrow.type) or pa.types.is_large_list(col_arrow.type):
                pylist = col_arrow.to_pylist()
                m = np.zeros(n, dtype=bool)
                for v in clause.values:
                    want = v == "true"
                    m |= np.array(
                        [any(e == want for e in (row or [])) for row in pylist],
                        dtype=bool,
                    )
            else:
                col = docs[clause.field].to_numpy(zero_copy_only=False)
                m = np.zeros(n, dtype=bool)
                for v in clause.values:
                    m |= col == (v == "true")
        else:  # string
            toks_per_doc = token_cache.get(docs, clause.field)
            is_array = toks_per_doc and isinstance(toks_per_doc[0], list)
            m = np.zeros(n, dtype=bool)
            vocab = vocab_fn(clause.field) if vocab_fn is not None else None
            for v, comp in zip(clause.values, clause.comparators):
                want_all = norm_tokens(v)
                if not want_all:
                    continue
                # OOV tokens drop out of the AND (null-leaf skip); a value
                # with NO in-vocab token matches nothing (strt_ids stays
                # null in the reference)
                want = (tuple(t for t in want_all if t in vocab)
                        if vocab is not None else want_all)
                if not want:
                    continue
                wset = set(want)
                if is_array:
                    if comp == "EQUALS":
                        # the array-exact facet-hash check runs over ALL
                        # filter tokens incl. OOV ones (str_tokens is
                        # collected before the leaf probe,
                        # src/index.cpp:1031-1034), so an OOV token can
                        # never hash-match any stored element
                        mm = [any(t == want_all for t in row)
                              for row in toks_per_doc]
                    else:
                        mm = [
                            wset <= set(t for tup in row for t in tup)
                            for row in toks_per_doc
                        ]
                else:
                    if comp == "EQUALS":
                        # reference exact check: all FOUND tokens present
                        # AND doc token count == found-token count
                        # (src/index.cpp:1070-1074)
                        mm = [
                            len(t) == len(want) and wset <= set(t)
                            for t in toks_per_doc
                        ]
                    else:
                        mm = [wset <= set(t) for t in toks_per_doc]
                m |= np.array(mm, dtype=bool)
        mask &= m
    return mask


def arrow_field_kind(t: pa.DataType) -> str:
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        t = t.value_type
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    return "str"
