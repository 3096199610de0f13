"""Conformance ports of the reference's ART *numeric* cases
(``test/art_test.cpp:894-1480``) against the component that plays the
num_tree/numeric-ART role here: :func:`typesense_ray.filtering.eval_filters`
over a :class:`~typesense_ray.filtering.NumericIndexCache` sorted sidecar.

Ported (value-level semantics, i.e. which values a comparator matches):
test_int32_range_hundreds, test_int32_negative, test_int32_duplicates,
test_int32_million, test_int_range_byte_boundary, test_search_int64,
test_search_negative_int64, test_search_negative_int64_large,
test_int32_overlap / test_int32_array (same corpus; doc-level counts),
test_encode_float_positive, test_encode_float_positive_negative.

Dispositioned (encoding internals, not value semantics):
test_encode_int32 / test_encode_int64 assert the nibble-per-byte key
layout the ART trie needs for ordered traversal (``src/art.cpp``
encode_int32); this engine keeps numerics as native Arrow columns with a
value-sorted sidecar, so there is no byte layout to compare — the range
tests here pin the OBSERVABLE contract those encodings exist to serve.

Note on test_search_negative_int64_large: the reference's own assertions
are commented out (``art_test.cpp:1330-1334``) because its encoding makes
``-2 > 1577836800`` come back true; we assert the mathematically correct
empty result, i.e. the behavior the disabled assertions *wanted*.

Every query is evaluated twice — through the sorted-sidecar range-scan
path (NumericIndexCache) and the vectorized full-column compare fallback
— and both must agree, mirroring the reference's duplicated
art_int*_search/compare code paths.
"""

import numpy as np
import pyarrow as pa
import pytest

from typesense_ray.filtering import (
    NumericIndexCache,
    StringTokenCache,
    eval_filters,
    parse_filter,
)


def _count(values, filter_by: str, kind: str = "int",
           field: str = "v") -> int:
    """Match count for ``filter_by`` over one numeric column, asserting
    the sorted-index path ≡ the full-compare path."""
    if kind in ("int", "float") and values and isinstance(values[0], list):
        arrow_t = pa.list_(pa.int64() if kind == "int" else pa.float64())
    else:
        arrow_t = pa.int64() if kind == "int" else pa.float64()
    docs = pa.table({field: pa.array(values, arrow_t)})
    clauses = parse_filter(filter_by, {field: kind})
    m_idx = eval_filters(docs, clauses, {field: kind}, StringTokenCache(),
                         numeric_cache=NumericIndexCache())
    m_cmp = eval_filters(docs, clauses, {field: kind}, StringTokenCache())
    assert m_idx.tolist() == m_cmp.tolist(), (
        "sorted-index path disagrees with compare path for "
        f"{filter_by!r}"
    )
    return int(m_idx.sum())


def test_int32_range_hundreds():
    # art_test.cpp:968-1012 — values 100..109, pivot 106
    vals = list(range(100, 110))
    assert _count(vals, "v:106") == 1
    assert _count(vals, "v:>=106") == 4
    assert _count(vals, "v:>106") == 3
    assert _count(vals, "v:<=106") == 7
    assert _count(vals, "v:<106") == 6


def test_int32_negative():
    # art_test.cpp:1043-1092 — values -100..-1
    vals = list(range(-100, 0))
    assert _count(vals, "v:-99") == 1
    assert _count(vals, "v:>=-90") == 90
    assert _count(vals, "v:>-90") == 89
    assert _count(vals, "v:<=-99") == 2
    assert _count(vals, "v:<-99") == 1
    assert _count(vals, "v:<=-100") == 1


def test_int32_duplicates():
    # art_test.cpp:1014-1041 — 10k random values in [1900, 2018]; a
    # GREATER_THAN 0 scan must account for every inserted id (the
    # reference sums leaf id-list lengths; doc-level that is "every doc
    # matches"). Seeded (the reference uses unseeded rand(); the
    # assertion is count-only so any draw works).
    rng = np.random.default_rng(4531)
    vals = (1900 + rng.integers(0, 119, size=10_000)).tolist()
    assert _count(vals, "v:>0") == 10_000


def test_int32_million():
    # art_test.cpp:1094-1171 — values 0..999999
    vals = np.arange(1_000_000, dtype=np.int64).tolist()
    for i in range(6):
        assert _count(vals, f"v:{10 ** i}") == 1
        assert _count(vals, f"v:{10 ** i + 7}") == 1
    assert _count(vals, "v:999999") == 1
    assert _count(vals, "v:>=999995") == 5
    assert _count(vals, "v:>999995") == 4
    assert _count(vals, "v:>=999999") == 1
    assert _count(vals, "v:>=1000000") == 0
    assert _count(vals, "v:>=5") == 1_000_000 - 5
    assert _count(vals, "v:<=999995") == 999_996
    assert _count(vals, "v:<=999999") == 1_000_000
    assert _count(vals, "v:<999999") == 999_999
    assert _count(vals, "v:<=1000000") == 1_000_000
    assert _count(vals, "v:<=5") == 6
    assert _count(vals, "v:<5") == 5


def test_int_range_byte_boundary():
    # art_test.cpp:1173-1197 — 200..299 straddling the 255/256 byte edge
    vals = list(range(200, 300))
    assert _count(vals, "v:>=255") == 45
    assert _count(vals, "v:>255") == 44


def test_search_int64():
    # art_test.cpp:1234-1276 — 100 values from int32-max upward
    lmax = 2**31 - 1
    vals = list(range(lmax, lmax + 100))
    assert _count(vals, f"v:{lmax}") == 1
    assert _count(vals, f"v:>={lmax}") == 100
    assert _count(vals, f"v:>{lmax}") == 99
    assert _count(vals, f"v:>{lmax + 50}") == 49
    assert _count(vals, f"v:<{lmax + 50}") == 50


def test_search_negative_int64():
    # art_test.cpp:1277-1319 — 100 values below -(int32-max)
    lmax = -(2**31 - 1)
    vals = list(range(lmax - 100, lmax))
    assert _count(vals, f"v:{lmax - 1}") == 1
    assert _count(vals, f"v:<={lmax - 1}") == 100
    assert _count(vals, f"v:<{lmax - 50}") == 50
    assert _count(vals, f"v:>{lmax - 50}") == 49
    assert _count(vals, f"v:>={lmax - 50}") == 50


def test_search_negative_int64_large():
    # art_test.cpp:1320-1339 — the reference DISABLED these assertions
    # because its int64 encoding returns -2 for a "> 1577836800" scan;
    # we pin the correct (empty) answer the disabled assertions wanted.
    assert _count([-2], "v:>1577836800") == 0
    assert _count([-2], "v:>=1577836800") == 0
    assert _count([-2], "v:<1577836800") == 1


@pytest.mark.parametrize("filter_by,expect", [
    ("v:>2002", {0, 1, 2}),        # art_test.cpp:939-966 / 1341-1368
    ("v:>=2015", {0, 1, 2}),
    ("v:2016", {0, 1, 2}),
    ("v:<1999", {3}),
    ("v:<=2000", {3, 4}),
])
def test_int32_array_overlap(filter_by, expect):
    # test_int32_overlap / test_int32_array: five docs with int-array
    # values; the reference asserts 3 leaves match "> 2002" (values
    # 2014/2015/2016) — doc-level, a doc matches if ANY element does.
    vals = [[2014, 2015, 2016], [2015, 2016], [2016],
            [1981, 1985], [1999, 2000, 2001, 2002]]
    docs = pa.table({"v": pa.array(vals, pa.list_(pa.int64()))})
    clauses = parse_filter(filter_by, {"v": "int"})
    mask = eval_filters(docs, clauses, {"v": "int"}, StringTokenCache(),
                        numeric_cache=NumericIndexCache())
    assert set(np.flatnonzero(mask).tolist()) == expect


def test_encode_float_positive():
    # art_test.cpp:1370-1425
    vals = [0.0, 0.1044, 1.004, 1.99, 10.5678, 100.33]
    assert _count(vals, "v:0.0", kind="float") == 1
    assert _count(vals, "v:>0.0", kind="float") == 5
    assert _count(vals, "v:<10.5678", kind="float") == 4
    assert _count(vals, "v:<=10.5678", kind="float") == 5
    assert _count(vals, "v:>10.5678", kind="float") == 1
    assert _count(vals, "v:>10.4", kind="float") == 2
    assert _count(vals, "v:>=10.5678", kind="float") == 2
    assert _count(vals, "v:>=10", kind="float") == 2


def test_encode_float_positive_negative():
    # art_test.cpp:1427-1480
    vals = [-24.1033, -2.561, 0.0, 1.99, 10.5678, 100.33]
    assert _count(vals, "v:-24.1033", kind="float") == 1
    assert _count(vals, "v:<0.0", kind="float") == 2
    assert _count(vals, "v:>0.0", kind="float") == 3
    assert _count(vals, "v:<=-2.561", kind="float") == 2
    assert _count(vals, "v:>-2.561", kind="float") == 4
    assert _count(vals, "v:>=-24.1033", kind="float") == 6
    assert _count(vals, "v:>=-24", kind="float") == 5
