"""Numeric range-search conformance ports from the reference's ART
numeric suite (``test/art_test.cpp`` ``test_int32_*`` /
``test_search_int64`` / ``test_search_negative_int64*`` /
``test_encode_float_*`` / ``test_int_range_byte_boundary``).

The reference encodes numbers big-endian into an ART trie and range-scans
it (``src/art.cpp`` ``art_int32_search``); this engine keeps a per-segment
value-sorted numeric sidecar (``filtering.NumericIndexCache``,
``include/num_tree.h`` role) and answers every comparator with a
``searchsorted`` range scan.  The observable contract is identical — the
set of matching documents per (value, comparator) — so each reference
case is asserted at that level: small corpora end-to-end through
``RayCollection.search(filter_by=...)``, the scale cases (one million
distinct values, byte-boundary ranges) directly against the sorted-index
layer the search path uses.
"""

import numpy as np
import pyarrow as pa
import pytest

from typesense_ray.collection import RayCollection
from typesense_ray.filtering import (
    NumericIndexCache,
    _numeric_mask_sorted,
    parse_filter,
)
from typesense_ray.index_build import IndexConfig, build_index

I32MAX = 2**31 - 1


def _mask(tbl: pa.Table, filter_by: str, kind: str) -> np.ndarray:
    """Run one numeric clause through parse_filter + the sorted-index
    range scan (the exact objects the search path uses)."""
    field = filter_by.split(":")[0]
    clauses = parse_filter(filter_by, {field: kind})
    assert len(clauses) == 1
    return _numeric_mask_sorted(
        tbl, clauses[0], kind, NumericIndexCache(), tbl.num_rows
    )


def _ids(tbl: pa.Table, filter_by: str, kind: str) -> set[int]:
    return set(np.flatnonzero(_mask(tbl, filter_by, kind)).tolist())


# ---------------------------------------------------------------- scale


def test_int32_hundreds_range():
    # ArtTest.test_int32_range_hundreds (:968-1012): values 100..109,
    # every comparator around 106
    tbl = pa.table({"v": pa.array(range(100, 110), pa.int64())})
    assert len(_ids(tbl, "v:106", "int")) == 1
    assert len(_ids(tbl, "v:>=106", "int")) == 4
    assert len(_ids(tbl, "v:>106", "int")) == 3
    assert len(_ids(tbl, "v:<=106", "int")) == 7
    assert len(_ids(tbl, "v:<106", "int")) == 6


def test_int32_byte_boundary():
    # ArtTest.test_int_range_byte_boundary (:1173-1197): 200..299, the
    # range straddles the 255/256 big-endian byte carry the trie has to
    # handle; the sorted index must see the same counts
    tbl = pa.table({"v": pa.array(range(200, 300), pa.int64())})
    assert len(_ids(tbl, "v:>=255", "int")) == 45
    assert len(_ids(tbl, "v:>255", "int")) == 44


def test_int32_negative():
    # ArtTest.test_int32_negative (:1043-1092): values -100..-1
    tbl = pa.table({"v": pa.array(range(-100, 0), pa.int64())})
    assert len(_ids(tbl, "v:-99", "int")) == 1
    assert len(_ids(tbl, "v:>=-90", "int")) == 90
    assert len(_ids(tbl, "v:>-90", "int")) == 89
    assert len(_ids(tbl, "v:<=-99", "int")) == 2
    assert len(_ids(tbl, "v:<-99", "int")) == 1


def test_int32_duplicates_count_docs_once():
    # ArtTest.test_int32_duplicates (:1014-1041): 10k docs over ~119
    # distinct values; an open range must return every doc exactly once
    rng = np.random.RandomState(7)
    vals = 1900 + rng.randint(0, 119, size=10_000)
    tbl = pa.table({"v": pa.array(vals, pa.int64())})
    m = _mask(tbl, "v:>0", "int")
    assert int(m.sum()) == 10_000


def test_int32_million():
    # ArtTest.test_int32_million (:1094-1171): 0..1M-1, point lookups at
    # every power of ten and range scans at the top end
    tbl = pa.table({"v": pa.array(np.arange(1_000_000, dtype=np.int64))})
    cache = NumericIndexCache()

    def ids(fb):
        cl = parse_filter(fb, {"v": "int"})[0]
        return _numeric_mask_sorted(tbl, cl, "int", cache, tbl.num_rows)

    for i in range(6):
        assert int(ids(f"v:{10 ** i}").sum()) == 1
        assert int(ids(f"v:{10 ** i + 7}").sum()) == 1
    assert int(ids("v:999999").sum()) == 1
    assert int(ids("v:>=999995").sum()) == 5
    assert int(ids("v:>999995").sum()) == 4
    assert int(ids("v:<5").sum()) == 5
    assert int(ids("v:<=5").sum()) == 6


def test_search_int64_above_int32max():
    # ArtTest.test_search_int64 (:1234-1275): 100 values starting at
    # INT32_MAX — the 8-byte encoding boundary in the reference
    tbl = pa.table({"v": pa.array(range(I32MAX, I32MAX + 100), pa.int64())})
    assert len(_ids(tbl, f"v:{I32MAX}", "int")) == 1
    assert len(_ids(tbl, f"v:>={I32MAX}", "int")) == 100
    assert len(_ids(tbl, f"v:>{I32MAX}", "int")) == 99
    assert len(_ids(tbl, f"v:>{I32MAX + 50}", "int")) == 49
    assert len(_ids(tbl, f"v:<{I32MAX + 50}", "int")) == 50


def test_search_negative_int64():
    # ArtTest.test_search_negative_int64 (:1277-1318): 100 values ending
    # at -INT32_MAX
    lo = -I32MAX
    tbl = pa.table({"v": pa.array(range(lo - 100, lo), pa.int64())})
    assert len(_ids(tbl, f"v:{lo - 1}", "int")) == 1
    assert len(_ids(tbl, f"v:<={lo - 1}", "int")) == 100
    assert len(_ids(tbl, f"v:<{lo - 50}", "int")) == 50
    assert len(_ids(tbl, f"v:>{lo - 50}", "int")) == 49
    assert len(_ids(tbl, f"v:>={lo - 50}", "int")) == 50


def test_negative_value_open_range_excluded():
    # ArtTest.test_search_negative_int64_large (:1320-1339): a single -2
    # must NOT match ``> 1577836800`` (sign handling in the encoding)
    tbl = pa.table({"v": pa.array([-2], pa.int64())})
    assert _ids(tbl, "v:>1577836800", "int") == set()


def test_float_positive():
    # ArtTest.test_encode_float_positive (:1370-1425)
    floats = [0.0, 0.1044, 1.004, 1.99, 10.5678, 100.33]
    tbl = pa.table({"v": pa.array(floats, pa.float64())})
    assert len(_ids(tbl, "v:0.0", "float")) == 1
    assert len(_ids(tbl, "v:>0.0", "float")) == 5
    assert len(_ids(tbl, "v:<10.5678", "float")) == 4
    assert len(_ids(tbl, "v:<=10.5678", "float")) == 5
    assert len(_ids(tbl, "v:>10.5678", "float")) == 1
    assert len(_ids(tbl, "v:>10.4", "float")) == 2
    assert len(_ids(tbl, "v:>=10.5678", "float")) == 2
    assert len(_ids(tbl, "v:>=10", "float")) == 2


def test_float_positive_negative():
    # ArtTest.test_encode_float_positive_negative (:1427-1478)
    floats = [-24.1033, -2.561, 0.0, 1.99, 10.5678, 100.33]
    tbl = pa.table({"v": pa.array(floats, pa.float64())})
    assert len(_ids(tbl, "v:-24.1033", "float")) == 1
    assert len(_ids(tbl, "v:<0.0", "float")) == 2
    assert len(_ids(tbl, "v:>0.0", "float")) == 3
    assert len(_ids(tbl, "v:<=-2.561", "float")) == 2
    assert len(_ids(tbl, "v:>-2.561", "float")) == 4
    assert len(_ids(tbl, "v:>=-24.1033", "float")) == 6
    assert len(_ids(tbl, "v:>=-24", "float")) == 5


# ------------------------------------------------- end-to-end array case


@pytest.fixture(scope="module")
def years_coll(ray_session, tmp_path_factory):
    """The test_int32_overlap/test_int32_array corpus (:939-966,
    :1341-1368): 5 docs with int-array ``years``, searched end-to-end."""
    import ray.data as rd

    values = [
        [2014, 2015, 2016],
        [2015, 2016],
        [2016],
        [1981, 1985],
        [1999, 2000, 2001, 2002],
    ]
    tbl = pa.table(
        {
            "ref_id": pa.array([str(i) for i in range(len(values))]),
            "name": pa.array([f"doc {i}" for i in range(len(values))]),
            "points": pa.array(range(len(values)), pa.int64()),
            "years": pa.array(values, pa.list_(pa.int64())),
        }
    )
    out = str(tmp_path_factory.mktemp("artyears"))
    cfg = IndexConfig(
        text_field="name", id_field="ref_id", sha_field=None, batch_docs=8,
        meta_fields=("ref_id", "name", "points", "years"),
    )
    build_index(rd.from_arrow(tbl), out, cfg, concurrency=1)
    from typesense_ray.typo import build_term_max_static, build_typo_table

    build_typo_table(out)
    build_term_max_static(out, "points")
    return RayCollection(out, default_sorting_field="points")


def test_int32_array_overlap_search(years_coll):
    # >2002 hits the leaves {2014, 2015, 2016}, all owned by docs 0-2;
    # doc 4's {1999..2002} is excluded (2002 is not > 2002)
    r = years_coll.search("*", filter_by="years:>2002", per_page=10)
    assert {h["document"]["ref_id"] for h in r["hits"]} == {"0", "1", "2"}
    assert r["found"] == 3

    r = years_coll.search("*", filter_by="years:>=2002", per_page=10)
    assert {h["document"]["ref_id"] for h in r["hits"]} == {"0", "1", "2", "4"}

    r = years_coll.search("*", filter_by="years:<1999", per_page=10)
    assert {h["document"]["ref_id"] for h in r["hits"]} == {"3"}

    r = years_coll.search("*", filter_by="years:2016", per_page=10)
    assert {h["document"]["ref_id"] for h in r["hits"]} == {"0", "1", "2"}
