"""Conformance ports of the reference's sorting suite
(``test/collection_sorting_test.cpp``) not already covered by
``test_collection.py`` (SortOnFloatFields, ThreeSortFieldsLimit live
there): explicit asc/desc orders over the multi_field corpus, int64
sort exactness, default-sorting-field validation, negative int64
filters.

Int ids = reference insertion seq_ids, so tie-broken orders assert
exactly."""

import json
import os

import pyarrow as pa
import pytest

from typesense_ray.collection import RayCollection
from typesense_ray.index_build import IndexConfig, build_index

MUL_JSONL = "/root/reference/test/multi_field_documents.jsonl"

pytestmark = pytest.mark.skipif(
    not os.path.exists(MUL_JSONL),
    reason="reference corpus not available",
)


def ids(r):
    return [h["document"]["ref_id"] for h in r["hits"]]


@pytest.fixture(scope="module")
def movies(ray_session, tmp_path_factory):
    import ray.data as rd

    docs = [json.loads(line) for line in open(MUL_JSONL)]
    tbl = pa.table(
        {
            "ref_id": pa.array(range(len(docs)), pa.int64()),
            "title": pa.array([d["title"] for d in docs]),
            "starring": pa.array([d["starring"] for d in docs]),
            "points": pa.array([int(d["points"]) for d in docs],
                               pa.int64()),
            "cast": pa.array([d["cast"] for d in docs],
                             pa.list_(pa.string())),
        }
    )
    out = str(tmp_path_factory.mktemp("sortidx"))
    cfg = IndexConfig(
        text_field="title", id_field="ref_id", sha_field=None, batch_docs=8,
        meta_fields=("ref_id", "title", "starring", "points", "cast"),
    )
    build_index(rd.from_arrow(tbl), out, cfg, concurrency=1)
    return RayCollection(out, default_sorting_field="points")


def test_sorting_order(movies):
    # CollectionSortingTest.SortingOrder (:37-119)
    r = movies.search("the", mode="reference", sort_by="points:asc",
                      per_page=15)
    assert len(r["hits"]) == 10
    assert ids(r) == [17, 13, 10, 4, 0, 1, 8, 6, 16, 11]

    # direction keyword is case-insensitive; per_page trims
    r = movies.search("the", mode="reference", sort_by="points:ASC",
                      per_page=5)
    assert ids(r) == [17, 13, 10, 4, 0]

    r = movies.search("the", mode="reference", sort_by="points:dEsc",
                      per_page=15)
    assert ids(r) == [11, 16, 6, 8, 1, 0, 10, 4, 13, 17]

    # empty sort_by → (text match, default sorting field desc)
    r = movies.search("of", mode="reference", per_page=10)
    assert len(r["hits"]) == 5
    assert ids(r) == [11, 12, 5, 4, 17]


def test_int64_sorting_is_exact(ray_session, tmp_path):
    # CollectionSortingTest.Int64AsDefaultSortingField (:144-198):
    # adjacent huge int64s must not collapse (float64 keys would merge
    # values 343234324234233231..35, whose gaps are below the 2^53 ULP)
    import ray.data as rd

    pts = [343234324234233234, 343234324234233232,
           343234324234233235, 343234324234233231]
    tbl = pa.table(
        {
            "ref_id": pa.array(range(4), pa.int64()),
            "title": pa.array(["foo"] * 4),
            "points": pa.array(pts, pa.int64()),
        }
    )
    out = str(tmp_path / "bigint")
    cfg = IndexConfig(
        text_field="title", id_field="ref_id", sha_field=None, batch_docs=8,
        meta_fields=("ref_id", "title", "points"),
    )
    build_index(rd.from_arrow(tbl), out, cfg, concurrency=1)
    coll = RayCollection(out, default_sorting_field="points")

    r = coll.search("foo", mode="reference", sort_by="points:asc")
    assert ids(r) == [3, 1, 0, 2]
    r = coll.search("foo", mode="reference", sort_by="points:desc")
    assert ids(r) == [2, 0, 1, 3]


def test_default_sorting_field_validations(movies):
    # CollectionSortingTest.DefaultSortingFieldValidations (:121-143)
    idx = movies._local.index_dir
    with pytest.raises(ValueError, match="single valued numerical"):
        RayCollection(idx, default_sorting_field="title")
    with pytest.raises(ValueError, match="not found in the schema"):
        RayCollection(idx, default_sorting_field="NOT-DEFINED")
    with pytest.raises(ValueError, match="single valued numerical"):
        RayCollection(idx, default_sorting_field="cast")  # array field


def test_negative_int64_value(ray_session, tmp_path):
    # CollectionSortingTest.NegativeInt64Value (:312-342)
    import ray.data as rd

    tbl = pa.table(
        {
            "ref_id": pa.array([100], pa.int64()),
            "title": pa.array(["The quick brown fox"]),
            "points": pa.array([-2678400], pa.int64()),
        }
    )
    out = str(tmp_path / "negint")
    cfg = IndexConfig(
        text_field="title", id_field="ref_id", sha_field=None, batch_docs=8,
        meta_fields=("ref_id", "title", "points"),
    )
    build_index(rd.from_arrow(tbl), out, cfg, concurrency=1)
    coll = RayCollection(out, default_sorting_field="points")

    r = coll.search("*", mode="reference", sort_by="points:desc",
                    filter_by="points:>=1577836800")
    assert r["found"] == 0
    # and the negative value itself is filterable
    r = coll.search("*", mode="reference", filter_by="points:<0")
    assert r["found"] == 1
