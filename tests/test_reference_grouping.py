"""Conformance ports of the reference's grouping suite
(``test/collection_grouping_test.cpp``), run over the reference's own
``test/group_documents.jsonl`` corpus (12 docs, optional ``brand``).

Doc ids are the jsonl line numbers as INT64 ids, so the engine's
internal ids equal the reference's insertion seq_ids and every
tie-broken order (larger id first) is asserted exactly."""

import json
import os

import pyarrow as pa
import pytest

from typesense_ray.collection import Override, RayCollection
from typesense_ray.index_build import IndexConfig, build_index

GRP_JSONL = "/root/reference/test/group_documents.jsonl"

pytestmark = pytest.mark.skipif(
    not os.path.exists(GRP_JSONL),
    reason="reference corpus not available",
)


@pytest.fixture(scope="module")
def group_dir(ray_session, tmp_path_factory):
    import ray.data as rd

    docs = [json.loads(line) for line in open(GRP_JSONL)]
    tbl = pa.table(
        {
            "ref_id": pa.array(range(len(docs)), pa.int64()),
            "title": pa.array([d["title"] for d in docs]),
            "brand": pa.array([d.get("brand") for d in docs]),
            "size": pa.array([d["size"] for d in docs], pa.int64()),
            "colors": pa.array([d["colors"] for d in docs],
                               pa.list_(pa.string())),
            "rating": pa.array([d["rating"] for d in docs], pa.float64()),
        }
    )
    out = str(tmp_path_factory.mktemp("groupidx"))
    cfg = IndexConfig(
        text_field="title", id_field="ref_id", sha_field=None, batch_docs=8,
        meta_fields=("ref_id", "title", "brand", "size", "colors",
                     "rating"),
    )
    build_index(rd.from_arrow(tbl), out, cfg, concurrency=1)
    return out


@pytest.fixture(scope="module")
def gcoll(group_dir):
    return RayCollection(group_dir, default_sorting_field="rating")


def gids(res, gi):
    return [h["document"]["ref_id"] for h in res["grouped_hits"][gi]["hits"]]


def gkeys(res):
    return [g["group_key"] for g in res["grouped_hits"]]


def test_grouping_basics(gcoll):
    # CollectionGroupingTest.GroupingBasics (:62-143) — group by int
    res = gcoll.search("*", mode="reference", facet_by="brand",
                       group_by="size", group_limit=2, per_page=50)
    assert res["found"] == 3
    assert len(res["grouped_hits"]) == 3
    assert res["grouped_hits"][0]["group_key"] == [11]
    assert gids(res, 0) == [5, 1]
    assert gids(res, 1) == [4, 3]
    assert gids(res, 2) == [2, 8]
    fc = {c["value"]: c["count"]
          for c in res["facet_counts"][0]["counts"]}
    assert fc == {"Beta": 3, "Omega": 3, "Xorp": 2, "Zeta": 1}

    # group by rating (float) + sort by size + facet_query
    res = gcoll.search("*", mode="reference", facet_by="brand",
                       facet_query="brand: omeg", sort_by="size:desc",
                       group_by="rating", group_limit=2, per_page=50)
    assert res["found"] == 7
    assert len(res["grouped_hits"]) == 7
    assert res["grouped_hits"][0]["group_key"] == [pytest.approx(4.4)]
    assert res["grouped_hits"][0]["hits"][0]["document"]["size"] == 12
    assert gids(res, 0) == [8]


def test_grouping_compound_key(gcoll):
    # CollectionGroupingTest.GroupingCompoundKey (:145-249)
    res = gcoll.search("*", mode="reference", facet_by="brand",
                       group_by="size,brand", group_limit=2, per_page=50)
    assert res["found"] == 10
    assert len(res["grouped_hits"]) == 10
    assert res["grouped_hits"][0]["group_key"] == [11, "Beta"]
    # docs without the optional brand get a 1-component key
    assert res["grouped_hits"][5]["group_key"] == [10]
    assert gids(res, 5) == [10, 11]

    assert gids(res, 0) == [5]
    assert gids(res, 1) == [4]
    assert gids(res, 2) == [3, 0]

    fc = {c["value"]: c["count"]
          for c in res["facet_counts"][0]["counts"]}
    assert fc == {"Beta": 3, "Omega": 3, "Xorp": 2, "Zeta": 1}

    # pagination: page 2 of per_page=2 starts at the 3rd group
    res = gcoll.search("*", mode="reference", facet_by="brand",
                       group_by="size,brand", group_limit=2,
                       per_page=2, page=2)
    assert res["found"] == 10
    assert len(res["grouped_hits"]) == 2
    assert res["grouped_hits"][0]["group_key"] == [10, "Omega"]
    assert gids(res, 0) == [3, 0]
    fc = {c["value"]: c["count"]
          for c in res["facet_counts"][0]["counts"]}
    assert fc == {"Beta": 3, "Omega": 3, "Xorp": 2, "Zeta": 1}

    # group_limit bounds are request errors (1..99)
    for bad in (0, 100):
        with pytest.raises(ValueError):
            gcoll.search("*", mode="reference", group_by="rating",
                         group_limit=bad)


def test_grouping_with_multi_field_relevance(ray_session, tmp_path):
    # CollectionGroupingTest.GroupingWithMultiFieldRelevance (:251-314)
    import ray.data as rd

    records = [
        ("Train or Highway", "Gord Downie", "rock"),
        ("Down There by the Train", "Dustin Kensrue", "pop"),
        ("In the Train", "Dustin Kensrue", "pop"),
        ("State Trooper", "Dustin Kensrue", "country"),
        ("Down There Somewhere", "Dustin Kensrue", "pop"),
        ("Down There by the Train", "Gord Downie", "rock"),
        ("Down and Outside", "Gord Downie", "rock"),
        ("Let it be", "Downie Kensrue", "country"),
        ("There was a Train", "Gord Kensrue", "country"),
    ]
    tbl = pa.table(
        {
            "ref_id": pa.array(range(len(records)), pa.int64()),
            "title": pa.array([r[0] for r in records]),
            "artist": pa.array([r[1] for r in records]),
            "genre": pa.array([r[2] for r in records]),
            "points": pa.array(list(range(len(records))), pa.int64()),
        }
    )
    out = str(tmp_path / "songs")
    cfg = IndexConfig(
        text_field="title", id_field="ref_id", sha_field=None, batch_docs=16,
        meta_fields=("ref_id", "title", "artist", "genre", "points"),
        indexed_fields=("artist",),
    )
    build_index(rd.from_arrow(tbl), out, cfg, concurrency=1)
    coll = RayCollection(out, default_sorting_field="points")

    res = coll.search("Dustin Kensrue Down There by the Train",
                      mode="reference", query_by=["title", "artist"],
                      group_by="genre", group_limit=2, per_page=10)
    assert res["found"] == 3
    assert gkeys(res) == [["pop"], ["rock"], ["country"]]
    assert gids(res, 0) == [1, 4]
    assert gids(res, 1) == [5]
    assert gids(res, 2) == [8, 3]


def test_grouping_with_group_limit_of_one(gcoll):
    # CollectionGroupingTest.GroupingWithGropLimitOfOne (:316-344)
    res = gcoll.search("*", mode="reference", facet_by="brand",
                       group_by="brand", group_limit=1, per_page=50)
    assert res["found"] == 5
    assert len(res["grouped_hits"]) == 5
    assert all(len(g["hits"]) == 1 for g in res["grouped_hits"])
    assert [gids(res, i)[0] for i in range(5)] == [5, 3, 8, 10, 9]
    # every brand value (incl. none) spans exactly 1 group
    assert all(c["count"] == 1
               for c in res["facet_counts"][0]["counts"])


def test_grouping_with_array_field_and_override(group_dir):
    # CollectionGroupingTest.GroupingWithArrayFieldAndOverride (:346-425):
    # include-pinned docs move to the head of their own group, the pinned
    # group moves first; excluded docs drop from their groups
    coll = RayCollection(
        group_dir, default_sorting_field="rating",
        overrides=[
            Override(rule_query="shirt", match="exact",
                     includes=[(11, 1), (10, 1)], excludes=[2]),
        ],
    )
    res = coll.search("shirt", mode="reference", facet_by="brand",
                      group_by="colors", group_limit=2, per_page=50)
    assert res["found"] == 4
    assert len(res["grouped_hits"]) == 4
    assert res["grouped_hits"][0]["group_key"] == [("white",)]
    assert gids(res, 0) == [11, 10]
    assert gids(res, 1) == [5, 3]
    assert gids(res, 2) == [4, 0]
    assert gids(res, 3) == [8]

    fc = {c["value"]: c["count"]
          for c in res["facet_counts"][0]["counts"]}
    assert fc == {"Beta": 2, "Xorp": 2, "Omega": 2, "Zeta": 1}
