"""Conformance ports of the reference's override/curation suite
(``test/collection_override_test.cpp``). Int ids = reference insertion
seq_ids over ``test/multi_field_documents.jsonl``, so tie-broken hit
orders assert exactly."""

import json
import os

import pyarrow as pa
import pytest

from typesense_ray.collection import Override, RayCollection
from typesense_ray.index_build import IndexConfig, build_index

MUL_JSONL = "/root/reference/test/multi_field_documents.jsonl"

pytestmark = pytest.mark.skipif(
    not os.path.exists(MUL_JSONL),
    reason="reference corpus not available",
)


def ids(r):
    return [h["document"]["ref_id"] for h in r["hits"]]


@pytest.fixture(scope="module")
def movies_dir(ray_session, tmp_path_factory):
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
    out = str(tmp_path_factory.mktemp("ovidx"))
    cfg = IndexConfig(
        text_field="title", id_field="ref_id", sha_field=None, batch_docs=8,
        meta_fields=("ref_id", "title", "starring", "points", "cast"),
    )
    build_index(rd.from_arrow(tbl), out, cfg, concurrency=1)
    return out


@pytest.fixture()
def movies(movies_dir):
    return RayCollection(movies_dir, default_sorting_field="points")


def test_exclude_include_exact_query_match(movies):
    # CollectionOverrideTest.ExcludeIncludeExactQueryMatch (:57-170)
    movies.add_override(Override(rule_id="exclude-rule", rule_query="of",
                                 match="exact", excludes=[4, 11]))
    r = movies.search("of", mode="reference", facet_by="cast")
    assert r["found"] == 3
    assert ids(r) == [12, 5, 17]
    assert len(r["facet_counts"][0]["counts"]) == 6

    movies.add_override(Override(rule_id="include-rule", rule_query="in",
                                 match="exact",
                                 includes=[(0, 1), (3, 2)]))
    r = movies.search("in", mode="reference")
    assert r["found"] == 3
    assert ids(r) == [0, 3, 13]
    assert r["hits"][0].get("curated") is True
    assert r["hits"][1].get("curated") is True
    assert "curated" not in r["hits"][2]

    movies.remove_override("exclude-rule")
    movies.remove_override("include-rule")
    assert movies.get_overrides() == {}

    # CONTAINS rule: 'will' inside 'will smith'
    movies.add_override(Override(rule_id="include-rule",
                                 rule_query="will", match="contains",
                                 includes=[(0, 1), (1, 7)]))
    r = movies.search("will smith", mode="reference")
    assert r["found"] == 4
    assert ids(r) == [0, 3, 2, 1]


def test_exclude_include_facet_filter_query(movies):
    # CollectionOverrideTest.ExcludeIncludeFacetFilterQuery (:171-268)
    movies.add_override(Override(rule_id="include-rule",
                                 rule_query="not-found", match="exact",
                                 includes=[(0, 1), (2, 2)]))
    r = movies.search("not-found", mode="reference", facet_by="starring",
                      facet_query="starring: will")
    c0 = r["facet_counts"][0]["counts"][0]
    assert c0["value"] == "Will Ferrell"
    assert c0["highlighted"] == "<mark>Will</mark> Ferrell"
    assert c0["count"] == 1
    movies.remove_override("include-rule")

    # facet counts drop excluded docs
    movies.add_override(Override(rule_id="exclude-rule", rule_query="the",
                                 match="exact", excludes=[10]))
    r = movies.search("the", mode="reference", facet_by="starring",
                      facet_query="starring: scott")
    assert r["found"] == 9
    counts = {c["value"]: (c["count"], c["highlighted"])
              for c in r["facet_counts"][0]["counts"]}
    assert counts["Kristin Scott Thomas"] == \
        (1, "Kristin <mark>Scott</mark> Thomas")
    assert counts["Scott Glenn"] == (1, "<mark>Scott</mark> Glenn")

    # per_page = 0: counts come back with zero hits
    r = movies.search("the", mode="reference", facet_by="starring",
                      facet_query="starring: scott", per_page=0)
    assert r["found"] == 9
    assert r["hits"] == []
    movies.remove_override("exclude-rule")

    # include rule with per_page = 1
    movies.add_override(Override(rule_id="include-rule",
                                 rule_query="not-found", match="exact",
                                 includes=[(0, 1), (2, 2)]))
    r = movies.search("not-found", mode="reference", per_page=1)
    assert r["found"] == 2
    assert ids(r) == [0]

    # same-id add replaces the stored rule
    movies.add_override(Override(rule_id="include-rule",
                                 rule_query="found", match="exact",
                                 includes=[(0, 1), (2, 2)]))
    assert movies.get_overrides()["include-rule"].rule_query == "found"
    assert len(movies.overrides) == 1


def test_pinned_hits_smaller_than_page_size(movies):
    # CollectionOverrideTest.PinnedHitsSmallerThanPageSize (:353-393)
    r = movies.search("the", mode="reference", per_page=8,
                      pinned_hits="17:1,13:4,11:3")
    assert r["found"] == 10
    assert ids(r) == [17, 16, 11, 13, 6, 8, 1, 0]
    r = movies.search("the", mode="reference", per_page=8, page=2,
                      pinned_hits="17:1,13:4,11:3")
    assert r["found"] == 10
    assert ids(r) == [10, 4]


def test_pinned_hits_larger_than_page_size(movies):
    # CollectionOverrideTest.PinnedHitsLargerThanPageSize (:394-435)
    pins = "6:1,1:2,16:3,11:4"
    for page, expect in ((1, [6, 1]), (2, [16, 11]), (3, [8, 0])):
        r = movies.search("the", mode="reference", per_page=2, page=page,
                          pinned_hits=pins)
        assert r["found"] == 10
        assert ids(r) == expect


def test_pinned_hits_when_not_enough_results(movies):
    # CollectionOverrideTest.PinnedHitsWhenThereAreNotEnoughResults
    # (:436-470)
    pins = "6:1,1:2,11:5"
    r = movies.search("notfoundquery", mode="reference", pinned_hits=pins)
    assert r["found"] == 3
    assert ids(r) == [6, 1, 11]

    r = movies.search("burgundy", mode="reference", pinned_hits=pins)
    assert r["found"] == 4
    assert ids(r) == [6, 1, 0, 11]


def test_pinned_hits_grouping(movies):
    # CollectionOverrideTest.PinnedHitsGrouping (:471-523)
    pins = "6:1,8:1,1:2,13:3,4:3"
    # ungrouped: only the FIRST id at a position is pinned; the others
    # keep their organic spots
    r = movies.search("the", mode="reference", per_page=50,
                      pinned_hits=pins)
    assert r["found"] == 10
    assert ids(r)[:4] == [6, 1, 13, 11]
    assert r["hits"][0].get("curated") is True
    assert r["hits"][1].get("curated") is True
    assert r["hits"][2].get("curated") is True
    assert "curated" not in r["hits"][3]

    # grouped: pinned docs head their groups, pinned groups lead
    r = movies.search("the", mode="reference", per_page=50,
                      pinned_hits=pins, group_by="cast", group_limit=2)
    assert r["found"] == 8
    g = r["grouped_hits"]
    assert g[0]["group_key"] == [("Chris Evans", "Scarlett Johansson")]
    gi = lambda i: [h["document"]["ref_id"] for h in g[i]["hits"]]
    assert gi(0) == [6, 8]
    assert gi(1)[0] == 1
    assert gi(2) == [13, 4]
    assert gi(3)[0] == 11
    assert gi(4)[0] == 16


def test_pinned_hits_with_wildcard_query(ray_session, tmp_path):
    # CollectionOverrideTest.PinnedHitsWithWildCardQuery (:524-568)
    import ray.data as rd

    n = 311
    tbl = pa.table(
        {
            "ref_id": pa.array(range(n), pa.int64()),
            "title": pa.array([f"Title {i}" for i in range(n)]),
            "points": pa.array(range(n), pa.int64()),
        }
    )
    out = str(tmp_path / "wild")
    cfg = IndexConfig(
        text_field="title", id_field="ref_id", sha_field=None,
        batch_docs=128, meta_fields=("ref_id", "title", "points"),
    )
    build_index(rd.from_arrow(tbl), out, cfg, concurrency=1)
    coll = RayCollection(out, default_sorting_field="points")

    r = coll.search("*", mode="reference", per_page=30, page=11,
                    pinned_hits="7:1,4:2")
    assert r["found"] == 311
    assert len(r["hits"]) == 11
    assert ids(r) == [12, 11, 10, 9, 8, 6, 5, 3, 2, 1, 0]


def test_pinned_hits_ids_having_colon(ray_session, tmp_path):
    # CollectionOverrideTest.PinnedHitsIdsHavingColon (:569-614): string
    # user ids containing ':' — pinned_hits splits on the LAST colon and
    # resolves through the string-key hash
    import ray.data as rd

    urls = [f"https://example.com/{i}" for i in range(1, 11)]
    tbl = pa.table(
        {
            "url": pa.array(urls),
            "points": pa.array(range(1, 11), pa.int64()),
        }
    )
    out = str(tmp_path / "colonids")
    cfg = IndexConfig(
        text_field="url", id_field="url", sha_field=None, batch_docs=16,
        meta_fields=("url", "points"),
    )
    build_index(rd.from_arrow(tbl), out, cfg, concurrency=1)
    coll = RayCollection(out, default_sorting_field="points")

    r = coll.search(
        "*", mode="reference", per_page=25, sort_by="points:desc",
        pinned_hits="https://example.com/1:1, https://example.com/3:2",
    )
    assert r["found"] == 10
    got = [h["document"]["url"] for h in r["hits"]]
    assert got[0] == "https://example.com/1"
    assert got[1] == "https://example.com/3"
    assert got[2] == "https://example.com/10"
    assert got[3] == "https://example.com/9"
    assert got[9] == "https://example.com/2"
