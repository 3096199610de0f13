"""Conformance ports of the reference's faceting suite
(``test/collection_faceting_test.cpp``): exact string filters on
faceted fields, facet counts with filters / facet_query (typo + prefix
tolerant on every kind), numeric/bool facet value highlighting, and
facet stats.

Where the reference's asserted value ORDER depends on its internal hash
iteration (equal counts), sets/dicts are asserted instead — the engine's
tie-break (value asc) is deterministic but intentionally different."""

import json
import os

import pyarrow as pa
import pytest

from typesense_ray.collection import RayCollection
from typesense_ray.index_build import IndexConfig, build_index

NUM_JSONL = "/root/reference/test/numeric_array_documents.jsonl"
MUL_JSONL = "/root/reference/test/multi_field_documents.jsonl"
FLT_JSONL = "/root/reference/test/float_documents.jsonl"

pytestmark = pytest.mark.skipif(
    not os.path.exists(NUM_JSONL),
    reason="reference corpus not available",
)


def ids(r):
    return [h["document"]["ref_id"] for h in r["hits"]]


def counts_of(r, i=0):
    return {c["value"]: c["count"] for c in r["facet_counts"][i]["counts"]}


def hl_of(r, i=0):
    return {c["value"]: c.get("highlighted")
            for c in r["facet_counts"][i]["counts"]}


@pytest.fixture(scope="module")
def facet_coll(ray_session, tmp_path_factory):
    """numeric_array corpus + the suite's patched ``name_facet`` copy."""
    import ray.data as rd

    docs = []
    for i, line in enumerate(open(NUM_JSONL)):
        d = json.loads(line)
        docs.append(
            {"ref_id": str(i), "name": d["name"], "name_facet": d["name"],
             "age": d["age"], "years": d["years"],
             "timestamps": d["timestamps"], "tags": d["tags"],
             "rating": d["rating"]}
        )
    tbl = pa.table(
        {
            "ref_id": pa.array([d["ref_id"] for d in docs]),
            "name": pa.array([d["name"] for d in docs]),
            "name_facet": pa.array([d["name_facet"] for d in docs]),
            "age": pa.array([d["age"] for d in docs], pa.int64()),
            "years": pa.array([d["years"] for d in docs],
                              pa.list_(pa.int64())),
            "timestamps": pa.array([d["timestamps"] for d in docs],
                                   pa.list_(pa.int64())),
            "tags": pa.array([d["tags"] for d in docs],
                             pa.list_(pa.string())),
            "rating": pa.array([d["rating"] for d in docs], pa.float64()),
        }
    )
    out = str(tmp_path_factory.mktemp("facetidx"))
    cfg = IndexConfig(
        text_field="name", id_field="ref_id", sha_field=None, batch_docs=8,
        meta_fields=("ref_id", "name", "name_facet", "age", "years",
                     "timestamps", "tags", "rating"),
    )
    build_index(rd.from_arrow(tbl), out, cfg, concurrency=1)
    return RayCollection(out, default_sorting_field="age")


def test_facet_field_string_array_filtering(facet_coll):
    # CollectionFacetingTest.FacetFieldStringArrayFiltering (:101-181):
    # ':=' on a string[] needs the FULL value verbatim; plain ':' is a
    # token-contains match; IN-lists OR exact values
    def found(filter_by):
        return facet_coll.search("jeremy", mode="reference",
                                 filter_by=filter_by, facet_by="tags",
                                 sort_by="age:desc")["found"]

    assert found("tags:= PLATINUM") == 0
    assert found("tags:= FINE") == 0
    assert found("tags:= FFINE PLATINUM") == 0
    assert found("tags: PLATINUM") == 1
    assert found("tags: FINE") == 1
    assert found("tags:= FINE PLATINUM") == 1
    assert found("tags:= [Gold, bronze]") == 3
    assert found("tags:= [Gold, bronze, fine PLATINUM]") == 4
    assert found("tags:= [fine PLATINUM]") == 1


def test_facet_counts(facet_coll):
    # CollectionFacetingTest.FacetCounts (:183-472)
    r = facet_coll.search("jeremy", mode="reference", facet_by="tags",
                          sort_by="age:desc")
    assert r["found"] == 5
    fc = r["facet_counts"][0]
    assert fc["field_name"] == "tags"
    assert counts_of(r) == {"gold": 3, "silver": 3, "bronze": 2,
                            "FINE PLATINUM": 1}
    assert "stats" not in fc

    # facet count limit keeps the two count-3 values
    r = facet_coll.search("jeremy", mode="reference", facet_by="tags",
                          sort_by="age:desc", max_facet_values=2)
    assert counts_of(r) == {"gold": 3, "silver": 3}

    # two facets; the scalar facet value is the STORED raw string
    r = facet_coll.search("jeremy", mode="reference",
                          facet_by="tags,name_facet", sort_by="age:desc")
    assert r["facet_counts"][0]["field_name"] == "tags"
    assert r["facet_counts"][1]["field_name"] == "name_facet"
    assert counts_of(r, 1) == {"Jeremy Howard": 5}

    # facets respect filters (and wildcard queries)
    for q in ("jeremy", "*"):
        r = facet_coll.search(q, mode="reference", facet_by="tags",
                              filter_by="age: >24", sort_by="age:desc")
        assert r["found"] == 3
        assert counts_of(r) == {"silver": 2, "gold": 1, "bronze": 1,
                                "FINE PLATINUM": 1}

    # facet_query with a typo ('sliver' → silver)
    r = facet_coll.search("*", mode="reference", facet_by="tags",
                          facet_query=" tags : sliver", sort_by="age:desc")
    assert r["found"] == 5
    assert counts_of(r) == {"silver": 3}

    # two-token facet query; token matched anywhere in the value
    for fq in ("tags: fine pltinum", "tags: fine", "tags: pltinum"):
        r = facet_coll.search("*", mode="reference", facet_by="tags",
                              facet_query=fq, sort_by="age:desc")
        assert counts_of(r) == {"FINE PLATINUM": 1}

    # facet query on an integer field, with prefix highlighting
    r = facet_coll.search("*", mode="reference", facet_by="age",
                          facet_query="age: 2", sort_by="age:desc")
    fc = r["facet_counts"][0]
    assert fc["field_name"] == "age"
    assert [(c["value"], c["count"], c["highlighted"])
            for c in fc["counts"]] == [
        (21, 1, "<mark>2</mark>1"), (24, 1, "<mark>2</mark>4")]

    # float facet stats (accumulated over ALL matched docs)
    r = facet_coll.search("*", mode="reference", facet_by="rating",
                          sort_by="age:desc")
    st = r["facet_counts"][0]["stats"]
    assert st["min"] == pytest.approx(0.0)
    assert st["max"] == pytest.approx(9.999, rel=1e-4)
    assert st["sum"] == pytest.approx(24.401, rel=1e-4)
    assert st["avg"] == pytest.approx(4.8802, rel=1e-4)

    # facet query on a float field — stats unaffected by the filter
    r = facet_coll.search("*", mode="reference", facet_by="rating",
                          facet_query="rating: 7", sort_by="age:desc")
    fc = r["facet_counts"][0]
    assert [(c["value"], c["count"], c["highlighted"])
            for c in fc["counts"]] == [(7.812, 1, "<mark>7</mark>.812")]
    assert fc["stats"]["sum"] == pytest.approx(24.401, rel=1e-4)

    # facet query on an int64 ARRAY field, stats over array elements
    r = facet_coll.search("*", mode="reference", facet_by="timestamps",
                          facet_query="timestamps: 142189002",
                          sort_by="age:desc")
    fc = r["facet_counts"][0]
    assert [(c["value"], c["count"], c["highlighted"])
            for c in fc["counts"]] == [
        (1421890022, 2, "<mark>142189002</mark>2")]
    assert fc["stats"]["min"] == pytest.approx(348974822.0)
    assert fc["stats"]["max"] == pytest.approx(1453426022.0)
    assert fc["stats"]["sum"] == pytest.approx(13275854664.0)
    assert fc["stats"]["avg"] == pytest.approx(1106321222.0)

    # facet query matching no indexed value: empty counts, field present
    r = facet_coll.search("*", mode="reference", facet_by="tags",
                          facet_query=" tags : notfound", sort_by="age:desc")
    assert r["found"] == 5
    assert r["facet_counts"][0]["field_name"] == "tags"
    assert r["facet_counts"][0]["counts"] == []


def test_facet_counts_bool(ray_session, tmp_path):
    # CollectionFacetingTest.FacetCountsBool (:474-528): bool facet
    # values render as 'true'/'false' strings, no stats entry
    import ray.data as rd

    tbl = pa.table(
        {
            "ref_id": pa.array(["100", "101", "102"]),
            "title": pa.array(["Ford Mustang", "Tesla Model S",
                               "Chevrolet Beat"]),
            "points": pa.array([25, 40, 10], pa.int64()),
            "in_stock": pa.array([True, False, True]),
        }
    )
    out = str(tmp_path / "boolfacet")
    cfg = IndexConfig(
        text_field="title", id_field="ref_id", sha_field=None, batch_docs=4,
        meta_fields=("ref_id", "title", "points", "in_stock"),
    )
    build_index(rd.from_arrow(tbl), out, cfg, concurrency=1)
    coll = RayCollection(out, default_sorting_field="points")

    r = coll.search("*", mode="reference", filter_by="in_stock:true",
                    facet_by="in_stock", facet_query="in_stock:true")
    fc = r["facet_counts"][0]
    assert fc["field_name"] == "in_stock"
    assert len(fc["counts"]) == 1
    assert fc["counts"][0]["value"] == "true"
    assert fc["counts"][0]["count"] == 2
    assert fc["counts"][0]["highlighted"] == "<mark>true</mark>"
    assert "stats" not in fc


def _cat_coll(tmp_path, name, categories):
    """string[] query field = a secondary indexed field here (the
    engine's primary text_field is scalar); searches pass
    query_by=['categories'] like the reference's query_fields."""
    import ray.data as rd

    tbl = pa.table(
        {
            "ref_id": pa.array(["100"]),
            "title": pa.array(["dummy"]),
            "categories": pa.array([categories], pa.list_(pa.string())),
            "points": pa.array([25], pa.int64()),
        }
    )
    out = str(tmp_path / name)
    cfg = IndexConfig(
        text_field="title", id_field="ref_id", sha_field=None,
        batch_docs=4, meta_fields=("ref_id", "title", "categories",
                                   "points"),
        indexed_fields=("categories",),
    )
    build_index(rd.from_arrow(tbl), out, cfg, concurrency=1)
    return RayCollection(out, default_sorting_field="points")


def test_facet_counts_highlighting(ray_session, tmp_path):
    # CollectionFacetingTest.FacetCountsHighlighting (:529-659); the
    # reference's remove/re-add cycles become separate tiny collections.
    # Equal-count value ORDER is reference-hash-dependent → dict asserts.
    coll = _cat_coll(tmp_path, "c1", ["Cell Phones", "Cell Phone Accessories",
                                      "Cell Phone Cases & Clips"])
    r = coll.search("phone", mode="reference", query_by=["categories"], prefix=True, facet_by="categories",
                    facet_query="categories:cell")
    assert hl_of(r) == {
        "Cell Phones": "<mark>Cell</mark> Phones",
        "Cell Phone Accessories": "<mark>Cell</mark> Phone Accessories",
        "Cell Phone Cases & Clips":
            "<mark>Cell</mark> Phone Cases & Clips",
    }
    assert all(c == 1 for c in counts_of(r).values())

    coll2 = _cat_coll(tmp_path, "c2", ["Cell Phones", "Unlocked Cell Phones",
                                       "All Unlocked Cell Phones"])
    r = coll2.search("phone", mode="reference", query_by=["categories"], prefix=True, facet_by="categories",
                     facet_query="categories:cell")
    # the matched word needn't be the first word of the value
    assert hl_of(r) == {
        "Cell Phones": "<mark>Cell</mark> Phones",
        "Unlocked Cell Phones": "Unlocked <mark>Cell</mark> Phones",
        "All Unlocked Cell Phones":
            "All Unlocked <mark>Cell</mark> Phones",
    }

    # mid-value prefix match + case-insensitive facet query
    for fq in ("categories:acces", "categories:ACCES"):
        r = coll.search("phone", mode="reference", query_by=["categories"], prefix=True, facet_by="categories",
                        facet_query=fq)
        assert hl_of(r) == {
            "Cell Phone Accessories": "Cell Phone <mark>Acces</mark>sories"
        }

    # only the LAST facet-query token is a prefix; earlier ones match
    # whole tokens — 'cell ph' must NOT match 'Cellophanes'
    coll3 = _cat_coll(tmp_path, "c3", ["Cell Phones",
                                       "Cell Phone Accessories",
                                       "Cellophanes"])
    r = coll3.search("phone", mode="reference", query_by=["categories"], prefix=True, facet_by="categories",
                     facet_query="categories:cell ph")
    assert set(counts_of(r)) == {"Cell Phones", "Cell Phone Accessories"}

    # typo-tolerant fuzzy PREFIX: 'cellx' matches 'cell' AND 'cello…';
    # per_page=0 returns counts with zero hits
    r = coll3.search("phone", mode="reference", query_by=["categories"], prefix=True, facet_by="categories",
                     facet_query="categories:cellx", per_page=0)
    assert r["found"] == 1 and r["hits"] == []
    assert hl_of(r) == {
        "Cell Phones": "<mark>Cell</mark> Phones",
        "Cell Phone Accessories": "<mark>Cell</mark> Phone Accessories",
        "Cellophanes": "<mark>Cello</mark>phanes",
    }


def test_facet_stat_on_float_fields(ray_session, tmp_path):
    # CollectionFacetingTest.FacetStatOnFloatFields (:661-725)
    import ray.data as rd

    rows = [json.loads(line) for line in open(FLT_JSONL)]
    tbl = pa.table(
        {
            "ref_id": pa.array([str(i) for i in range(len(rows))]),
            "title": pa.array([d["title"] for d in rows]),
            "score": pa.array([float(d["score"]) for d in rows],
                              pa.float64()),
            "average": pa.array([float(d["average"]) for d in rows],
                                pa.float64()),
        }
    )
    out = str(tmp_path / "floatstats")
    cfg = IndexConfig(
        text_field="title", id_field="ref_id", sha_field=None, batch_docs=8,
        meta_fields=("ref_id", "title", "score", "average"),
    )
    build_index(rd.from_arrow(tbl), out, cfg, concurrency=1)
    coll = RayCollection(out, default_sorting_field="average")

    r = coll.search("jeremy", mode="reference", facet_by="average",
                    sort_by="average:desc")
    assert r["found"] == 7
    st = r["facet_counts"][0]["stats"]
    assert st["min"] == pytest.approx(-21.38, rel=1e-4)
    assert st["max"] == pytest.approx(300.0)
    assert st["sum"] == pytest.approx(277.816, rel=1e-4)
    assert st["avg"] == pytest.approx(39.688, rel=1e-4)

    r = coll.search("*", mode="reference", facet_by="average",
                    filter_by="average:>100", sort_by="average:desc")
    st = r["facet_counts"][0]["stats"]
    assert (st["min"], st["max"], st["sum"], st["avg"]) == (
        pytest.approx(300.0),) * 4

    # facet filter must NOT affect facet stats
    r = coll.search("*", mode="reference", facet_by="average",
                    facet_query="average: 11", sort_by="average:desc")
    st = r["facet_counts"][0]["stats"]
    assert st["sum"] == pytest.approx(277.816, rel=1e-4)
    assert st["min"] == pytest.approx(-21.38, rel=1e-4)


def test_facet_count_on_similar_strings(ray_session, tmp_path):
    # CollectionFacetingTest.FacetCountOnSimilarStrings (:727-770):
    # values sharing the same token SET stay distinct facet values
    import ray.data as rd

    tbl = pa.table(
        {
            "ref_id": pa.array(["100", "101"]),
            "title": pa.array(["dummy", "dummy"]),
            "categories": pa.array([["England in India"],
                                    ["India in England"]],
                                   pa.list_(pa.string())),
            "points": pa.array([25, 50], pa.int64()),
        }
    )
    out = str(tmp_path / "simstr")
    cfg = IndexConfig(
        text_field="title", id_field="ref_id", sha_field=None,
        batch_docs=4,
        meta_fields=("ref_id", "title", "categories", "points"),
        indexed_fields=("categories",),
    )
    build_index(rd.from_arrow(tbl), out, cfg, concurrency=1)
    coll = RayCollection(out, default_sorting_field="points")

    r = coll.search("*", mode="reference", filter_by="points:[25, 50]",
                    facet_by="categories")
    assert r["found"] == 2
    assert counts_of(r) == {"England in India": 1, "India in England": 1}


def test_facet_field_string_filtering(ray_session, tmp_path):
    # CollectionFacetingTest.FacetFieldStringFiltering (:21-95): `:=` on a
    # string field matches the WHOLE value verbatim (tokenized equality —
    # single tokens and typo'd tokens must NOT match), while `:` is a
    # containment filter satisfied by any token
    from typesense_ray.collection import CollectionRegistry
    from typesense_ray.validate import FieldSpec

    reg = CollectionRegistry(root=str(tmp_path))
    coll = reg.create_collection(
        "coll_str",
        [FieldSpec("title", "string"),
         FieldSpec("starring", "string", facet=True),
         FieldSpec("cast", "string[]"),
         FieldSpec("points", "int32")],
        "points",
    )
    summary, _ = coll.add_many(
        [line.strip() for line in open(MUL_JSONL) if line.strip()]
    )
    assert summary["num_imported"] == 18

    def found(filter_by):
        return coll.search("*", mode="reference", facet_by="starring",
                           filter_by=filter_by)["found"]

    # exact filter fails on a single token of a multi-token value
    assert found("starring:= samuel") == 0
    # ... and with a typo in one token
    assert found("starring:= ssamuel l. Jackson") == 0
    # verbatim value matches
    assert found("starring:= samuel l. Jackson") == 2
    # contains filter works per token
    assert found("starring: jackson") == 2
    assert found("starring: samuel") == 2
    # contains passes when only one token matches
    assert found("starring: samuel johnson") == 2


def test_exact_filter_requires_facet_field(ray_session, tmp_path):
    # CollectionFacetingTest.FacetFieldStringArrayFiltering (:161-164):
    # ':=' on a non-facet string field is a 400, not zero hits
    from typesense_ray.collection import CollectionRegistry
    from typesense_ray.validate import FieldSpec

    reg = CollectionRegistry(root=str(tmp_path))
    coll = reg.create_collection(
        "coll_nf",
        [FieldSpec("name", "string"),
         FieldSpec("tags", "string[]", facet=True),
         FieldSpec("age", "int32")],
        "age",
    )
    coll.add_many([{"name": "Jeremy Howard", "tags": ["gold"], "age": 30}])

    with pytest.raises(ValueError) as ei:
        coll.search("jeremy", mode="reference", filter_by="name:= Jeremy Howard")
    assert str(ei.value) == (
        "To perform exact filtering, filter field `name` must be a facet"
        " field."
    )
    # facet-flagged := still works
    r = coll.search("jeremy", mode="reference", filter_by="tags:= gold")
    assert r["found"] == 1
