"""Conformance ports of the reference's filtering suite
(``test/collection_filtering_test.cpp``) not already covered by
``test_reference_corpus.py`` (FilterOnTextFields and
HandleBadlyFormedFilterQuery live there): numeric / float / array
comparators, IN-lists with per-value comparators, string-with-colon
values, and the filter × query_by interaction matrix.

Corpus: ``test/numeric_array_documents.jsonl`` (5 docs, all fields) and
``test/multi_field_documents.jsonl``. Expected hit orders are the
reference's own golden assertions; every non-tied order is asserted
exactly."""

import json
import os

import pyarrow as pa
import pytest

from typesense_ray.collection import RayCollection
from typesense_ray.filtering import parse_filter
from typesense_ray.index_build import IndexConfig, build_index

NUM_JSONL = "/root/reference/test/numeric_array_documents.jsonl"
MUL_JSONL = "/root/reference/test/multi_field_documents.jsonl"

pytestmark = pytest.mark.skipif(
    not os.path.exists(NUM_JSONL),
    reason="reference corpus not available",
)


@pytest.fixture(scope="module")
def num_coll(ray_session, tmp_path_factory):
    """numeric_array corpus with EVERY field indexed as metadata (the
    reference suite re-creates the collection per test with different
    schemas; one superset index serves all of them here)."""
    import ray.data as rd

    docs = []
    for i, line in enumerate(open(NUM_JSONL)):
        d = json.loads(line)
        docs.append(
            {"ref_id": str(i), "name": d["name"], "age": d["age"],
             "years": d["years"], "timestamps": d["timestamps"],
             "tags": d["tags"], "top_3": d["top_3"],
             "rating": d["rating"]}
        )
    tbl = pa.table(
        {
            "ref_id": pa.array([d["ref_id"] for d in docs]),
            "name": pa.array([d["name"] for d in docs]),
            "age": pa.array([d["age"] for d in docs], pa.int64()),
            "years": pa.array([d["years"] for d in docs],
                              pa.list_(pa.int64())),
            "timestamps": pa.array([d["timestamps"] for d in docs],
                                   pa.list_(pa.int64())),
            "tags": pa.array([d["tags"] for d in docs],
                             pa.list_(pa.string())),
            "top_3": pa.array([d["top_3"] for d in docs],
                              pa.list_(pa.float64())),
            "rating": pa.array([d["rating"] for d in docs], pa.float64()),
        }
    )
    out = str(tmp_path_factory.mktemp("numfilt"))
    cfg = IndexConfig(
        text_field="name", id_field="ref_id", sha_field=None, batch_docs=8,
        meta_fields=("ref_id", "name", "age", "years", "timestamps",
                     "tags", "top_3", "rating"),
    )
    build_index(rd.from_arrow(tbl), out, cfg, concurrency=1)
    from typesense_ray.typo import build_term_max_static, build_typo_table

    build_typo_table(out)
    build_term_max_static(out, "age")
    return RayCollection(out, default_sorting_field="age")


def ids(r):
    return [h["document"]["ref_id"] for h in r["hits"]]


def test_filter_on_numeric_fields(num_coll):
    # CollectionFilteringTest.FilterOnNumericFields (:320-476); sort by
    # age DESC — ages are distinct so every order is exact
    def got(filter_by):
        r = num_coll.search("jeremy", mode="reference", sort_by="age:desc",
                            filter_by=filter_by, per_page=10)
        return ids(r)

    assert got("") == ["3", "1", "4", "0", "2"]
    assert got("age:>24") == ["3", "1", "4"]
    assert len(got("age:>=24")) == 4
    assert len(got("age:24")) == 1
    assert len(got("age:=24")) == 1        # alternative := syntax
    assert len(got("age:= 24")) == 1
    assert got("years:>2002") == ["1", "0", "2"]
    assert got("years:<1989") == ["3"]
    assert got("years:<2005 && years:>1987") == ["4"]
    assert got("age:[21, 24, 63]") == ["3", "0", "2"]     # IN-list
    assert len(got("age:= [21, 24, 63]")) == 3
    assert got("years : [ 2015, 1985 , 1999]") == ["3", "1", "4", "0"]
    assert got("timestamps : > 475205222") == ["1", "4", "0", "2"]
    assert got("timestamps:>1591091288061") == []


def test_filter_on_float_fields(num_coll):
    # CollectionFilteringTest.FilterOnFloatFields (:478-616); sort by
    # rating DESC/ASC — ratings are distinct so every order is exact
    def got(filter_by, sort="rating:desc"):
        r = num_coll.search("jeremy", mode="reference", sort_by=sort,
                            filter_by=filter_by, per_page=10)
        return ids(r)

    assert got("") == ["1", "2", "4", "0", "3"]
    assert got("", sort="rating:asc") == ["3", "0", "4", "2", "1"]
    assert got("rating:>0.0") == ["1", "2", "4", "0"]
    assert got("top_3:>7.8") == ["1", "2"]
    assert got("top_3:>7.8 && rating:>7.9") == ["1"]
    assert got("rating:[1.09, 7.812]") == ["2", "0"]
    assert got("top_3 : [ 5.431, 0.001 , 7.812, 11.992]") == ["2", "4", "0"]
    assert got("rating:<-2.78") == []
    # prefix token ranked by MAX_SCORE (term max-static over the default
    # sorting field), results sorted by rating desc
    r = num_coll.search("j", mode="reference", sort_by="rating:desc",
                        prefix=True, token_order="max_score", per_page=10)
    assert ids(r) == ["1", "2", "4", "0", "3"]


def test_comparators_on_multivalued_numerical_field(num_coll):
    # CollectionFilteringTest.ComparatorsOnMultiValuedNumericalField
    # (:618-676): per-value comparators INSIDE an IN-list
    def got(filter_by):
        r = num_coll.search("jeremy", mode="reference",
                            sort_by="rating:desc",
                            filter_by=filter_by, per_page=10)
        return ids(r)

    assert got("age: [24, >32]") == ["1", "0", "3"]
    assert got("age: [<=24, >=44]") == ["1", "2", "0", "3"]


def test_filter_on_text_field_with_colon(ray_session, tmp_path):
    # CollectionFilteringTest.FilterOnTextFieldWithColon (:122-154):
    # the filter value itself contains ':' — split on the FIRST colon
    import ray.data as rd

    tbl = pa.table(
        {
            "ref_id": pa.array(["1"]),
            "url": pa.array(["https://example.com/1"]),
            "points": pa.array([1], pa.int64()),
        }
    )
    out = str(tmp_path / "urlidx")
    cfg = IndexConfig(
        text_field="url", id_field="ref_id", sha_field=None, batch_docs=4,
        meta_fields=("ref_id", "url", "points"),
    )
    build_index(rd.from_arrow(tbl), out, cfg, concurrency=1)
    coll = RayCollection(out, default_sorting_field="points")

    r = coll.search("*", mode="reference",
                    filter_by="url:= https://example.com/1", per_page=10)
    assert ids(r) == ["1"]
    r = coll.search("*", mode="reference",
                    filter_by="url: https://example.com/1", per_page=10)
    assert ids(r) == ["1"]


@pytest.fixture(scope="module")
def mul_coll(ray_session, tmp_path_factory):
    import ray.data as rd

    docs = []
    for i, line in enumerate(open(MUL_JSONL)):
        d = json.loads(line)
        docs.append(
            {"ref_id": str(i), "title": d["title"],
             "starring": d["starring"], "cast": d["cast"],
             "points": int(d["points"])}
        )
    tbl = pa.table(
        {
            "ref_id": pa.array([d["ref_id"] for d in docs]),
            "title": pa.array([d["title"] for d in docs]),
            "starring": pa.array([d["starring"] for d in docs]),
            "cast": pa.array([d["cast"] for d in docs],
                             pa.list_(pa.string())),
            "points": pa.array([d["points"] for d in docs], pa.int64()),
        }
    )
    out = str(tmp_path_factory.mktemp("mulfilt"))
    cfg = IndexConfig(
        text_field="title", id_field="ref_id", sha_field=None,
        batch_docs=8,
        meta_fields=("ref_id", "title", "starring", "cast", "points"),
        indexed_fields=("starring", "cast"),
    )
    build_index(rd.from_arrow(tbl), out, cfg, concurrency=1)
    return RayCollection(out, default_sorting_field="points")


def test_filter_and_query_field_restrictions(mul_coll):
    # CollectionFilteringTest.FilterAndQueryFieldRestrictions (:211-318)
    # query on a faceted string[] field
    r = mul_coll.search("anton", mode="reference", query_by=["cast"],
                        per_page=10)
    assert ids(r) == ["14"]

    # filtering on a scalar string field alongside a title query
    r = mul_coll.search("captain", mode="reference", query_by=["title"],
                        filter_by="starring: Samuel L. Jackson",
                        per_page=10)
    assert ids(r) == ["6"]

    # filtering on the string[] field: partial word (token) match
    r = mul_coll.search("*", mode="reference",
                        filter_by="cast: chris", per_page=10)
    assert r["found"] == 3

    # the search path swallows malformed / mistyped filters into zero
    # hits (reference returns an error Option; parity documented at
    # collection.py search()) — the strict parse used by destructive
    # paths raises instead
    for bad in ("BLAH", "age: 100", 'points: "100"', "points: 100.34",
                "points: <sdsdfsdf"):
        assert mul_coll.search("captain", mode="reference",
                               query_by=["title"],
                               filter_by=bad)["found"] == 0
    with pytest.raises((KeyError, ValueError)):
        parse_filter("age: 100", mul_coll.field_types)
    with pytest.raises((KeyError, ValueError)):
        parse_filter("BLAH", mul_coll.field_types)

    # small negative numbers are legal filter values
    r = mul_coll.search("captain", mode="reference", query_by=["title"],
                        filter_by="points: >-3230", per_page=10)
    assert r["found"] >= 1


def test_string_filter_vocab_skip_matrix(ray_session, tmp_path):
    """Exhaustive mirror of the reference's string-filter algorithm
    (src/index.cpp:1026-1113) over a small corpus: for every 1/2/3-token
    combination of in-vocab and out-of-vocab tokens, CONTAINS must AND
    only the tokens whose ART lookup finds a leaf (null-leaf skip), a
    value with NO found token matches nothing, and scalar := compares
    the doc token count against the FOUND token count. The oracle here
    is an independent per-doc reimplementation of exactly that C++
    loop."""
    import itertools

    import ray.data as rd

    from typesense_ray.filtering import norm_tokens

    titles = [
        "alpha beta gamma",
        "alpha beta",
        "beta gamma delta",
        "delta",
        "alpha omega zeta",
    ]
    docs = [
        {"docnum": i, "title": t, "points": i} for i, t in enumerate(titles)
    ]
    out = str(tmp_path / "vsk")
    cfg = IndexConfig(
        text_field="title", id_field="docnum", sha_field=None, batch_docs=8,
        meta_fields=("docnum", "title", "points"),
    )
    build_index(rd.from_items(docs), out, cfg, concurrency=1)
    coll = RayCollection(out, default_sorting_field="points")

    doc_toks = [norm_tokens(t) for t in titles]
    vocab = {tok for toks in doc_toks for tok in toks}

    def oracle(value, exact):
        want = norm_tokens(value)
        found = [t for t in want if t in vocab]
        if not found:
            return set()
        hits = {
            i for i, toks in enumerate(doc_toks)
            if set(found) <= set(toks)
        }
        if exact:
            hits = {i for i in hits if len(doc_toks[i]) == len(found)}
        return hits

    pool = ["alpha", "beta", "gamma", "delta", "omega", "zeta",
            "missing", "absent"]
    cases = [
        " ".join(c)
        for k in (1, 2, 3)
        for c in itertools.combinations(pool, k)
    ]
    for value in cases:
        for exact in (False, True):
            fb = f"title:{'= ' if exact else ' '}{value}"
            got = {
                h["document"]["docnum"]
                for h in coll.search("*", filter_by=fb, per_page=250)["hits"]
            }
            assert got == oracle(value, exact), (value, exact)
