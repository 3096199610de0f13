"""Relational search surface: filters, facets, sort, group, pagination,
synonyms, overrides, drop-tokens, highlighting."""

import numpy as np
import pyarrow as pa
import pytest

from typesense_ray.collection import (
    Override,
    RayCollection,
    SynonymIndex,
    highlight_text,
)
from typesense_ray.filtering import parse_filter
from typesense_ray.index_build import IndexConfig, build_index

TITLES = [
    ("omega blue tshirt", "omega", 11, ["blue"], 4.5, True),
    ("alpha red shoes", "alpha", 10, ["red", "white"], 4.3, False),
    ("omega red shoes", "omega", 10, ["red"], 4.6, True),
    ("beta green hat", "beta", 9, ["green"], 4.2, False),
    ("alpha blue hat", "alpha", 11, ["blue", "green"], 3.9, True),
    ("gamma red tshirt", "gamma", 12, ["red"], 4.8, False),
    ("omega white sneakers", "omega", 10, ["white"], 4.1, True),
    ("beta white tshirt", "beta", 11, ["white"], 4.4, False),
    ("alpha red tshirt premium", "alpha", 12, ["red"], 4.9, True),
    ("gamma blue sneakers", "gamma", 9, ["blue"], 3.7, False),
]


@pytest.fixture(scope="module")
def coll(ray_session, tmp_path_factory):
    import ray.data as rd

    tbl = pa.table(
        {
            "docnum": pa.array(range(len(TITLES)), pa.int64()),
            "title": pa.array([t[0] for t in TITLES]),
            "brand": pa.array([t[1] for t in TITLES]),
            "size": pa.array([t[2] for t in TITLES], pa.int64()),
            "colors": pa.array([t[3] for t in TITLES], pa.list_(pa.string())),
            "rating": pa.array([t[4] for t in TITLES], pa.float64()),
            "in_stock": pa.array([t[5] for t in TITLES], pa.bool_()),
        }
    )
    out = str(tmp_path_factory.mktemp("apparel"))
    cfg = IndexConfig(
        text_field="title",
        id_field="docnum",
        sha_field=None,
        batch_docs=4,
        meta_fields=("docnum", "title", "brand", "size", "colors", "rating", "in_stock"),
    )
    build_index(rd.from_arrow(tbl), out, cfg, concurrency=2)
    return RayCollection(out, default_sorting_field="size")


def ids(resp):
    return [h["document"]["docnum"] for h in resp["hits"]]


def test_basic_search_and_found(coll):
    r = coll.search("red")
    assert r["found"] == 4
    assert set(ids(r)) == {1, 2, 5, 8}


def test_filter_numeric(coll):
    r = coll.search("*", filter_by="size:>=11")
    assert r["found"] == 5
    r = coll.search("*", filter_by="size:[9,12]")  # OR list
    assert r["found"] == 4
    r = coll.search("*", filter_by="rating:<4.0")
    assert sorted(ids(r)) == [4, 9]
    r = coll.search("red", filter_by="size:>10 && rating:>4.5")
    assert sorted(ids(r)) == [5, 8]


def test_filter_bool(coll):
    r = coll.search("*", filter_by="in_stock:true")
    assert r["found"] == 5


def test_filter_string_contains_and_equals(coll):
    r = coll.search("*", filter_by="brand:omega")
    assert r["found"] == 3
    r = coll.search("*", filter_by="title:red shoes")  # AND of tokens
    assert sorted(ids(r)) == [1, 2]
    r = coll.search("*", filter_by="brand:[alpha,beta]")
    assert r["found"] == 5
    r = coll.search("*", filter_by="title:= omega red shoes")  # exact
    assert ids(r) == [2]


def test_filter_string_array(coll):
    r = coll.search("*", filter_by="colors:green")
    assert sorted(ids(r)) == [3, 4]


def test_sort_by(coll):
    r = coll.search("*", sort_by="size:desc,rating:desc", per_page=3)
    assert ids(r) == [8, 5, 0]  # size 12 rating 4.9/4.8, then size 11 rating 4.5
    r = coll.search("*", sort_by="size:asc,rating:asc", per_page=3)
    assert ids(r) == [9, 3, 6]


def test_default_sort_uses_static_field(coll):
    # equal bm25 scores → size desc breaks ties
    # equal-score (doclen-3) docs tie-break by size desc then doc_id desc;
    # the longer doc 8 scores lower despite size 12
    r = coll.search("tshirt")
    assert ids(r) == [5, 7, 0, 8]


def test_facets_counts_and_stats(coll):
    r = coll.search("*", facet_by="brand,size")
    fc = {f["field_name"]: f for f in r["facet_counts"]}
    brand_counts = {c["value"]: c["count"] for c in fc["brand"]["counts"]}
    assert brand_counts == {"omega": 3, "alpha": 3, "beta": 2, "gamma": 2}
    assert fc["size"]["stats"]["min"] == 9
    assert fc["size"]["stats"]["max"] == 12
    assert fc["size"]["stats"]["avg"] == pytest.approx(10.5)


def test_facet_array_field(coll):
    r = coll.search("*", facet_by="colors")
    fc = r["facet_counts"][0]
    counts = {c["value"]: c["count"] for c in fc["counts"]}
    assert counts == {"red": 4, "blue": 3, "white": 3, "green": 2}


def test_facets_respect_query(coll):
    r = coll.search("red", facet_by="brand")
    counts = {c["value"]: c["count"] for c in r["facet_counts"][0]["counts"]}
    assert counts == {"alpha": 2, "omega": 1, "gamma": 1}


def test_group_by(coll):
    r = coll.search("*", group_by="brand", group_limit=2, sort_by="rating:desc")
    assert r["found"] == 4  # distinct brands
    g0 = r["grouped_hits"][0]
    assert g0["group_key"] == ["alpha"]  # best rating 4.9
    assert [h["document"]["docnum"] for h in g0["hits"]] == [8, 1]


def test_grouped_facet_counts_distinct_groups(coll):
    r = coll.search("*", facet_by="size", group_by="brand")
    counts = {c["value"]: c["count"] for c in r["facet_counts"][0]["counts"]}
    # size 10 appears in brands alpha, omega → 2 distinct groups
    assert counts[10] == 2


def test_phrase_ids(coll):
    # adjacency required: "red tshirt" hits only consecutive occurrences
    assert coll.phrase_ids("red tshirt")["doc_id"].to_pylist() == [5, 8]
    # conjunctive match exists (doc 8: alpha ... tshirt) but not adjacent
    assert coll.phrase_ids("alpha tshirt")["doc_id"].to_pylist() == []
    # order matters
    assert coll.phrase_ids("omega blue")["doc_id"].to_pylist() == [0]
    assert coll.phrase_ids("blue omega")["doc_id"].to_pylist() == []
    # punctuation-only words cannot anchor a phrase
    import pytest as _pytest

    with _pytest.raises(ValueError):
        coll.phrase_ids("red !!!")


def test_pagination(coll):
    all_ids = ids(coll.search("*", per_page=10))
    p1 = ids(coll.search("*", per_page=3, page=1))
    p2 = ids(coll.search("*", per_page=3, page=2))
    assert p1 == all_ids[:3]
    assert p2 == all_ids[3:6]


def test_exclusion_tokens(coll):
    r = coll.search("red -shoes")
    assert sorted(ids(r)) == [5, 8]


def test_drop_tokens_fallback(coll):
    # 'nonexistent red' has no conjunctive match; fallback drops right
    # token first, then left → matches docs containing 'red'
    r = coll.search("red doesnotexist")
    assert r["found"] == 4
    assert set(ids(r)) == {1, 2, 5, 8}


def test_synonyms(coll):
    syn = SynonymIndex()
    syn.add_synonym("crimson", ["red"])
    c2 = RayCollection(coll._local.index_dir, default_sorting_field="size",
                       synonyms=syn)
    r = c2.search("crimson")
    assert r["found"] == 4


def test_overrides_pinned_and_hidden(coll):
    ov = Override(rule_query="red", match="exact", includes=[(9, 1)], excludes=[1])
    c2 = RayCollection(coll._local.index_dir, default_sorting_field="size",
                       overrides=[ov])
    r = c2.search("red")
    got = ids(r)
    assert got[0] == 9  # pinned at position 1
    assert 1 not in got  # hidden


def test_include_exclude_fields(coll):
    r = coll.search("red", include_fields=["docnum", "brand"])
    assert set(r["hits"][0]["document"].keys()) == {"docnum", "brand"}
    r = coll.search("red", exclude_fields=["title"])
    assert "title" not in r["hits"][0]["document"]


def test_highlight(coll):
    r = coll.search("red tshirt")
    h = next(h for h in r["hits"] if h["document"]["docnum"] == 5)
    assert h["highlights"][0]["snippet"] == "gamma <mark>red</mark> <mark>tshirt</mark>"
    assert set(h["highlights"][0]["matched_tokens"]) == {"red", "tshirt"}


def test_highlight_long_text_window():
    text = " ".join(f"w{i}" for i in range(50)) + " target here"
    out = highlight_text(text, ["target"])
    assert "<mark>target</mark>" in out["snippet"]
    assert len(out["snippet"].split(" ")) <= 2 * 4 + 2  # affix window


def test_filter_parse_errors(coll):
    with pytest.raises(KeyError):
        parse_filter("nosuchfield:1", coll.field_types)
    with pytest.raises(ValueError):
        parse_filter("size", coll.field_types)


def test_matching_ids_synonyms_and_overrides(coll):
    syn = SynonymIndex()
    syn.add_synonym("crimson", ["red"])
    c2 = RayCollection(coll._local.index_dir, default_sorting_field="size",
                       synonyms=syn)
    plain = c2.matching_ids("crimson")["doc_id"].to_pylist()
    expanded = c2.matching_ids("crimson", apply_synonyms=True)[
        "doc_id"
    ].to_pylist()
    reds = c2.matching_ids("red")["doc_id"].to_pylist()
    assert set(expanded) == set(plain) | set(reds)

    ov = Override(rule_query="red", match="exact",
                  includes=[(999, 1)], excludes=[reds[0]])
    c3 = RayCollection(coll._local.index_dir, default_sorting_field="size",
                       overrides=[ov])
    curated = c3.matching_ids("red", apply_overrides=True)["doc_id"].to_pylist()
    assert 999 in curated and reds[0] not in curated
    # non-matching rule leaves the set alone
    same = c3.matching_ids("blue", apply_overrides=True)["doc_id"].to_pylist()
    assert same == c3.matching_ids("blue")["doc_id"].to_pylist()


def test_numeric_filter_matrix_reference_parity(ray_session, tmp_path):
    """Ports CollectionFilteringTest.FilterOnNumericFields +
    ComparatorsOnMultiValuedNumericalField (reference
    test/collection_filtering_test.cpp:320-478,618-680, corpus
    test/numeric_array_documents.jsonl): scalar + int32[]/int64[] array
    filters, =, ranges, IN-lists, mixed comparators inside lists, and
    whitespace-padded expressions. Array semantics: a doc matches when
    ANY element satisfies the clause."""
    import ray.data as rd

    from typesense_ray.collection import RayCollection
    from typesense_ray.index_build import IndexConfig, build_index

    docs = [
        {"docnum": 0, "name": "Jeremy Howard", "age": 24,
         "years": [2014, 2015, 2016],
         "timestamps": [1390354022, 1421890022, 1453426022]},
        {"docnum": 1, "name": "Jeremy Howard", "age": 44,
         "years": [2015, 2016], "timestamps": [1421890022, 1453426022]},
        {"docnum": 2, "name": "Jeremy Howard", "age": 21,
         "years": [2016], "timestamps": [1453426022]},
        {"docnum": 3, "name": "Jeremy Howard", "age": 63,
         "years": [1981, 1985], "timestamps": [348974822, 475205222]},
        {"docnum": 4, "name": "Jeremy Howard", "age": 32,
         "years": [1999, 2000, 2001, 2002],
         "timestamps": [916968422, 948504422, 980126822, 1011662822]},
    ]
    out = str(tmp_path / "numfilter")
    cfg = IndexConfig(
        text_field="name", id_field="docnum", sha_field=None, batch_docs=8,
        meta_fields=("docnum", "name", "age", "years", "timestamps"),
    )
    build_index(rd.from_items(docs), out, cfg, concurrency=1)
    coll = RayCollection(out, default_sorting_field="age")

    def got(filter_by):
        r = coll.search("jeremy", filter_by=filter_by, per_page=10)
        return [h["document"]["docnum"] for h in r["hits"]]

    # baseline order: score ties -> age desc
    assert got("") == [3, 1, 4, 0, 2]
    assert got("age:>24") == [3, 1, 4]
    assert got("age:>=24") == [3, 1, 4, 0]
    assert got("age:24") == [0]
    assert got("age:=24") == [0]
    assert got("age:= 24") == [0]
    # int32[] array fields: ANY element matches
    assert got("years:>2002") == [1, 0, 2]
    assert got("years:<1989") == [3]
    assert got("years:<2005 && years:>1987") == [4]
    # IN-lists (scalar + array), with reference's whitespace padding
    assert got("age:[21, 24, 63]") == [3, 0, 2]
    assert got("age:= [21, 24, 63]") == [3, 0, 2]
    assert got("years : [ 2015, 1985 , 1999]") == [3, 1, 4, 0]
    # int64[] array
    assert got("timestamps : > 475205222") == [1, 4, 0, 2]
    # mixed comparators inside an IN-list (set semantics)
    assert sorted(got("age: [24, >32]")) == [0, 1, 3]
    assert sorted(got("age: [<=24, >=44]")) == [0, 1, 2, 3]
    # no match
    assert got("age:>200") == []


def test_grouping_basics_reference_parity(ray_session, tmp_path):
    """Ports CollectionGroupingTest.GroupingBasics (reference
    test/collection_grouping_test.cpp:62-145, corpus
    test/group_documents.jsonl): group by an int field with
    group_limit=2 under the default rating sort, DISTINCT-GROUP facet
    counts while grouping, grouping by a float field under an explicit
    sort, and facet_query value highlighting. Group-order assertions
    avoid the one case decided purely by insertion-id ties (the rebuild
    derives doc ids from data, a documented divergence)."""
    import ray.data as rd

    from typesense_ray.collection import RayCollection
    from typesense_ray.index_build import IndexConfig, build_index

    rows = [
        ("Omega Casual Poplin Shirt", "Omega", 10, 4.5),
        ("Omega Casual Poplin Shirt", "Omega", 11, 4.3),
        ("Omega Casual Poplin Shirt", "Omega", 12, 4.6),
        ("Omega Casual Poplin Shirt", "Omega", 10, 4.6),
        ("Beta Casual Poplin Shirt", "Beta", 10, 4.8),
        ("Beta Casual Poplin Shirt", "Beta", 11, 4.8),
        ("Beta Casual Poplin Shirt", "Beta", 12, 4.3),
        ("Xorp Casual Shirt", "Xorp", 10, 4.3),
        ("Xorp Casual Shirt", "Xorp", 12, 4.4),
        ("Zeta Casual Shirt", "Zeta", 10, 4.1),
        ("White Casual Shirt", None, 10, 4.3),
        ("White Casual Shirt", None, 10, 3.3),
    ]
    docs = [
        {"docnum": i, "title": t, "brand": b, "size": s, "rating": r}
        for i, (t, b, s, r) in enumerate(rows)
    ]
    out = str(tmp_path / "groupidx")
    cfg = IndexConfig(
        text_field="title", id_field="docnum", sha_field=None, batch_docs=16,
        meta_fields=("docnum", "title", "brand", "size", "rating"),
    )
    build_index(rd.from_items(docs), out, cfg, concurrency=1)
    coll = RayCollection(out, default_sorting_field="rating")

    r = coll.search("*", facet_by="brand", group_by="size", group_limit=2,
                    per_page=50, sort_by="rating:desc")
    assert r["found"] == 3  # three distinct sizes
    by_key = {g["group_key"][0]: [h["document"]["docnum"] for h in g["hits"]]
              for g in r["grouped_hits"]}
    assert by_key[11] == [5, 1]   # 4.8 then 4.3
    assert by_key[10] == [4, 3]   # 4.8 then 4.6 (4.6 tie inside cut)
    assert by_key[12] == [2, 8]   # 4.6 then 4.4
    # groups ranked by best hit; size 12 (best 4.6) after both 4.8 groups
    assert r["grouped_hits"][2]["group_key"] == [12]
    # facet counts while grouping count DISTINCT GROUPS per value
    counts = {c["value"]: c["count"] for c in r["facet_counts"][0]["counts"]}
    assert counts == {"Beta": 3, "Omega": 3, "Xorp": 2, "Zeta": 1}

    # group by float rating: 7 unique ratings; facet_query highlights
    r = coll.search("*", facet_by="brand", facet_query="brand: omeg",
                    group_by="rating", group_limit=2, per_page=50,
                    sort_by="size:desc")
    assert r["found"] == 7
    fc = r["facet_counts"][0]["counts"]
    assert len(fc) == 1 and fc[0]["value"] == "Omega"
    assert fc[0]["count"] == 3  # distinct rating-groups containing Omega
    assert fc[0]["highlighted"] == "<mark>Omeg</mark>a"


def test_sort_on_float_fields_reference_parity(ray_session, tmp_path):
    """Ports CollectionSortingTest.SortOnFloatFields (reference
    test/collection_sorting_test.cpp:200-268, corpus
    test/float_documents.jsonl): two-key float sorts in desc/desc,
    asc/asc and asc/desc — negatives, 0.0, a huge epoch-ms value and
    duplicate primary keys broken by the secondary."""
    import ray.data as rd

    from typesense_ray.collection import RayCollection
    from typesense_ray.index_build import IndexConfig, build_index

    vals = [
        (1.09, 1.45), (-9.998, -2.408), (1582186644000.0, 0.001),
        (0.0, 11.533), (-9.999, -11.38), (-9.999, 300.0), (-9.999, -21.38),
    ]
    docs = [
        {"docnum": i, "title": "Jeremy Howard", "score_f": s, "average": a}
        for i, (s, a) in enumerate(vals)
    ]
    out = str(tmp_path / "floatidx")
    cfg = IndexConfig(
        text_field="title", id_field="docnum", sha_field=None, batch_docs=8,
        meta_fields=("docnum", "title", "score_f", "average"),
    )
    build_index(rd.from_items(docs), out, cfg, concurrency=1)
    coll = RayCollection(out, default_sorting_field="score_f")

    def got(sort_by):
        r = coll.search("jeremy", sort_by=sort_by, per_page=10)
        return [h["document"]["docnum"] for h in r["hits"]]

    assert got("score_f:desc,average:desc") == [2, 0, 3, 1, 5, 4, 6]
    assert got("score_f:asc,average:asc") == [6, 4, 5, 1, 3, 0, 2]
    assert got("score_f:asc,average:desc") == [5, 4, 6, 1, 3, 0, 2]


def test_three_sort_fields_limit(ray_session, tmp_path):
    """Reference rejects >3 sort_by fields
    (CollectionSortingTest.ThreeSortFieldsLimit,
    test/collection_sorting_test.cpp:270-310)."""
    import ray.data as rd

    from typesense_ray.collection import RayCollection
    from typesense_ray.index_build import IndexConfig, build_index

    docs = [{"docnum": 0, "title": "the title", "a": 1, "b": 2, "c": 3,
             "d": 4}]
    out = str(tmp_path / "sortlim")
    cfg = IndexConfig(
        text_field="title", id_field="docnum", sha_field=None, batch_docs=8,
        meta_fields=("docnum", "title", "a", "b", "c", "d"),
    )
    build_index(rd.from_items(docs), out, cfg, concurrency=1)
    coll = RayCollection(out, default_sorting_field="a")
    with pytest.raises(ValueError):
        coll.search("the", sort_by="a:desc,b:desc,c:desc,d:desc")


def test_highlight_threshold_affix_tags_newline(ray_session, tmp_path):
    """Ports CollectionTest.SearchHighlightShouldFollowThreshold /
    ...ShouldUseHighlightTags / ...WithNewLine
    (test/collection_test.cpp:2011-2135): snippet_threshold windows,
    highlight_affix_num_tokens, custom highlight tags, newline
    flattening and original-case matched_tokens."""
    import ray.data as rd

    from typesense_ray.collection import RayCollection
    from typesense_ray.index_build import IndexConfig, build_index

    docs = [
        {"docnum": 0,
         "title": "The quick brown fox jumped over the lazy dog and ran "
                  "straight to the forest to sleep.",
         "points": 25},
        {"docnum": 1, "title": "Blah, blah\nStark Industries", "points": 5},
        # the reference's SearchHighlightShouldUseHighlightTags corpus has
        # doubled spaces and a trailing space; the snippet must preserve the
        # raw whitespace exactly (test/collection_test.cpp:2069-2101)
        {"docnum": 2,
         "title": "The quick brown  fox jumped over the  lazy fox. ",
         "points": 1},
    ]
    out = str(tmp_path / "hl")
    cfg = IndexConfig(
        text_field="title", id_field="docnum", sha_field=None, batch_docs=8,
        meta_fields=("docnum", "title", "points"),
    )
    build_index(rd.from_items(docs), out, cfg, concurrency=1)
    coll = RayCollection(out, default_sorting_field="points")

    def snip(**kw):
        r = coll.search("lazy", sort_by="points:desc", **kw)
        return r["hits"][0]["highlights"][0]["snippet"]

    # large threshold: whole field
    assert snip() == ("The quick brown fox jumped over the <mark>lazy</mark> "
                      "dog and ran straight to the forest to sleep.")
    # small threshold: default 4 words either side
    assert snip(snippet_threshold=5) == \
        "fox jumped over the <mark>lazy</mark> dog and ran straight"
    # explicit affix sizes
    assert snip(snippet_threshold=5, highlight_affix_num_tokens=2) == \
        "over the <mark>lazy</mark> dog and"
    assert snip(snippet_threshold=5, highlight_affix_num_tokens=0) == \
        "<mark>lazy</mark>"
    # custom tags
    assert snip(highlight_start_tag='<em class="h">',
                highlight_end_tag="</em>") == \
        ('The quick brown fox jumped over the <em class="h">lazy</em> '
         "dog and ran straight to the forest to sleep.")

    # newline flattening + original-case matched_tokens
    # (= CollectionTest.SearchHighlightWithNewLine,
    # test/collection_test.cpp:2103-2135)
    r = coll.search("stark", sort_by="points:desc")
    hl = r["hits"][0]["highlights"][0]
    assert hl["snippet"] == "Blah, blah <mark>Stark</mark> Industries"
    assert hl["matched_tokens"] == ["Stark"]

    # whitespace-exact snippet on the reference's doubled-space corpus
    r = coll.search("lazy", sort_by="points:asc",
                    highlight_start_tag='<em class="h">',
                    highlight_end_tag="</em>")
    assert r["hits"][0]["highlights"][0]["snippet"] == (
        'The quick brown  fox jumped over the  <em class="h">lazy</em> '
        "fox. "
    )


def test_pinned_and_hidden_hits_params(ray_session, tmp_path):
    """Ports CollectionOverrideTest.IncludeExcludeHitsQuery
    (test/collection_override_test.cpp:270-350): per-request pinned_hits
    'id:pos,...' and hidden_hits 'id,...' — pinning weaves at fixed
    1-based positions, hiding filters and shrinks found, pinned hits
    paginate naturally, and a request-hidden doc is never re-included by
    a stored override rule."""
    import ray.data as rd

    from typesense_ray.collection import Override, RayCollection
    from typesense_ray.index_build import IndexConfig, build_index

    docs = [
        {"docnum": i, "title": f"the common title {i}", "points": i}
        for i in range(10)
    ]
    out = str(tmp_path / "pins")
    cfg = IndexConfig(
        text_field="title", id_field="docnum", sha_field=None, batch_docs=16,
        meta_fields=("docnum", "title", "points"),
    )
    build_index(rd.from_items(docs), out, cfg, concurrency=1)

    def ids(r):
        return [h["document"]["docnum"] for h in r["hits"]]

    coll = RayCollection(out, default_sorting_field="points")
    # natural order: points desc = 9..0
    r = coll.search("common", per_page=50)
    assert ids(r) == [9, 8, 7, 6, 5, 4, 3, 2, 1, 0]

    # basic pinning
    r = coll.search("common", per_page=50, pinned_hits="3:1,5:2")
    assert ids(r)[:4] == [3, 5, 9, 8]
    assert r["found"] == 10

    # pinning + hiding
    r = coll.search("common", per_page=50, pinned_hits="3:1,5:2",
                    hidden_hits="9,8")
    assert ids(r)[:3] == [3, 5, 7]
    assert r["found"] == 8

    # pinned hits landing on the second page
    r = coll.search("common", per_page=2, page=2, pinned_hits="3:4,5:5",
                    hidden_hits="")
    assert ids(r) == [7, 3]

    # request-level hidden beats a stored override include
    coll2 = RayCollection(
        out, default_sorting_field="points",
        overrides=[Override(rule_query="common", match="exact",
                            includes=[(6, 1), (4, 2)])],
    )
    r = coll2.search("common", per_page=50, hidden_hits="6")
    assert ids(r)[1] == 4          # surviving include keeps its position
    assert 6 not in ids(r)         # hidden param wins over the include


def test_synonym_variant_gets_prefix_and_typo_expansion(coll):
    """Synonym variants re-enter typo/prefix expansion exactly like the
    original query (src/index.cpp:1478-1487 re-enters search_field per
    variant with the same num_typos/prefix): a synonym mapping to a
    PREFIX of an indexed term ('sneaker' → 'sneakers') or a TYPO'd form
    ('shoez' → 'shoes') still matches when prefix/num_typos allow."""
    syn = SynonymIndex()
    syn.add_synonym("crimson", ["sneaker"])
    c2 = RayCollection(coll._local.index_dir, default_sorting_field="size",
                       synonyms=syn)
    # without prefix the synonym variant 'sneaker' matches nothing
    assert c2.search("crimson", prefix=False)["found"] == 0
    r = c2.search("crimson", prefix=True)
    assert sorted(ids(r)) == [6, 9]  # both 'sneakers' docs

    # typo path needs the deletion-variant sidecar
    from typesense_ray.typo import build_typo_table

    build_typo_table(coll._local.index_dir)
    syn2 = SynonymIndex()
    syn2.add_synonym("crimson", ["shoez"])
    c3 = RayCollection(coll._local.index_dir, default_sorting_field="size",
                       synonyms=syn2)
    assert c3.search("crimson", num_typos=0)["found"] == 0
    r = c3.search("crimson", num_typos=1)
    assert sorted(ids(r)) == [1, 2]  # both 'shoes' docs via typo distance 1


def test_malformed_curation_params_are_skipped(coll):
    """Malformed pinned_hits/hidden_hits pieces are skipped (matching the
    search path's swallow-malformed-filters behavior) — one bad curation
    param never turns a search into an exception."""
    r = coll.search("red", pinned_hits="9,x:1,5:notanint,:, 8:2",
                    hidden_hits="oops,1,")
    got = ids(r)
    assert 1 not in got            # the one well-formed hidden id applies
    assert got[1] == 8             # the one well-formed pin applies
    # entirely-garbage params degrade to a plain search
    r2 = coll.search("red", pinned_hits=":::", hidden_hits="abc")
    assert r2["found"] == 4


def test_facet_query_highlight_raw_offsets():
    """The <mark> span maps normalized offsets back to RAW offsets:
    leading punctuation stripped by normalization must not shift the
    highlighted span onto the wrong characters."""
    from typesense_ray.collection import _facet_query_highlight

    assert _facet_query_highlight(".Omega", ["omeg"]) == \
        ".<mark>Omeg</mark>a"
    assert _facet_query_highlight("Omega", ["omeg"]) == "<mark>Omeg</mark>a"
    # earlier query tokens wrap whole words; the last token's prefix span
    # still maps through the stripped leading paren
    assert _facet_query_highlight("(Omega) Watch", ["watch", "omeg"]) == \
        "(<mark>Omeg</mark>a) <mark>Watch</mark>"
