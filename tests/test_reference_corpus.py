"""Query-conformance tests ported from the reference's own main corpus
(CollectionTest, ``test/collection_test.cpp``; fixture
``test/documents.jsonl`` + the dummy record id 0 the suite prepends,
``:46-48``). Searches run in reference mode with the fixture's sort
spec (text_match DESC, points DESC).

Where the reference's expected order depends ONLY on (match score,
points) it is asserted exactly; where adjacent hits tie on both, the
reference breaks ties by insertion seq_id (larger first) while this
engine uses data-derived doc ids (a documented divergence, SURVEY §7.4),
so those groups are asserted as sets."""

import json
import os

import pytest

from typesense_ray.collection import RayCollection
from typesense_ray.index_build import IndexConfig, build_index
from typesense_ray.typo import build_term_max_static, build_typo_table

REF_JSONL = "/root/reference/test/documents.jsonl"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_JSONL),
    reason="reference corpus not available",
)


@pytest.fixture(scope="module")
def ref_coll(ray_session, tmp_path_factory):
    import ray.data as rd

    docs = [{"ref_id": "0", "title": "z", "points": 10}]  # dummy record
    for i, line in enumerate(open(REF_JSONL)):
        d = json.loads(line)
        docs.append(
            {"ref_id": d.get("id", str(i + 1)), "title": d["title"],
             "points": int(d["points"])}
        )
    out = str(tmp_path_factory.mktemp("refcorpus"))
    cfg = IndexConfig(
        text_field="title", id_field="ref_id", sha_field=None, batch_docs=8,
        meta_fields=("ref_id", "title", "points"),
    )
    build_index(rd.from_items(docs), out, cfg, concurrency=2)
    build_typo_table(out)
    build_term_max_static(out, "points")
    return RayCollection(out, default_sorting_field="points")


def ids(r):
    return [h["document"]["ref_id"] for h in r["hits"]]


def assert_groups(got, groups):
    """Exact order across tie groups, set equality within them."""
    i = 0
    for g in groups:
        chunk = got[i:i + len(g)]
        assert set(chunk) == set(g), (got, groups)
        i += len(g)
    assert i == len(got)


def test_verify_count_and_get_by_id(ref_coll):
    # CollectionTest.VerifyCountOfDocuments / RetrieveADocumentById
    assert ref_coll.stats["n_docs"] == 25
    assert ref_coll.get_document("1")["ref_id"] == "1"
    assert ref_coll.get_document("foo")["ref_id"] == "foo"
    assert ref_coll.get_document("baz") is None


def test_exact_search_stable(ref_coll):
    # CollectionTest.ExactSearchShouldBeStable (:106-145)
    r = ref_coll.search("the", mode="reference")
    assert r["found"] == 7
    # groups: pts 15 | {13, 13} | {12, 12, 12} | 10
    assert_groups(ids(r), [["1"], ["6", "foo"], ["13", "10", "8"], ["16"]])

    r = ref_coll.search("the", mode="reference", sort_by="points:asc")
    assert_groups(ids(r), [["16"], ["13", "10", "8"], ["6", "foo"], ["1"]])

    r = ref_coll.search("zxsadqewsad", mode="reference")
    assert r["hits"] == [] and r["found"] == 0


def test_phrase_search_ranking(ref_coll):
    # CollectionTest.PhraseSearch (:147-206): sort by (match, points);
    # all five hits separate on (match, points) so the order is exact
    r = ref_coll.search("rocket launch", mode="reference")
    assert r["found"] == 5
    assert ids(r) == ["8", "1", "17", "16", "13"]
    hl = r["hits"][0]["highlights"][0]
    assert hl["field"] == "title"
    assert hl["snippet"] == ("What is the power requirement of a "
                             "<mark>rocket</mark> <mark>launch</mark> "
                             "these days?")

    # explicit (text_match desc, points asc)
    r = ref_coll.search("rocket launch", mode="reference",
                        sort_by="_text_match:desc,points:asc")
    assert ids(r) == ["8", "17", "1", "16", "13"]

    # pagination
    r = ref_coll.search("rocket launch", mode="reference", per_page=3)
    assert len(r["hits"]) == 3 and r["found"] == 5
    assert ids(r) == ["8", "1", "17"]


def test_excluded_tokens(ref_coll):
    # CollectionTest.SearchWithExcludedTokens (:208-232)
    r = ref_coll.search("how -propellants -are", mode="reference")
    assert r["found"] == 2
    assert ids(r) == ["9", "17"]
    # exclusion-only query = wildcard minus matches (25 docs, 4 rocket)
    r = ref_coll.search("-rocket", mode="reference", per_page=50)
    assert r["found"] == 21
    r = ref_coll.search("-rocket -cryovolcanism", mode="reference",
                        per_page=50)
    assert r["found"] == 20


def test_skip_unindexed_tokens(ref_coll):
    # CollectionTest.SkipUnindexedTokensDuringPhraseSearch (:234-...):
    # unknown tokens drop, the rest still match
    r = ref_coll.search("DoesNotExist from", mode="reference")
    assert ids(r) == ["2", "17"]


def test_partial_phrase_search(ref_coll):
    # CollectionTest.PartialPhraseSearch (:303-317); "10"/"8" tie on
    # (single-token match, points 12) — set-asserted
    r = ref_coll.search("rocket research", mode="reference")
    assert r["found"] == 6
    assert_groups(ids(r), [["19"], ["1"], ["10", "8"], ["16"], ["17"]])


def test_query_with_typo(ref_coll):
    # CollectionTest.QueryWithTypo (:318-345)
    r = ref_coll.search("kind biologcal", mode="reference", num_typos=2,
                        per_page=3)
    assert ids(r) == ["19", "3", "20"]
    # "fer thx" at 1 typo: fer→for, thx→the, conjunctive + proximity
    r = ref_coll.search("fer thx", mode="reference", num_typos=1,
                        per_page=3)
    assert ids(r) == ["1", "10", "13"]


def test_wildcard_query(ref_coll):
    # CollectionTest.WildcardQuery (:478-519) shape on the pristine
    # corpus (the reference's own id expectations there reflect doc
    # mutations made by earlier tests in its shared fixture): all docs
    # found, top-3 by points desc
    r = ref_coll.search("*", mode="reference", per_page=3)
    assert r["found"] == 25
    assert len(r["hits"]) == 3
    assert ids(r) == ["19", "22", "18"]  # points 18, 17, 16


def test_pagination(ref_coll):
    # CollectionTest.Pagination (:437-477): pages slice the same global
    # order; found stays constant
    full = ids(ref_coll.search("the", mode="reference", per_page=10))
    for page in (1, 2, 3):
        r = ref_coll.search("the", mode="reference", per_page=3, page=page)
        assert r["found"] == 7
        assert ids(r) == full[(page - 1) * 3 : page * 3]
    assert len(ids(ref_coll.search("the", mode="reference", per_page=3,
                                   page=3))) == 1


def test_typo_token_ranked_by_score_and_frequency(ref_coll):
    # CollectionTest.TypoTokenRankedByScoreAndFrequency (:346-405):
    # loox -> {look, loop} at distance 1; all hits are single-token
    # cost-1 matches so the order is pure points desc — portable
    r = ref_coll.search("loox", mode="reference", num_typos=1, per_page=2,
                        token_order="max_score")
    assert ids(r) == ["22", "3"]
    r = ref_coll.search("loox", mode="reference", num_typos=1, per_page=3)
    assert ids(r) == ["22", "3", "12"]
    r = ref_coll.search("loox", mode="reference", num_typos=1, per_page=1)
    assert r["found"] == 5 and ids(r) == ["22"]
    for order in ("frequency", "max_score"):
        r = ref_coll.search("loox", mode="reference", num_typos=1,
                            per_page=10, token_order=order)
        assert ids(r) == ["22", "3", "12", "23", "24"], order


def test_text_containing_an_actual_typo(ref_coll):
    # CollectionTest.TextContainingAnActualTypo (:406-436): the query
    # token ISX exists in one doc; correction to ISS must still happen.
    # Both golden orders reproduce EXACTLY (up to the documented seq-id
    # tie-break divergence) once the reference's length-mismatch scoring
    # penalty is modelled (next_suggestion, src/index.cpp:2040-2042):
    # the shorter-by-one candidate "is" scores one cost level below the
    # same-length substitution "iss", which is why every iss-doc ranks
    # above every is-doc even when points disagree (id21 pts 7 over
    # id4 pts 13).
    r = ref_coll.search("ISX what", mode="reference", num_typos=1,
                        per_page=4)
    assert r["found"] == 13
    assert ids(r) == ["19", "6", "21", "8"]  # the reference's own golden

    r = ref_coll.search("ISX", mode="reference", num_typos=1, per_page=10)
    assert r["found"] == 8
    # reference golden {20,19,6,3,21,4,10,8}: {6,3} tie on
    # (score, points 13) and {10,8} on (score, points 12) — seq-id
    # tie-break groups; everything else exact
    assert_groups(
        ids(r), [["20"], ["19"], ["6", "3"], ["21"], ["4"], ["10", "8"]]
    )


def test_prefix_searching(ref_coll):
    # CollectionTest.PrefixSearching (:520-602)
    r = ref_coll.search("ex", mode="reference", prefix=True)
    assert ids(r) == ["6", "12"]
    r = ref_coll.search("ex", mode="reference", prefix=True,
                        token_order="max_score")
    assert ids(r) == ["6", "12"]

    # conjunctive prefix + drop-token tail; {13, 8} tie on points 12
    r = ref_coll.search("what ex", mode="reference", prefix=True,
                        token_order="max_score")
    assert r["found"] == 9
    assert_groups(
        ids(r),
        [["6"], ["12"], ["19"], ["22"], ["13", "8"], ["15"], ["24"], ["21"]],
    )

    # single-letter prefix under MAX_SCORE: candidate cap ranked by the
    # stored per-term max-static (then/18, triple/17 make the cut) —
    # exact reference parity. (Under FREQUENCY the reference's top-10
    # cap tie-order follows its trie traversal, which is not a
    # documented ordering; ours breaks df ties alphabetically.)
    r = ref_coll.search("t", mode="reference", prefix=True, per_page=2,
                        token_order="max_score")
    assert ids(r) == ["19", "22"]

    # unknown prefix on the last token drops it; the surviving token
    # still prefix-expands (math -> mathematics). The reference returns
    # 0 hits here, which contradicts its own token-erase semantics
    # (src/index.cpp:1717-1731 re-runs with the remaining tokens and
    # prefix still applies to the new last token) — we keep the
    # documented behavior.
    r = ref_coll.search("math fx", mode="reference", prefix=True,
                        per_page=1)
    assert ids(r) == ["14"]

    # 1-char token: bounded typo cost 0 and no x-prefix terms
    r = ref_coll.search("x", mode="reference", prefix=True, num_typos=2,
                        per_page=2)
    assert r["found"] == 0
    # last-token typo'd prefix: propx -> propellants
    r = ref_coll.search("late propx", mode="reference", prefix=True,
                        num_typos=2, per_page=1)
    assert ids(r) == ["16"]


def test_multi_occurrence_string(ray_session, tmp_path):
    # CollectionTest.MultiOccurrenceString (:621-645): a token repeated
    # many times in one doc still produces exactly one hit
    import ray.data as rd

    doc = {"ref_id": "0",
           "title": "The brown fox was the tallest of the lot and the "
                    "quickest of the trot.",
           "points": 100}
    out = str(tmp_path / "multi")
    cfg = IndexConfig(
        text_field="title", id_field="ref_id", sha_field=None, batch_docs=4,
        meta_fields=("ref_id", "title", "points"),
    )
    build_index(rd.from_items([doc]), out, cfg, concurrency=1)
    coll = RayCollection(out, default_sorting_field="points")
    r = coll.search("the", mode="reference")
    assert r["found"] == 1 and len(r["hits"]) == 1


def test_match_score_vectors():
    """Ports MatchTest.MatchScoreV2 + TokenOffsetsExceedWindowSize
    (test/match_score_test.cpp) onto the ported Match kernel
    (scoring.match_words_distance): exact (words_present, distance)
    vectors, including the multi-occurrence window advance, the
    3-token far-cluster case and the no-window-covers-all case."""
    import numpy as np

    from typesense_ray.scoring import WINDOW_SIZE, match_words_distance

    # 12 tokens all at offset 1: capped at WINDOW_SIZE words
    words, _ = match_words_distance([np.array([1])] * 12)
    assert words == WINDOW_SIZE

    words, dist = match_words_distance(
        [np.array([25]), np.array([26]),
         np.array([11, 18, 24, 60]), np.array([14, 27, 63])]
    )
    assert (words, dist) == (4, 97)

    words, dist = match_words_distance(
        [np.array([38, 50, 170, 187, 195, 222]),
         np.array([39, 140, 171, 189, 223]),
         np.array([169, 180])]
    )
    assert (words, dist) == (3, 98)

    words, dist = match_words_distance(
        [np.array([38, 50, 187, 195, 201]),
         np.array([120, 167, 171, 223]),
         np.array([240, 250])]
    )
    assert (words, dist) == (1, 100)


def test_synonym_reduction_one_way_and_multiway():
    """Ports CollectionSynonymsTest.SynonymReductionOneWay + MultiWay
    (test/collection_synonyms_test.cpp:146-268) onto SynonymIndex.expand
    — the exact synonym_reduction recursion: leaf-only emission,
    non-overlapping reductions composing into one variant, no reverse
    application, multiway alternatives as separate leaves."""
    from typesense_ray.collection import SynonymIndex

    syn = SynonymIndex()
    syn.add_synonym("nyc", ["new york"])
    assert syn.expand(["red", "nyc", "tshirt"]) == \
        [["red", "new", "york", "tshirt"]]
    assert syn.expand(["foo", "bar", "baz"]) == []

    # compression rule must not revert through the expansion rule
    syn.add_synonym("new york", ["nyc"])
    assert syn.expand(["red", "new", "york", "tshirt"]) == \
        [["red", "nyc", "tshirt"]]

    # two same-length reductions compose into ONE variant
    syn.add_synonym("t shirt", ["tshirt"])
    assert syn.expand(["new", "york", "t", "shirt"]) == [["nyc", "tshirt"]]

    # different-length reductions compose too
    syn.add_synonym("red", ["crimson"])
    assert syn.expand(["red", "new", "york", "cap"]) == \
        [["crimson", "nyc", "cap"]]

    # multiway: each alternative is its own leaf
    syn2 = SynonymIndex()
    syn2.add_multiway(["ipod", "i pod", "pod"])
    assert syn2.expand(["ipod"]) == [["i", "pod"], ["pod"]]
    assert syn2.expand(["i", "pod"]) == [["ipod"], ["pod"]]

    syn2.add_multiway(
        ["usa", "united states", "us", "united states of america", "states"]
    )
    out = syn2.expand(["united", "states"])
    assert out == [["usa"], ["us"],
                   ["united", "states", "of", "america"], ["states"]]


def test_exact_match_ranked_same_as_synonym_match(ray_session, tmp_path):
    """Ports CollectionSynonymsTest.ExactMatchRankedSameAsSynonymMatch
    (:372-424): multiway members carry no cost penalty, so
    synonym-matched docs rank purely by points against exact matches."""
    import ray.data as rd

    from typesense_ray.collection import SynonymIndex

    rows = [
        ("0", "Laughing out Loud", 100),
        ("1", "Stop Laughing", 120),
        ("2", "LOL sure", 200),
        ("3", "Really ROFL now", 250),
    ]
    docs = [{"ref_id": r, "title": t, "points": p} for r, t, p in rows]
    out = str(tmp_path / "synrank")
    cfg = IndexConfig(
        text_field="title", id_field="ref_id", sha_field=None, batch_docs=8,
        meta_fields=("ref_id", "title", "points"),
    )
    build_index(rd.from_items(docs), out, cfg, concurrency=1)
    syn = SynonymIndex()
    syn.add_multiway(["Lol", "ROFL", "laughing"])
    coll = RayCollection(out, default_sorting_field="points", synonyms=syn)
    r = coll.search("laughing", mode="reference", drop_tokens_threshold=0)
    assert r["found"] == 4
    assert ids(r) == ["3", "2", "1", "0"]


def test_query_bool_fields(ray_session, tmp_path):
    """Ports CollectionTest.QueryBoolFields (:1412-1520, corpus
    test/bool_documents.jsonl): scalar and bool[] filters, := form,
    IN-lists; ratings are distinct so order is exact."""
    import json as _json

    import ray.data as rd

    docs = []
    for i, line in enumerate(open("/root/reference/test/bool_documents.jsonl")):
        d = _json.loads(line)
        docs.append({"ref_id": str(i), "title": d["title"],
                     "popular": d["popular"], "rating": d["rating"],
                     "bool_array": d["bool_array"]})
    out = str(tmp_path / "boolidx")
    cfg = IndexConfig(
        text_field="title", id_field="ref_id", sha_field=None, batch_docs=16,
        meta_fields=("ref_id", "title", "popular", "rating", "bool_array"),
    )
    build_index(rd.from_items(docs), out, cfg, concurrency=1)
    coll = RayCollection(out, default_sorting_field="rating")

    def got(filter_by=""):
        r = coll.search("the", mode="reference", filter_by=filter_by,
                        per_page=10)
        return ids(r)

    assert got() == ["1", "3", "4", "9", "2"]           # rating desc
    assert got("popular:true") == ["1", "3", "4"]
    assert got("popular:=true") == ["1", "3", "4"]
    assert got("popular:false") == ["9", "2"]
    assert got("bool_array:[true, false]") == ["1", "3", "4", "9", "2"]
    assert got("bool_array: true") == ["1", "4", "9", "2"]
    assert got("bool_array:[true]") == ["1", "4", "9", "2"]


@pytest.fixture(scope="module")
def tags_coll(ray_session, tmp_path_factory):
    import json as _json

    import ray.data as rd

    docs = []
    path = "/root/reference/test/numeric_array_documents.jsonl"
    for i, line in enumerate(open(path)):
        d = _json.loads(line)
        docs.append({"ref_id": str(i), "name": d["name"], "age": d["age"],
                     "years": d["years"], "timestamps": d["timestamps"],
                     "tags": d["tags"]})
    out = str(tmp_path_factory.mktemp("tagsidx"))
    cfg = IndexConfig(
        text_field="name", id_field="ref_id", sha_field=None, batch_docs=8,
        meta_fields=("ref_id", "name", "age", "years", "timestamps", "tags"),
    )
    build_index(rd.from_items(docs), out, cfg, concurrency=1)
    return RayCollection(out, default_sorting_field="age")


def test_filter_on_text_fields(tags_coll):
    # CollectionFilteringTest.FilterOnTextFields (:37-121, corpus
    # test/numeric_array_documents.jsonl): string[] tag filters,
    # multi-token values, IN-lists, comparators ignored on strings
    def got(filter_by):
        r = tags_coll.search("jeremy", mode="reference",
                             filter_by=filter_by, per_page=10)
        return ids(r)

    assert got("tags: gold") == ["4", "0", "2"]
    assert got("tags : fine PLATINUM") == ["1"]
    assert got("tags : bronze") == ["4", "2"]
    assert got("tags: [bronze,   silver]") == ["3", "4", "0", "2"]
    # comparators are meaningless on strings and are ignored
    assert got("tags:<bronze") == ["4", "2"]
    assert got("tags:>BRONZE") == ["4", "2"]


def test_badly_formed_filters_yield_zero_hits(tags_coll):
    # CollectionFilteringTest.HandleBadlyFormedFilterQuery (:156-209):
    # unknown fields / unparseable values give 0 hits, blank filters
    # are ignored
    def found(filter_by):
        return tags_coll.search("jeremy", mode="reference",
                                filter_by=filter_by, per_page=10)["found"]

    assert found("tagzz: gold") == 0
    assert found("age: abcdef") == 0
    assert found("timestamps: abcdef") == 0
    assert found("timestamps abcdef") == 0
    assert found("  ") == 5
    assert found("age: '21'") == 0


def test_deletion_of_a_document(ray_session, tmp_path):
    """Ports CollectionTest.DeletionOfADocument (:1734-1814) onto the
    ops surface: remove by user id (auto and custom 'foo'), searches
    stop finding the removed docs, and removing everything empties the
    collection."""
    import json as _json

    import ray.data as rd

    from typesense_ray.index_build import doc_id_from_key
    from typesense_ray.ops import delete_by_filter

    docs = [{"ref_id": "0", "title": "z", "points": 10}]
    for i, line in enumerate(open(REF_JSONL)):
        d = _json.loads(line)
        docs.append({"ref_id": d.get("id", str(i + 1)),
                     "title": d["title"], "points": int(d["points"])})
    out = str(tmp_path / "delidx")
    cfg = IndexConfig(
        text_field="title", id_field="ref_id", sha_field=None, batch_docs=8,
        meta_fields=("ref_id", "title", "points"),
    )
    build_index(rd.from_items(docs), out, cfg, concurrency=2)

    coll = RayCollection(out, default_sorting_field="points")
    assert coll.stats["n_docs"] == 25
    assert coll.search("cryogenic", mode="reference")["found"] == 1

    delete_by_filter(out, doc_ids=[doc_id_from_key("1")])
    coll = RayCollection(out, default_sorting_field="points")
    assert coll.stats["n_docs"] == 24
    r = coll.search("cryogenic", mode="reference")
    assert r["found"] == 0 and r["hits"] == []
    assert coll.search("archives", mode="reference")["found"] == 1

    delete_by_filter(out, doc_ids=[doc_id_from_key("foo")])  # custom id
    coll = RayCollection(out, default_sorting_field="points")
    r = coll.search("martian", mode="reference")
    assert r["found"] == 0 and r["hits"] == []

    remaining = [d["ref_id"] for d in docs
                 if d["ref_id"] not in ("1", "foo")]
    delete_by_filter(out, doc_ids=[doc_id_from_key(x) for x in remaining])
    coll = RayCollection(out, default_sorting_field="points")
    assert coll.stats["n_docs"] == 0


def test_optional_fields(ray_session, tmp_path):
    """Ports CollectionTest.OptionalFields (:2434-2519, corpus
    test/optional_fields.jsonl): docs missing optional fields index
    fine; searching an optional field matches only docs that have it;
    numeric filters and facet counts skip nulls."""
    import json as _json

    import ray.data as rd

    docs = []
    for i, line in enumerate(open("/root/reference/test/optional_fields.jsonl")):
        d = _json.loads(line)
        docs.append({
            "ref_id": str(i), "title": d["title"],
            "description": d.get("description"),
            "max": d.get("max"), "average": d.get("average"),
        })
    out = str(tmp_path / "optidx")
    cfg = IndexConfig(
        text_field="title", id_field="ref_id", sha_field=None, batch_docs=8,
        meta_fields=("ref_id", "title", "description", "max", "average"),
        indexed_fields=("description",),
    )
    build_index(rd.from_items(docs), out, cfg, concurrency=1)
    coll = RayCollection(out, default_sorting_field="max")

    assert coll.search("*", mode="reference")["found"] == 6
    # only 5 docs carry the optional description
    r = coll.search("book", mode="reference", query_by=["description"])
    assert r["found"] == 5
    # numeric filter over an optional float skips the null doc
    r = coll.search("the", mode="reference", filter_by="average: >0")
    assert r["found"] == 5
    # facet on the optional field counts only docs that have it
    r = coll.search("the", mode="reference", facet_by="description")
    assert r["found"] == 6
    fc = r["facet_counts"][0]
    assert fc["field_name"] == "description"
    assert fc["counts"][0]["count"] == 5


def test_search_large_text_field(ray_session, tmp_path):
    """Ports CollectionTest.SearchLargeTextField (:1892-1949, corpus
    test/large_text_field.jsonl): rare token, shared token, and a query
    longer than the proximity WINDOW_SIZE (words_present caps at the
    window) with the doc containing the full run ranked first."""
    import json as _json

    import ray.data as rd

    docs = []
    for i, line in enumerate(open("/root/reference/test/large_text_field.jsonl")):
        d = _json.loads(line)
        docs.append({"ref_id": str(i), "text": d["text"],
                     "age": int(d["age"])})
    out = str(tmp_path / "largetext")
    cfg = IndexConfig(
        text_field="text", id_field="ref_id", sha_field=None, batch_docs=4,
        meta_fields=("ref_id", "text", "age"),
    )
    build_index(rd.from_items(docs), out, cfg, concurrency=1)
    coll = RayCollection(out, default_sorting_field="age")

    assert coll.search("eguilazer", mode="reference")["found"] == 1
    assert coll.search("tristique", mode="reference")["found"] == 2
    r = coll.search(
        "Phasellus non tristique elit Praesent non arcu id lectus "
        "accumsan venenatis at",
        mode="reference",
    )
    assert r["found"] == 2
    assert ids(r)[0] == "1"


def test_multiple_fields(ray_session, tmp_path):
    """Ports CollectionTest.MultipleFields (:828-945, corpus
    test/multi_field_documents.jsonl): query_by across scalar +
    string[] fields, per-field weighting order, and a string[] filter
    combined with a title query. (The chris/chris-pine/myers cases are
    already covered on this corpus in test_multifield.py.)"""
    import json as _json

    import ray.data as rd

    docs = []
    path = "/root/reference/test/multi_field_documents.jsonl"
    for i, line in enumerate(open(path)):
        d = _json.loads(line)
        docs.append({"ref_id": str(i), "title": d["title"],
                     "starring": d["starring"], "cast": d["cast"],
                     "points": int(d["points"])})
    out = str(tmp_path / "mulidx")
    cfg = IndexConfig(
        text_field="title", id_field="ref_id", sha_field=None, batch_docs=8,
        meta_fields=("ref_id", "title", "starring", "cast", "points"),
        indexed_fields=("starring", "cast"),
    )
    build_index(rd.from_items(docs), out, cfg, concurrency=1)
    coll = RayCollection(out, default_sorting_field="points")

    r = coll.search("Will", mode="reference",
                    query_by=["title", "starring"], per_page=10)
    assert r["found"] == 4
    assert ids(r) == ["3", "2", "1", "0"]

    r = coll.search("thomas", mode="reference",
                    query_by=["starring", "title"], per_page=10)
    assert r["found"] == 4
    assert ids(r) == ["15", "12", "13", "14"]

    r = coll.search("ben affleck", mode="reference",
                    query_by=["starring", "title", "cast"], per_page=10)
    assert r["found"] == 1

    # string[] filter intersected with a title query
    r = coll.search("captain", mode="reference", filter_by="cast: chris",
                    per_page=10)
    assert ids(r) == ["6"]
