"""Conformance ports of the reference's multi-field relevance /
match-ranking cases (``test/collection_test.cpp``: MultiFieldRelevance
:2634, MultiFieldRelevance2 :2734, FieldWeightsNotProper :2785,
MultiFieldRelevance3 :2831, MultiFieldMatchRanking :2874,
MultiFieldMatchRankingOnArray :2923, MultiFieldMatchRankingOnFieldOrder
:2965, PrefixRankedAfterExactMatch :3005, HighlightWithAccentedCharacters
:3045). Every expected hit order is the reference's own golden
assertion; where the reference removes + re-adds records in another
order, a second collection is built with the reordered records (the
engine's ids are data-derived, so a fresh build is the same statement
of insertion-order independence)."""

import pyarrow as pa
import pytest

from typesense_ray.collection import RayCollection
from typesense_ray.index_build import IndexConfig, build_index
from typesense_ray.typo import build_term_max_static, build_typo_table


def build_coll(tmp_path_factory, tag, columns, text_field="title",
               indexed=("artist",), default_sort="points"):
    """Small ad-hoc collection like the reference's create_collection."""
    import ray.data as rd

    tbl = pa.table(columns)
    out = str(tmp_path_factory.mktemp(tag))
    cfg = IndexConfig(
        text_field=text_field, id_field="ref_id", sha_field=None,
        batch_docs=4, meta_fields=tuple(columns.keys()),
        indexed_fields=tuple(indexed),
    )
    build_index(rd.from_arrow(tbl), out, cfg, concurrency=1)
    build_typo_table(out)
    build_term_max_static(out, "points")
    return RayCollection(out, default_sorting_field=default_sort)


def title_artist(tmp_path_factory, tag, records):
    return build_coll(
        tmp_path_factory, tag,
        {
            "ref_id": pa.array([str(i) for i in range(len(records))]),
            "title": pa.array([r[0] for r in records]),
            "artist": pa.array([r[1] for r in records]),
            "points": pa.array(list(range(len(records))), pa.int64()),
        },
    )


def ids(r):
    return [h["document"]["ref_id"] for h in r["hits"]]


def test_multi_field_relevance(ray_session, tmp_path_factory):
    # CollectionTest.MultiFieldRelevance (:2634-2733)
    coll = title_artist(tmp_path_factory, "mfr1", [
        ("Down There by the Train", "Dustin Kensrue"),
        ("Down There by the Train", "Gord Downie"),
        ("State Trooper", "Dustin Kensrue"),
    ])
    r = coll.search("Dustin Kensrue Down There by the Train",
                    query_by=["title", "artist"], mode="reference")
    assert r["found"] == 3 and ids(r) == ["0", "1", "2"]
    snippets = [h["highlights"][0]["snippet"] for h in r["hits"]]
    assert snippets[0] == ("<mark>Down</mark> <mark>There</mark> "
                           "<mark>by</mark> <mark>the</mark> "
                           "<mark>Train</mark>")
    assert snippets[1] == snippets[0]
    assert snippets[2] == "<mark>Dustin</mark> <mark>Kensrue</mark>"

    # records re-added in another order → expected order tracks content,
    # not insertion order (:2686-2718)
    coll2 = title_artist(tmp_path_factory, "mfr1b", [
        ("State Trooper", "Dustin Kensrue"),
        ("Down There by the Train", "Gord Downie"),
        ("Down There by the Train", "Dustin Kensrue"),
    ])
    r = coll2.search("Dustin Kensrue Down There by the Train",
                     query_by=["title", "artist"], mode="reference")
    assert r["found"] == 3 and ids(r) == ["2", "1", "0"]

    # with exclude-token syntax (:2720-2731)
    r = coll2.search("-downie dustin kensrue down there by the train",
                     query_by=["title", "artist"], mode="reference")
    assert r["found"] == 2 and ids(r) == ["2", "0"]


def test_multi_field_relevance_2(ray_session, tmp_path_factory):
    # CollectionTest.MultiFieldRelevance2 (:2734-2783)
    coll = title_artist(tmp_path_factory, "mfr2", [
        ("A Daikon Freestyle", "Ghosts on a Trampoline"),
        ("Leaving on a Jetplane", "Coby Grant"),
    ])
    r = coll.search("on a jetplane", query_by=["title", "artist"],
                    mode="reference")
    assert r["found"] == 2 and ids(r) == ["1", "0"]
    # weights {1, 4} favouring artist keep the same order — token
    # coverage dominates the per-field weight
    r = coll.search("on a jetplane", query_by=["title", "artist"],
                    query_by_weights=[1, 4], mode="reference")
    assert ids(r) == ["1", "0"]


def test_field_weights_not_proper(ray_session, tmp_path_factory):
    # CollectionTest.FieldWeightsNotProper (:2785-2829)
    coll = title_artist(tmp_path_factory, "mfw", [
        ("A Daikon Freestyle", "Ghosts on a Trampoline"),
    ])
    with pytest.raises(ValueError, match="Number of weights"):
        coll.search("on a jetplane", query_by=["title", "artist"],
                    query_by_weights=[1], mode="reference")
    with pytest.raises(ValueError, match="Number of weights"):
        coll.search("on a jetplane", query_by=["title"],
                    query_by_weights=[2, 1], mode="reference")
    # empty weights are fine (defaulted)
    r = coll.search("on a jetplane", query_by=["title"],
                    query_by_weights=[], mode="reference")
    assert isinstance(r["found"], int)


def test_multi_field_relevance_3(ray_session, tmp_path_factory):
    # CollectionTest.MultiFieldRelevance3 (:2831-2872): equal weights —
    # doc 1 covers all three query tokens across fields, doc 0 only two
    coll = title_artist(tmp_path_factory, "mfr3", [
        ("Taylor Swift Karaoke: reputation", "Taylor Swift"),
        ("Style", "Taylor Swift"),
    ])
    r = coll.search("style taylor swift", query_by=["title", "artist"],
                    query_by_weights=[1, 1], mode="reference")
    assert r["found"] == 2 and ids(r) == ["1", "0"]


def test_multi_field_match_ranking(ray_session, tmp_path_factory):
    # CollectionTest.MultiFieldMatchRanking (:2874-2921): the full
    # 3-token cover ranks first, the remaining 2-token ties break by
    # points desc
    titles = ["Style", "Blank Space", "Balance Overkill", "Cardigan",
              "Invisible String", "The Last Great American Dynasty",
              "Mirrorball", "Peace", "Betty", "Mad Woman"]
    coll = title_artist(tmp_path_factory, "mfmr",
                        [(t, "Taylor Swift") for t in titles])
    r = coll.search("taylor swift style", query_by=["artist", "title"],
                    mode="reference", per_page=3, prefix=True,
                    drop_tokens_threshold=5)
    assert r["found"] == 10
    assert ids(r) == ["0", "9", "8"]


def test_multi_field_match_ranking_on_array(ray_session, tmp_path_factory):
    # CollectionTest.MultiFieldMatchRankingOnArray (:2923-2963): both
    # tokens in the FIRST array field outrank a cross-field cover
    coll = build_coll(
        tmp_path_factory, "mfarr",
        {
            "ref_id": pa.array(["0", "1"]),
            "name": pa.array(["John Snow", "Jack Dan"]),
            "strong_skills": pa.array(
                [["Golang", "Vue", "React"], ["Golang", "Phoenix", "React"]],
                pa.list_(pa.string())),
            "skills": pa.array(
                [["Docker", "Goa", "Elixir"], ["Docker", "Vue", "Kubernetes"]],
                pa.list_(pa.string())),
            "points": pa.array([0, 1], pa.int64()),
        },
        text_field="name", indexed=("strong_skills", "skills"),
    )
    r = coll.search("golang vue", query_by=["strong_skills", "skills"],
                    mode="reference", per_page=3, prefix=True,
                    drop_tokens_threshold=5)
    assert r["found"] == 2 and ids(r) == ["0", "1"]


def test_multi_field_match_ranking_on_field_order(ray_session,
                                                  tmp_path_factory):
    # CollectionTest.MultiFieldMatchRankingOnFieldOrder (:2965-3003):
    # a 2-token artist cover beats a 1-token title cover even though
    # title is the first query_by field
    coll = title_artist(tmp_path_factory, "mford", [
        ("Toxic", "Britney Spears"),
        ("Bad", "Michael Jackson"),
    ])
    r = coll.search("michael jackson toxic", query_by=["title", "artist"],
                    mode="reference", per_page=3, prefix=True,
                    drop_tokens_threshold=5)
    assert r["found"] == 2 and ids(r) == ["1", "0"]


def test_prefix_ranked_after_exact_match(ray_session, tmp_path_factory):
    # CollectionTest.PrefixRankedAfterExactMatch (:3005-3043): exact
    # token 'roti' (docs 2, 1 by points desc) before prefix expansions
    # to 'rotini' (doc 3 wins the remaining slot on points)
    coll = build_coll(
        tmp_path_factory, "prexact",
        {
            "ref_id": pa.array(["0", "1", "2", "3"]),
            "title": pa.array(["Rotini Puttanesca",
                               "Poulet Roti Tout Simple",
                               "Chapatis (Roti)",
                               "School Days Rotini Pasta Salad"]),
            "points": pa.array([0, 1, 2, 3], pa.int64()),
        },
        indexed=(),
    )
    r = coll.search("roti", mode="reference", per_page=3, prefix=True,
                    drop_tokens_threshold=5)
    assert r["found"] == 4
    assert ids(r) == ["2", "1", "3"]


def test_highlight_with_accented_characters(ray_session, tmp_path_factory):
    # CollectionTest.HighlightWithAccentedCharacters (:3045-3085):
    # accents survive in snippet and matched_tokens; double spaces in
    # the original text are preserved verbatim
    coll = build_coll(
        tmp_path_factory, "accents",
        {
            "ref_id": pa.array(["0", "1", "2"]),
            "title": pa.array(["Mise à  jour  Timy depuis PC",
                               "Down There by the Train",
                               "State Trooper"]),
            "points": pa.array([0, 1, 2], pa.int64()),
        },
        indexed=(),
    )
    r = coll.search("à jour", mode="reference")
    assert r["found"] == 1
    hl = r["hits"][0]["highlights"][0]
    assert hl["snippet"] == ("Mise <mark>à</mark>  <mark>jour</mark>  "
                             "Timy depuis PC")
    assert hl["matched_tokens"] == ["à", "jour"]
