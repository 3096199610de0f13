"""Multi-field search (query_by over several fields, weights, arrays)."""

import pyarrow as pa
import pytest

from typesense_ray.collection import RayCollection
from typesense_ray.index_build import IndexConfig, build_index

MOVIES = [
    (0, "Inception", "Leonardo DiCaprio", ["Leonardo DiCaprio", "Tom Hardy"], 90),
    (1, "The Departed", "Leonardo DiCaprio", ["Leonardo DiCaprio", "Matt Damon"], 85),
    (2, "Dark Knight", "Christian Bale", ["Christian Bale", "Heath Ledger"], 95),
    (3, "Leonardo da Vinci Documentary", "Narrator Smith", ["Narrator Smith"], 60),
    (4, "Hardy Boys", "Jake Johnson", ["Jake Johnson", "Tom Hardy"], 50),
]


@pytest.fixture(scope="module")
def movies(ray_session, tmp_path_factory):
    import ray.data as rd

    tbl = pa.table(
        {
            "docnum": pa.array([m[0] for m in MOVIES], pa.int64()),
            "title": pa.array([m[1] for m in MOVIES]),
            "starring": pa.array([m[2] for m in MOVIES]),
            "cast": pa.array([m[3] for m in MOVIES], pa.list_(pa.string())),
            "points": pa.array([m[4] for m in MOVIES], pa.int64()),
        }
    )
    out = str(tmp_path_factory.mktemp("movies"))
    cfg = IndexConfig(
        text_field="title", id_field="docnum", sha_field=None, batch_docs=3,
        meta_fields=("docnum", "title", "starring", "cast", "points"),
        indexed_fields=("starring", "cast"),
    )
    build_index(rd.from_arrow(tbl), out, cfg, concurrency=2)
    return RayCollection(out, default_sorting_field="points")


def ids(resp):
    return [h["document"]["docnum"] for h in resp["hits"]]


def test_search_secondary_field(movies):
    r = movies.search("leonardo", query_by=["starring"], mode="reference")
    assert set(ids(r)) == {0, 1}


def test_search_across_fields(movies):
    r = movies.search("leonardo", query_by=["title", "starring"], mode="reference")
    assert set(ids(r)) == {0, 1, 3}


def test_field_weights_order(movies):
    # title match (doc 3) should outrank starring matches with high title weight
    r = movies.search(
        "leonardo", query_by=["title", "starring"], query_by_weights=[10, 1],
        mode="reference",
    )
    assert ids(r)[0] == 3
    # starring weighted higher → docs 0/1 first
    r2 = movies.search(
        "leonardo", query_by=["title", "starring"], query_by_weights=[1, 10],
        mode="reference",
    )
    assert ids(r2)[0] in (0, 1)
    assert 3 == ids(r2)[-1]


def test_array_field_search(movies):
    r = movies.search("hardy", query_by=["cast"], mode="reference")
    assert set(ids(r)) == {0, 4}


def test_multi_token_conjunction_in_field(movies):
    r = movies.search(
        "tom hardy", query_by=["cast"], mode="reference", drop_tokens_threshold=1
    )
    assert set(ids(r)) == {0, 4}


def test_bm25_multifield(movies):
    # equal explicit weights: with the reference-default n..1 weights the
    # title-only match (doc 3) would out-weigh the two-field matches
    r = movies.search("leonardo", query_by=["title", "starring", "cast"],
                      query_by_weights=[1, 1, 1])
    assert set(ids(r)) == {0, 1, 3}
    # scores positive and aggregated across fields: docs 0/1 match two fields
    scores = {h["document"]["docnum"]: h["score"] for h in r["hits"]}
    assert scores[0] > scores[3] or scores[1] > scores[3]


def test_primary_field_unaffected(movies):
    r = movies.search("inception")
    assert ids(r) == [0]


def test_parquet_path_build_indexes_secondary_fields(ray_session, tmp_path):
    """The file-parallel parquet build path must read cfg.indexed_fields
    columns (they'd otherwise be pruned out and silently never indexed);
    configured-but-absent fields are skipped, not a read error."""
    import pyarrow.parquet as pq

    from typesense_ray.index_build import build_index

    tbl = pa.table(
        {
            "docnum": pa.array([m[0] for m in MOVIES], pa.int64()),
            "title": pa.array([m[1] for m in MOVIES]),
            "starring": pa.array([m[2] for m in MOVIES]),
            "cast": pa.array([m[3] for m in MOVIES], pa.list_(pa.string())),
            "points": pa.array([m[4] for m in MOVIES], pa.int64()),
        }
    )
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(tbl, str(src / "movies.parquet"))
    cfg = IndexConfig(
        text_field="title", id_field="docnum", sha_field=None, batch_docs=3,
        meta_fields=("docnum", "title", "starring", "cast", "points"),
        indexed_fields=("starring", "cast", "not_a_column"),
    )
    out = str(tmp_path / "idx")
    build_index(str(src), out, cfg, concurrency=2)  # path -> file-parallel
    coll = RayCollection(out, default_sorting_field="points")
    r = coll.search("leonardo", query_by=["starring"], mode="reference")
    assert set(ids(r)) == {0, 1}
    r2 = coll.search("hardy", query_by=["cast"], mode="reference")
    assert set(ids(r2)) == {0, 4}


# the reference's own multi-field corpus (test/multi_field_documents.jsonl,
# ids = insertion order) — golden orderings from CollectionTest.MultipleFields
# (test/collection_test.cpp:828-946)
REF_MOVIES = [
    ("Wake Up, Ron Burgundy: The Lost Movie", "Will Ferrell", ["Adam McKay", "Steve Carell", "Paul Rudd"], 62),
    ("Anchorman 2: The Legend Continues", "Will Ferrell", ["Josh Lawson", "Chris Parnell"], 63),
    ("There Will Be Blood", "Daniel Day-Lewis", ["Martin Stringer", "Jacob Stringer", "Harrison Taylor"], 81),
    ("Good Will Hunting", "Robin Williams", ["Matt Damon", "Ben Affleck", "Minnie Driver"], 83),
    ("The Adventures of Huck Finn", "Ron Perlman", ["Elijah Wood", "Courtney B. Vance", "Robbie Coltrane"], 58),
    ("Percy Jackson: Sea of Monsters", "Ron Perlman", ["Logan Lerman", "Alexandra Daddario"], 59),
    ("Captain America: The Winter Soldier", "Samuel L. Jackson", ["Chris Evans", "Scarlett Johansson"], 78),
    ("Quantum Quest: A Cassini Space Odyssey", "Samuel L. Jackson", ["Chris Pine"], 52),
    ("Scott Pilgrim vs. the World", "Michael Cera", ["Alison Pill"], 75),
    ("Homeland Security", "Scott Glenn", ["Tom Skerritt"], 43),
    ("The Paperboy", "Scott Glenn", ["Zac Efron", "Matthew McConaughey"], 58),
    ("The Silence of the Lambs", "Scott Glenn", ["Jodie Foster"], 86),
    ("Confessions of a Shopaholic", "Kristin Scott Thomas", ["Isla Fisher", "Hugh Dancy"], 59),
    ("The Woman in the Fifth from Kristin", "Kristin Scott Thomas", ["Ethan Hawke"], 53),
    ("Odd Thomas", "Matthew Page", ["Anton Yelchin", "Ashley Sommers"], 69),
    ("Suffering Man's Charity", "Henry Thomas", ["Alan Cumming", "Alison Guh", "David Boreanaz"], 69),
    ("The Gospel According to St. Matthew", "Paola Tedesco", ["Enrique Irazoqui", "Margherita Caruso"], 79),
    ("Halloween 5: The Revenge of Michael Myers", "Donald Myers", ["Danielle Harris", "Ellie Cornell"], 52),
]


@pytest.fixture(scope="module")
def ref_movies(ray_session, tmp_path_factory):
    import ray.data as rd

    from typesense_ray.index_build import build_index

    tbl = pa.table(
        {
            "docnum": pa.array(range(len(REF_MOVIES)), pa.int64()),
            "title": pa.array([m[0] for m in REF_MOVIES]),
            "starring": pa.array([m[1] for m in REF_MOVIES]),
            "cast": pa.array([m[2] for m in REF_MOVIES], pa.list_(pa.string())),
            "points": pa.array([m[3] for m in REF_MOVIES], pa.int64()),
        }
    )
    out = str(tmp_path_factory.mktemp("refmovies"))
    cfg = IndexConfig(
        text_field="title", id_field="docnum", sha_field=None, batch_docs=5,
        meta_fields=("docnum", "title", "starring", "cast", "points"),
        indexed_fields=("starring", "cast"),
    )
    build_index(rd.from_arrow(tbl), out, cfg, concurrency=2)
    return RayCollection(out, default_sorting_field="points")


def test_reference_multifield_golden_ordering(ref_movies):
    """Golden orderings from CollectionTest.MultipleFields
    (test/collection_test.cpp:855-946): the cross-field aggregation —
    weighted per-field match-score sum, 0-typo probe of unmatched fields,
    popcount(token_bits) packed into bits 48+ (src/index.cpp:1495-1593) —
    must reproduce the reference's hit order exactly."""
    r = ref_movies.search("Will", query_by=["title", "starring"],
                          mode="reference")
    assert ids(r) == [3, 2, 1, 0]

    r = ref_movies.search("thomas", query_by=["starring", "title"],
                          mode="reference")
    assert ids(r) == [15, 12, 13, 14]

    r = ref_movies.search("ben affleck",
                          query_by=["starring", "title", "cast"],
                          mode="reference")
    assert ids(r) == [3]

    r = ref_movies.search("chris", query_by=["cast"], mode="reference")
    assert ids(r) == [6, 1, 7]

    r = ref_movies.search("chris pine", query_by=["cast"], mode="reference")
    assert ids(r) == [7, 6, 1]

    r = ref_movies.search("myers", query_by=["starring", "title", "cast"],
                          mode="reference")
    assert ids(r) == [17]


def test_array_offsets_element_boundary_parity(ray_session, tmp_path):
    """string[] offset semantics vs the reference's sentinel encoding
    (src/index.cpp:558-606 encode, :1978-2018 decode): positions are
    element-scoped — tokens from DIFFERENT array elements must never be
    position-adjacent. The rebuild encodes (elem, pos) as
    pos + elem * ARRAY_POS_STRIDE (index_build.py), which is decode-
    equivalent for elements < 2^16 tokens (the reference itself stores
    positions as uint16). Corpus + expectations from
    CollectionTest.ArrayStringFieldHighlight (test/collection_test.cpp:
    647-745, test/array_text_documents.jsonl)."""
    import ray.data as rd

    from typesense_ray.index_build import FIELD_SEP, build_index

    rows = [
        {"docnum": 0, "title": "The Truth About Forever",
         "tags": ["the truth", "about forever", "truth about"], "points": 100},
        {"docnum": 1, "title": "Plain Truth",
         "tags": ["plain", "truth", "plain truth"], "points": 40},
        {"docnum": 2, "title": "Temple of the Winds",
         "tags": ["temple", "of", "temple of"], "points": 87},
        {"docnum": 3, "title": "Amazing Spiderman is amazing",
         "tags": ["amazing movie", "spiderman", "really fun really"], "points": 90},
    ]
    out = str(tmp_path / "arr")
    cfg = IndexConfig(
        text_field="title", id_field="docnum", sha_field=None, batch_docs=10,
        meta_fields=("docnum", "title", "tags", "points"),
        indexed_fields=("tags",),
    )
    build_index(rd.from_items(rows), out, cfg, concurrency=1)
    coll = RayCollection(out, default_sorting_field="points")

    # conjunctive matches over the array field (reference expectations,
    # drop_tokens_threshold=0 as in the test)
    r = coll.search("truth about", query_by=["tags"], mode="reference",
                    drop_tokens_threshold=0)
    assert ids(r) == [0]
    r = coll.search("forever truth", query_by=["tags"], mode="reference",
                    drop_tokens_threshold=0)
    assert ids(r) == [0]
    r = coll.search("truth", query_by=["tags"], mode="reference")
    assert ids(r) == [0, 1]
    r = coll.search("asdadasd", query_by=["tags"], mode="reference")
    assert ids(r) == []

    # element-boundary adjacency: "truth about" IS adjacent (inside
    # element 2 of doc 0); "forever truth" is NOT (doc 0's flat token
    # stream [the truth | about forever | truth about] WOULD make
    # forever→truth adjacent without element scoping)
    seg = coll.segments[0]
    t = lambda tok: f"tags{FIELD_SEP}{tok}"
    assert seg.phrase_candidates([t("truth"), t("about")]).tolist() == [0]
    assert seg.phrase_candidates([t("forever"), t("truth")]).size == 0
    # same scoping on doc 2: "temple of" adjacent in element 2 only;
    # "of temple" never
    assert seg.phrase_candidates([t("temple"), t("of")]).tolist() == [2]
    assert seg.phrase_candidates([t("of"), t("temple")]).size == 0


def test_array_offsets_uint16_wrap_and_no_bleed(ray_session, tmp_path):
    """Degenerate >=2^16-slot elements: the reference stores full offsets
    but DECODES every position as uint16 (src/index.cpp:1995-2013), so
    positions wrap within an element; and element scoping must still
    hold — a long element must never bleed position-adjacency into the
    next element (the pre-r4 stride encoding bled: slot 65536 of element
    0 collided with slot 0 of element 1)."""
    import ray.data as rd

    from typesense_ray.index_build import FIELD_SEP, build_index

    filler = " ".join(f"f{i % 7}" for i in range(65534))
    elem0 = f"alpha beta {filler} gamma delta"  # gamma@65536, delta@65537
    rows = [{"docnum": 0, "title": "t", "tags": [elem0, "epsilon zeta"],
             "points": 1}]
    out = str(tmp_path / "wrap")
    cfg = IndexConfig(
        text_field="title", id_field="docnum", sha_field=None, batch_docs=4,
        meta_fields=("docnum", "title", "tags", "points"),
        indexed_fields=("tags",),
    )
    build_index(rd.from_items(rows), out, cfg, concurrency=1)
    coll = RayCollection(out, default_sorting_field="points")
    seg = coll.segments[0]
    t = lambda tok: f"tags{FIELD_SEP}{tok}"

    # plain in-element adjacency
    assert seg.phrase_candidates([t("alpha"), t("beta")]).tolist() == [0]
    # uint16 wrap: gamma lands on wrapped slot 0, delta on wrapped slot 1
    # -> adjacent to each other AND to beta (slot 1), exactly as the
    # reference's uint16 cast makes them
    assert seg.phrase_candidates([t("gamma"), t("delta")]).tolist() == [0]
    assert seg.phrase_candidates([t("gamma"), t("beta")]).tolist() == [0]
    # no bleed across the element boundary in either direction
    assert seg.phrase_candidates([t("delta"), t("epsilon")]).size == 0
    assert seg.phrase_candidates([t("epsilon"), t("delta")]).size == 0
    # the second element's own adjacency is intact
    assert seg.phrase_candidates([t("epsilon"), t("zeta")]).tolist() == [0]


def test_highlight_field_fully_and_array_highlights(ray_session, tmp_path):
    """Ports CollectionTest.SearchHighlightFieldFully
    (test/collection_test.cpp:2359-2433): highlight_full_fields adds the
    whole-field marked 'value' (scalar) / 'values' (string[]); queried
    array fields get per-element snippets/indices/matched_tokens;
    excluded fields drop out of the highlights section."""
    import ray.data as rd

    from typesense_ray.index_build import build_index

    docs = [{
        "docnum": 0,
        "title": "The quick brown fox jumped over the lazy dog and ran "
                 "straight to the forest to sleep.",
        "tags": ["NEWS", "LAZY"],
        "points": 25,
    }]
    out = str(tmp_path / "hlfull")
    cfg = IndexConfig(
        text_field="title", id_field="docnum", sha_field=None, batch_docs=8,
        meta_fields=("docnum", "title", "tags", "points"),
        indexed_fields=("tags",),
    )
    build_index(rd.from_items(docs), out, cfg, concurrency=1)
    coll = RayCollection(out, default_sorting_field="points")

    full_title = ("The quick brown fox jumped over the <mark>lazy</mark> "
                  "dog and ran straight to the forest to sleep.")

    # full value for the title, snippet windowed by the small threshold
    r = coll.search("lazy", sort_by="points:desc", snippet_threshold=5,
                    highlight_full_fields="title")
    hl = r["hits"][0]["highlights"][0]
    assert hl["value"] == full_title
    assert hl["snippet"] != full_title  # snippet stays windowed

    # no 'value' key without highlight_full_fields
    r = coll.search("lazy", sort_by="points:desc", snippet_threshold=5)
    assert "value" not in r["hits"][0]["highlights"][0]

    # query multiple fields: scalar entry + array entry with values
    r = coll.search("lazy", query_by=["title", "tags"],
                    mode="reference", highlight_full_fields="title, tags")
    hls = r["hits"][0]["highlights"]
    assert len(hls) == 2
    assert hls[0]["field"] == "title" and hls[0]["value"] == full_title
    assert hls[0]["matched_tokens"] == ["lazy"]
    assert hls[1]["field"] == "tags"
    assert hls[1]["values"] == ["<mark>LAZY</mark>"]
    assert hls[1]["indices"] == [1]
    assert hls[1]["matched_tokens"] == [["LAZY"]]

    # excluded fields drop out of highlights
    r = coll.search("lazy", query_by=["title", "tags"], mode="reference",
                    exclude_fields=["tags"],
                    highlight_full_fields="title, tags")
    hls = r["hits"][0]["highlights"]
    assert [h["field"] for h in hls] == ["title"]
    r = coll.search("lazy", query_by=["title", "tags"], mode="reference",
                    exclude_fields=["tags", "title"],
                    highlight_full_fields="title, tags")
    assert r["hits"][0]["highlights"] == []
