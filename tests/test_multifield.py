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
    r = movies.search("leonardo", query_by=["title", "starring", "cast"])
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
