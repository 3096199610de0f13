"""Collection lifecycle: JSONL import, export scan, filter-based delete
with segment compaction."""

import json
import os

import numpy as np
import pyarrow as pa
import pytest

from typesense_ray.collection import RayCollection
from typesense_ray.index_build import IndexConfig
from typesense_ray.ops import (
    delete_by_filter,
    export_documents,
    import_documents,
    upsert_documents,
)


@pytest.fixture()
def built(ray_session, tmp_path):
    rows = [
        {"docnum": i, "title": t, "points": p, "lang": l}
        for i, (t, p, l) in enumerate(
            [
                ("alpha rocket launch", 10, "en"),
                ("beta rocket landing", 20, "en"),
                ("gamma satellite orbit", 30, "fr"),
                ("delta rocket orbit", 40, "fr"),
                ("epsilon ground station", 50, "en"),
                ("zeta rocket telemetry", 60, "de"),
            ]
        )
    ]
    jsonl = tmp_path / "docs.jsonl"
    with open(jsonl, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    out = str(tmp_path / "idx")
    cfg = IndexConfig(
        text_field="title", id_field="docnum", sha_field=None, batch_docs=2,
        meta_fields=("docnum", "title", "points", "lang"),
    )
    stats = import_documents(str(jsonl), out, cfg, concurrency=2)
    assert stats["n_docs"] == 6
    return out


def test_jsonl_import_and_search(built):
    coll = RayCollection(built, default_sorting_field="points")
    r = coll.search("rocket")
    assert r["found"] == 4


def test_export_roundtrip(built, tmp_path):
    ds = export_documents(built, columns=["doc_id", "title", "points"])
    rows = sorted(ds.take_all(), key=lambda r: r["doc_id"])
    assert len(rows) == 6
    assert rows[0]["title"] == "alpha rocket launch"
    out = str(tmp_path / "export")
    ds.write_parquet(out)
    import pyarrow.parquet as pq
    import pyarrow.dataset as pads

    assert pads.dataset(out).count_rows() == 6


def test_delete_by_filter(built):
    stats = delete_by_filter(built, filter_by="lang:fr")
    assert stats["n_docs"] == 4
    assert stats["deleted_docs"] == 2
    coll = RayCollection(built, default_sorting_field="points")
    r = coll.search("rocket")
    assert r["found"] == 3  # delta (fr) gone
    assert {h["document"]["docnum"] for h in r["hits"]} == {0, 1, 5}
    r2 = coll.search("orbit")
    assert r2["found"] == 0  # both orbit docs were french
    # stats & df refreshed: avgdl consistent with survivors
    assert stats["avgdl"] == pytest.approx(3.0)


def test_delete_by_ids(built):
    stats = delete_by_filter(built, doc_ids=[0, 5])
    assert stats["n_docs"] == 4
    coll = RayCollection(built, default_sorting_field="points")
    r = coll.search("rocket")
    assert {h["document"]["docnum"] for h in r["hits"]} == {1, 3}


def test_upsert_replaces_and_appends(built):
    import ray.data as rd

    delta = [
        # replaces docnum=0 (same key, no longer matches "rocket")
        {"docnum": 0, "title": "alpha satellite relay", "points": 11, "lang": "en"},
        # brand-new doc
        {"docnum": 9, "title": "eta rocket booster", "points": 70, "lang": "en"},
    ]
    stats = upsert_documents(rd.from_items(delta), built)
    assert stats["n_docs"] == 7
    assert stats["upserted_docs"] == 2
    coll = RayCollection(built, default_sorting_field="points")
    r = coll.search("rocket")
    assert {h["document"]["docnum"] for h in r["hits"]} == {1, 3, 5, 9}
    r2 = coll.search("relay")
    assert [h["document"]["docnum"] for h in r2["hits"]] == [0]
    assert r2["hits"][0]["document"]["points"] == 11  # new version stored


def test_upsert_equals_fresh_build(built, tmp_path):
    """Upsert (compaction + delta segments + df re-merge) must be score-
    exact vs a fresh build of the final corpus."""
    import ray.data as rd

    final_rows = [
        {"docnum": 0, "title": "alpha satellite relay", "points": 11, "lang": "en"},
        {"docnum": 1, "title": "beta rocket landing", "points": 20, "lang": "en"},
        {"docnum": 2, "title": "gamma satellite orbit", "points": 30, "lang": "fr"},
        {"docnum": 3, "title": "delta rocket orbit", "points": 40, "lang": "fr"},
        {"docnum": 4, "title": "epsilon ground station", "points": 50, "lang": "en"},
        {"docnum": 5, "title": "zeta rocket telemetry", "points": 60, "lang": "de"},
        {"docnum": 9, "title": "eta rocket booster", "points": 70, "lang": "en"},
    ]
    upsert_documents(rd.from_items([final_rows[0], final_rows[-1]]), built)
    out2 = str(tmp_path / "fresh")
    cfg = IndexConfig(
        text_field="title", id_field="docnum", sha_field=None, batch_docs=2,
        meta_fields=("docnum", "title", "points", "lang"),
    )
    import_documents(rd.from_items(final_rows), out2, cfg, concurrency=2)
    for q in ("rocket", "satellite", "orbit"):
        got = RayCollection(built, default_sorting_field="points").search(q)
        want = RayCollection(out2, default_sorting_field="points").search(q)
        got_pairs = [(h["document"]["docnum"], h["score"]) for h in got["hits"]]
        want_pairs = [(h["document"]["docnum"], h["score"]) for h in want["hits"]]
        assert got_pairs == want_pairs, q


def test_upsert_duplicate_keys_rejected(built):
    import ray.data as rd

    delta = [
        {"docnum": 0, "title": "one", "points": 1, "lang": "en"},
        {"docnum": 0, "title": "two", "points": 2, "lang": "en"},
    ]
    with pytest.raises(ValueError, match="duplicate doc keys"):
        upsert_documents(rd.from_items(delta), built)


def test_delete_then_scores_consistent(built):
    """After compaction, BM25 over the survivors must equal a fresh build
    over the same surviving docs (postings surgery is exact)."""
    import ray.data as rd

    delete_by_filter(built, filter_by="lang:en")
    coll = RayCollection(built, default_sorting_field="points")
    got = coll.search("rocket")
    # fresh index over just the fr/de docs
    rows = [
        {"docnum": 3, "title": "delta rocket orbit", "points": 40, "lang": "fr"},
        {"docnum": 2, "title": "gamma satellite orbit", "points": 30, "lang": "fr"},
        {"docnum": 5, "title": "zeta rocket telemetry", "points": 60, "lang": "de"},
    ]
    out2 = built + "_fresh"
    cfg = IndexConfig(
        text_field="title", id_field="docnum", sha_field=None, batch_docs=2,
        meta_fields=("docnum", "title", "points", "lang"),
    )
    import_documents(rd.from_items(rows), out2, cfg, concurrency=2)
    want = RayCollection(out2, default_sorting_field="points").search("rocket")
    got_pairs = [(h["document"]["docnum"], h["score"]) for h in got["hits"]]
    want_pairs = [(h["document"]["docnum"], h["score"]) for h in want["hits"]]
    assert got_pairs == want_pairs


def test_upsert_same_ids_new_content_visible(built):
    """Re-upserting an existing id with changed content must serve the new
    version (segment addressing covers content, not just doc ids)."""
    import ray.data as rd

    v2 = [{"docnum": 0, "title": "alpha comet flyby", "points": 12, "lang": "en"}]
    upsert_documents(rd.from_items(v2), built)
    coll = RayCollection(built, default_sorting_field="points")
    assert coll.search("comet")["found"] == 1
    assert coll.search("launch")["found"] == 0  # v1 text gone
    doc = coll.get_document(0)
    assert doc["title"] == "alpha comet flyby" and doc["points"] == 12
    # upsert v3 whose batch has the SAME doc-id set as v2's delta segment:
    # the content hash must give it a fresh address (no stale resume-skip)
    v3 = [{"docnum": 0, "title": "alpha comet return", "points": 13, "lang": "en"}]
    upsert_documents(rd.from_items(v3), built)
    coll = RayCollection(built, default_sorting_field="points")
    assert coll.get_document(0)["title"] == "alpha comet return"
    assert coll.search("flyby")["found"] == 0


def test_upsert_unchanged_docs_rewrite_nothing(built):
    """Update diffing: an upsert whose docs all match the stored sha256s
    must leave every segment untouched (reference scrubs unchanged fields
    to skip reindex, src/collection.cpp:219-238)."""
    import ray.data as rd
    from typesense_ray.query import load_stats

    before = load_stats(built)["segments"]
    delta = [
        {"docnum": 0, "title": "alpha rocket launch", "points": 10, "lang": "en"},
        {"docnum": 5, "title": "zeta rocket telemetry", "points": 60, "lang": "de"},
    ]
    stats = upsert_documents(rd.from_items(delta), built)
    assert stats["segments"] == before  # no segment rewritten
    assert stats["upsert_skipped_unchanged"] == 2
    assert stats["n_docs"] == 6


def test_upsert_meta_only_change_reindexes(built):
    """An upsert whose text is unchanged but whose meta fields changed must
    still reindex: meta fields drive filter_by/facet_by, and the reference
    skips only unchanged FIELDS per doc, never a doc with any changed field
    (src/collection.cpp:219-238, src/index.cpp:354-427)."""
    import ray.data as rd

    delta = [  # same title as docnum=0, lang en -> fr, points 10 -> 12
        {"docnum": 0, "title": "alpha rocket launch", "points": 12, "lang": "fr"},
    ]
    stats = upsert_documents(rd.from_items(delta), built)
    assert stats.get("upsert_skipped_unchanged", 0) == 0
    assert stats["upserted_docs"] == 1
    coll = RayCollection(built, default_sorting_field="points")
    r = coll.search("rocket", filter_by="lang:fr")
    assert {h["document"]["docnum"] for h in r["hits"]} == {0, 3}
    doc0 = [h for h in r["hits"] if h["document"]["docnum"] == 0][0]
    assert doc0["document"]["points"] == 12


def test_delete_gcs_stale_segments(built):
    """Committed delete removes pre-compaction segment dirs from disk."""
    seg_root = os.path.join(built, "segments")
    before = set(os.listdir(seg_root))
    stats = delete_by_filter(built, filter_by="lang:fr")
    after = set(os.listdir(seg_root))
    live = {f"seg-{sid}" for sid in stats["segments"]}
    assert after == live  # nothing but manifest-referenced segments remain
    assert before - after  # and at least one stale dir was removed


def test_compacted_segment_keeps_wand(built):
    """Postings surgery must preserve block-max WAND eligibility: the
    compacted segment carries per-block byte offsets and disjunctive
    search with method='wand' matches method='dense'."""
    import pyarrow.parquet as pq
    from typesense_ray.query import LocalIndexSearcher, load_stats

    delete_by_filter(built, doc_ids=[2])
    stats = load_stats(built)
    for sid in stats["segments"]:
        t = pq.read_table(os.path.join(built, "segments", f"seg-{sid}", "postings.parquet"))
        assert "bm_ids_boff" in t.column_names
        assert "bm_tfs_boff" in t.column_names
    s = LocalIndexSearcher(built)
    dfs = {"rocket": 4, "orbit": 1}
    parts_w, parts_d = [], []
    for seg in s.segments:
        for method, acc in (("wand", parts_w), ("dense", parts_d)):
            ids, sc = seg.search_bm25_disjunctive(
                ["rocket", "orbit"], [], 10, dfs, stats["n_docs"],
                stats["avgdl"], stats["k1"], stats["b"], method=method,
                block_size=stats["config"].get("block_size"),
            )
            acc.append((ids.tolist(), [round(x, 9) for x in sc.tolist()]))
    assert parts_w == parts_d


def test_merge_segments_search_identical(built):
    """Segment merging (postings surgery, no re-tokenization) must be
    search-identical to the unmerged index, keep WAND eligibility, leave
    global stats invariant, and GC its inputs."""
    from typesense_ray.ops import merge_segments
    from typesense_ray.query import LocalIndexSearcher, load_stats

    before = load_stats(built)
    coll_before = RayCollection(built, default_sorting_field="points")
    want = {
        q: [(h["document"]["docnum"], h["score"])
            for h in coll_before.search(q)["hits"]]
        for q in ("rocket", "orbit", "satellite ground")
    }
    assert before["n_segments"] == 3  # batch_docs=2 over 6 docs

    stats = merge_segments(built, target_docs=100)
    assert stats["n_segments"] == 1
    assert stats["n_docs"] == before["n_docs"]
    assert stats["doclen_sum"] == before["doclen_sum"]
    seg_root = os.path.join(built, "segments")
    assert set(os.listdir(seg_root)) == {f"seg-{stats['segments'][0]}"}

    coll = RayCollection(built, default_sorting_field="points")
    for q, expected in want.items():
        got = [(h["document"]["docnum"], h["score"])
               for h in coll.search(q)["hits"]]
        assert got == expected, q
    # WAND metadata present and consistent
    import pyarrow.parquet as pq
    t = pq.read_table(os.path.join(
        seg_root, f"seg-{stats['segments'][0]}", "postings.parquet"))
    assert "bm_ids_boff" in t.column_names
    s = LocalIndexSearcher(built)
    dfs = {"rocket": 4, "orbit": 2}
    seg = s.segments[0]
    for method in ("wand", "dense"):
        ids, sc = seg.search_bm25_disjunctive(
            ["rocket", "orbit"], [], 10, dfs, stats["n_docs"],
            stats["avgdl"], stats["k1"], stats["b"], method=method,
            block_size=stats["config"].get("block_size"),
        )
        if method == "wand":
            wand_out = (ids.tolist(), sc.tolist())
        else:
            assert (ids.tolist(), sc.tolist()) == wand_out
    # idempotent: re-merge is a no-op (same content address)
    stats2 = merge_segments(built, target_docs=100)
    assert stats2["segments"] == stats["segments"]


def test_content_hash_is_layout_invariant():
    """The segment content address must hash LOGICAL values: a sliced
    chunk, a rechunked table, and a fresh array with equal values must
    all produce the same digest (a layout-dependent hash would make
    resume silently re-register equal segments under new ids)."""
    import hashlib

    import pyarrow as pa

    from typesense_ray.index_build import update_hash_with_table

    def digest(tbl):
        h = hashlib.blake2b(digest_size=8)
        update_hash_with_table(h, tbl)
        return h.hexdigest()

    full = pa.table({
        "sha256": pa.array(["aa", "bb", "cc", "dd"]),
        "doclen": pa.array([1, 2, 3, 4], pa.int32()),
        "lang": pa.array(["en", None, "fr", "de"]),
    })
    fresh = pa.table({
        "sha256": pa.array(["bb", "cc"]),
        "doclen": pa.array([2, 3], pa.int32()),
        "lang": pa.array([None, "fr"]),
    })
    sliced = full.slice(1, 2)
    chunked = pa.concat_tables([fresh.slice(0, 1), fresh.slice(1, 1)])
    assert digest(sliced) == digest(fresh) == digest(chunked)
    # and it still distinguishes actual content changes
    other = fresh.set_column(
        1, "doclen", pa.array([2, 99], pa.int32()))
    assert digest(other) != digest(fresh)


def test_gc_segments_grace_window(tmp_path):
    """gc with grace_s defers collection while the manifest commit is
    fresh (lazy concurrent readers drain), then collects on the next
    pass once the commit has aged past the window."""
    import json
    import time

    from typesense_ray.index_build import gc_segments

    root = str(tmp_path)
    seg_root = os.path.join(root, "segments")
    os.makedirs(os.path.join(seg_root, "seg-live"))
    os.makedirs(os.path.join(seg_root, "seg-stale"))
    with open(os.path.join(root, "manifest.json"), "w") as f:
        json.dump({"segments": ["live"]}, f)

    assert gc_segments(root, grace_s=60.0) == []  # fresh commit: deferred
    assert os.path.isdir(os.path.join(seg_root, "seg-stale"))

    old = time.time() - 120
    os.utime(os.path.join(root, "manifest.json"), (old, old))
    assert gc_segments(root, grace_s=60.0) == ["seg-stale"]
    assert not os.path.isdir(os.path.join(seg_root, "seg-stale"))
    assert os.path.isdir(os.path.join(seg_root, "seg-live"))


def test_jsonl_embedded_newline_roundtrip(ray_session, tmp_path):
    """StringUtilsTest.ShouldSplitString (test/string_utils_test.cpp:64-97)
    behavioral kernel: the JSONL import splits records on RAW newlines
    only — '\\n' escapes inside JSON string values stay inside one record
    and survive to the stored document."""
    rows = [
        {"docnum": 0, "title": "Line one.\nLine two.\n", "points": 1},
        {"docnum": 1, "title": "Line 1.\nLine 2.\n", "points": 2},
    ]
    jsonl = tmp_path / "nl.jsonl"
    with open(jsonl, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    out = str(tmp_path / "nlidx")
    cfg = IndexConfig(
        text_field="title", id_field="docnum", sha_field=None, batch_docs=2,
        meta_fields=("docnum", "title", "points"),
    )
    stats = import_documents(str(jsonl), out, cfg, concurrency=1)
    assert stats["n_docs"] == 2
    coll = RayCollection(out, default_sorting_field="points")
    r = coll.search("two")
    assert r["found"] == 1
    assert r["hits"][0]["document"]["title"] == "Line one.\nLine two.\n"
