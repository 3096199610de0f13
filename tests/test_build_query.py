"""End-to-end: corpus → segment build → BM25 / reference-mode queries,
checked for rank identity (and bitwise score identity for BM25) against
the single-process oracle."""

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pytest

from typesense_ray.corpus import PLANTED_TERMS, generate_corpus_table
from typesense_ray.index_build import IndexConfig, build_index, doc_id_from_key
from typesense_ray.oracle import OracleIndex
from typesense_ray.query import LocalIndexSearcher, search_index

N_DOCS = 400
SEED = 42


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus_table(N_DOCS, SEED)


@pytest.fixture(scope="module")
def index_dir(ray_session, corpus, tmp_path_factory):
    import ray.data as rd

    out = str(tmp_path_factory.mktemp("idx"))
    cfg = IndexConfig(batch_docs=64, meta_fields=("repo", "path", "lang"))
    stats = build_index(rd.from_arrow(corpus), out, cfg, concurrency=2)
    assert stats["n_docs"] == N_DOCS
    assert stats["n_segments"] >= 4
    return out


@pytest.fixture(scope="module")
def oracle(corpus):
    rows = corpus.to_pylist()
    return OracleIndex(
        rows,
        text_field="content",
        doc_id_of=lambda r: doc_id_from_key(r["repo"], r["path"]),
    )


QUERIES = [
    "quasar",
    "pulsar redshift",
    "def return",
    "tokamak qubit entropy",
    "quasar -pulsar",
    "nosuchterm",
    "nebulaflux",
    "*",
]


def test_sha_invariant_through_build(index_dir, corpus):
    seg_docs = glob.glob(os.path.join(index_dir, "segments", "seg-*", "docs.parquet"))
    import pyarrow.parquet as pq

    shas = []
    for p in seg_docs:
        shas += pq.read_table(p, columns=["sha256"])["sha256"].to_pylist()
    assert sorted(shas) == sorted(corpus["sha256"].to_pylist())


def test_manifest_and_stats(index_dir):
    with open(os.path.join(index_dir, "manifest.json")) as f:
        stats = json.load(f)
    assert stats["n_docs"] == N_DOCS
    assert stats["avgdl"] > 0
    seg_manifest = glob.glob(
        os.path.join(index_dir, "segments", "seg-*", "manifest.json")
    )
    assert len(seg_manifest) == stats["n_segments"]
    m = json.load(open(seg_manifest[0]))
    assert {"segment_id", "n_docs", "metrics", "corpus_fingerprint"} <= set(m)


@pytest.mark.parametrize("q", QUERIES)
def test_bm25_rank_and_score_identity(index_dir, oracle, q):
    searcher = LocalIndexSearcher(index_dir)
    got = searcher.search(q, k=20, mode="bm25")
    want = oracle.search(q, k=20, mode="bm25")
    assert got.num_rows == len(want)
    for i, (did, score) in enumerate(want):
        assert int(got["doc_id"][i].as_py()) == did, f"rank {i} mismatch for {q!r}"
        assert got["score"][i].as_py() == score, f"score mismatch at rank {i} for {q!r}"


@pytest.mark.parametrize("q", ["quasar", "pulsar redshift", "def return lambda"])
def test_reference_mode_rank_identity(index_dir, oracle, q):
    searcher = LocalIndexSearcher(index_dir)
    got = searcher.search(q, k=15, mode="reference")
    want = oracle.search(q, k=15, mode="reference")
    got_ids = [int(x.as_py()) for x in got["doc_id"]]
    assert got_ids == [w[0] for w in want]
    assert [int(x.as_py()) for x in got["s0"]] == [w[1] for w in want]


def test_distributed_equals_local(ray_session, index_dir):
    local = LocalIndexSearcher(index_dir)
    for q in ["quasar", "pulsar redshift"]:
        a = local.search(q, k=10, mode="bm25")
        b = search_index(index_dir, q, k=10, concurrency=2)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
        assert a["score"].to_pylist() == b["score"].to_pylist()


def test_index_server_equals_local(ray_session, index_dir):
    from typesense_ray.query import IndexServer

    local = LocalIndexSearcher(index_dir, preload=True)
    srv = IndexServer(index_dir, num_actors=2)
    srv.warmup()
    try:
        for mode in ["bm25", "bm25_or"]:
            for q in ["quasar", "pulsar redshift", "nosuchterm"]:
                a = local.search(q, k=10, mode=mode)
                b = srv.search(q, k=10, mode=mode)
                assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), (mode, q)
                assert a["score"].to_pylist() == b["score"].to_pylist(), (mode, q)
        many = srv.search_many(["quasar", "pulsar redshift"], k=10)
        assert many[0]["doc_id"].to_pylist() == local.search(
            "quasar", k=10
        )["doc_id"].to_pylist()
    finally:
        srv.shutdown()


def test_index_server_shards_partition_segments(ray_session, index_dir):
    """Segment shards must PARTITION the index (disjoint, covering) — no
    actor ever holds another's postings — and the placement options must
    not change results (SPREAD / placement-group pinning only moves
    actors between nodes)."""
    from typesense_ray.query import IndexServer, segment_dirs

    srv = IndexServer(index_dir, num_actors=3, placement="spread")
    try:
        flat = [d for shard in srv.shards for d in shard]
        assert len(flat) == len(set(flat))  # disjoint — never replicated
        assert set(flat) == set(segment_dirs(index_dir))  # covering
        got = srv.search("quasar", k=5)
        assert got.num_rows > 0
    finally:
        srv.shutdown()

    from ray.util.placement_group import placement_group, remove_placement_group

    pg = placement_group([{"CPU": 1}] * 2, strategy="PACK")
    try:
        srv2 = IndexServer(index_dir, num_actors=2, placement=pg)
        try:
            srv2.warmup()
            assert srv2.search("quasar", k=5)["doc_id"].to_pylist() == got[
                "doc_id"
            ].to_pylist()[:5]
        finally:
            srv2.shutdown()
    finally:
        remove_placement_group(pg)


@pytest.mark.parametrize("q", QUERIES)
def test_fused_bm25_equals_per_segment_composition(index_dir, q):
    """The fused one-pass scorer must be bitwise-equal to the composition
    it replaced: per-segment ``search_bm25`` top-k + ``merge_topk``."""
    from typesense_ray.query import fused_bm25, merge_topk
    from typesense_ray.tokenizer import tokenize_query

    s = LocalIndexSearcher(index_dir)
    include, exclude = tokenize_query(q)
    dfs = s._dfs([t for t in include if t != "*"])
    if include != ["*"] and any(dfs[t] == 0 for t in dfs):
        return  # zero-df short-circuits before either path runs
    st = s.stats
    k = 20
    fi, fs = fused_bm25(
        s.segments, include, exclude, k, dfs, st["n_docs"],
        st["avgdl"], st["k1"], st["b"],
    )
    parts = []
    for seg in s.segments:
        ids, scores = seg.search_bm25(
            include, exclude, k, dfs, st["n_docs"],
            st["avgdl"], st["k1"], st["b"],
        )
        if ids.size:
            parts.append((ids, scores))
    merged = merge_topk(parts, k)
    if merged is None:
        assert fi.size == 0
        return
    assert fi.tolist() == merged[0].tolist(), q
    assert fs.tolist() == merged[1].tolist(), q


def test_resume_skips_complete_segments(ray_session, corpus, index_dir):
    import ray.data as rd

    cfg = IndexConfig(batch_docs=64, meta_fields=("repo", "path", "lang"))
    stats2 = build_index(rd.from_arrow(corpus), index_dir, cfg, concurrency=2)
    assert stats2["segments_skipped"] == stats2["n_segments"]
    assert stats2["n_docs"] == N_DOCS


def test_hydrate_returns_rows_in_rank_order(index_dir):
    searcher = LocalIndexSearcher(index_dir)
    got = searcher.search("quasar", k=5, mode="bm25")
    ids = np.array(got["doc_id"].to_pylist(), dtype=np.uint64)
    docs = searcher.hydrate(ids, columns=["doc_id", "repo", "path", "sha256"])
    assert docs["doc_id"].to_pylist() == list(ids)


def test_results_invariant_under_partitioning(ray_session, corpus, index_dir, tmp_path):
    """Different segment sizes / concurrency ⇒ identical top-k ids AND
    bitwise-identical BM25 scores (FIXTURES.md §4 invariant 3)."""
    import ray.data as rd

    other = str(tmp_path / "repartitioned")
    cfg2 = IndexConfig(batch_docs=23, meta_fields=("repo", "path", "lang"))
    build_index(rd.from_arrow(corpus), other, cfg2, concurrency=3)
    a = LocalIndexSearcher(index_dir)
    b = LocalIndexSearcher(other)
    for q in ["quasar", "pulsar redshift", "tokamak qubit entropy", "*"]:
        ra = a.search(q, k=25, mode="bm25")
        rb = b.search(q, k=25, mode="bm25")
        assert ra["doc_id"].to_pylist() == rb["doc_id"].to_pylist(), q
        assert ra["score"].to_pylist() == rb["score"].to_pylist(), q


def test_empty_and_whitespace_docs_indexed(index_dir, corpus):
    searcher = LocalIndexSearcher(index_dir)
    total = sum(seg.n_docs for seg in searcher.segments)
    assert total == N_DOCS  # empty docs are present (wildcard-searchable)
    wild = searcher.search("*", k=N_DOCS, mode="bm25")
    assert wild.num_rows == N_DOCS


def test_topk_boundary_tie_break():
    """1000 tied scores, k=10: the (score desc, doc_id desc) tie-break
    must hold even when ties straddle the argpartition boundary."""
    import numpy as np

    from typesense_ray.query import SegmentSearcher

    seg = SegmentSearcher.__new__(SegmentSearcher)
    seg.doc_ids = np.arange(1000, dtype=np.uint64)
    ids, scores = seg._topk(
        np.arange(1000, dtype=np.int64), np.ones(1000), 10
    )
    assert ids.tolist() == list(range(999, 989, -1))
    assert scores.tolist() == [1.0] * 10


def test_file_parallel_build_matches_dataset_path(ray_session, tmp_path):
    """The file-partitioned actor build must produce search-identical
    indexes to the Dataset map_batches path, and a rerun must skip every
    completed segment at ANY writer count (per-file batch boundaries)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from typesense_ray.index_build import IndexConfig, build_index
    from typesense_ray.query import LocalIndexSearcher

    rng = np.random.default_rng(3)
    words = ["quark", "lepton", "boson", "gluon", "photon", "hadron"]
    src = tmp_path / "src"
    src.mkdir()
    did = 0
    for f in range(4):  # 4 files x 130 docs
        rows = {"doc_id": [], "text": []}
        for _ in range(130):
            rows["doc_id"].append(did)
            rows["text"].append(
                " ".join(rng.choice(words, rng.integers(5, 20)))
            )
            did += 1
        pq.write_table(pa.table(
            {"doc_id": pa.array(rows["doc_id"], pa.int64()),
             "text": pa.array(rows["text"])}
        ), src / f"part-{f}.parquet")

    cfg = IndexConfig(text_field="text", id_field="doc_id", sha_field=None,
                      batch_docs=100, meta_fields=("doc_id", "text"),
                      writer_num_cpus=1.0)
    out_f = str(tmp_path / "idx_files")
    out_d = str(tmp_path / "idx_ds")
    stats_f = build_index(str(src), out_f, cfg, file_parallel=True)
    stats_d = build_index(str(src), out_d, cfg, file_parallel=False,
                          concurrency=2)
    assert stats_f["n_docs"] == stats_d["n_docs"] == 520
    a, b = LocalIndexSearcher(out_f), LocalIndexSearcher(out_d)
    for q in ("quark", "boson photon", "gluon hadron lepton"):
        ra, rb = a.search(q, k=20), b.search(q, k=20)
        assert ra["doc_id"].to_pylist() == rb["doc_id"].to_pylist(), q
        assert ra["score"].to_pylist() == rb["score"].to_pylist(), q
    # resume at a different writer count: all segments skipped
    stats2 = build_index(str(src), out_f, cfg, file_parallel=True,
                         concurrency=1)
    assert stats2["segments_skipped"] == stats2["n_segments"]
    assert sorted(stats2["segments"]) == sorted(stats_f["segments"])


def test_more_like_this_matches_bruteforce(ray_session, tmp_path):
    import math

    import ray.data as rd

    docs = {
        10: "apple banana apple cherry",
        11: "apple banana durian",
        12: "cherry cherry banana kiwi",
        13: "unrelated words only here",
    }
    tbl = pa.table(
        {
            "doc_id": pa.array(list(docs), pa.int64()),
            "text": pa.array(list(docs.values())),
        }
    )
    out = str(tmp_path / "mlt-idx")
    cfg = IndexConfig(
        text_field="text", id_field="doc_id", sha_field=None,
        batch_docs=2, meta_fields=("doc_id", "text"),
    )
    build_index(rd.from_arrow(tbl), out, cfg, concurrency=2)
    s = LocalIndexSearcher(out)
    res = s.more_like_this(10, k=10).to_pandas()

    # brute force Σ tf·ln(N/df) over seed terms
    n = len(docs)
    toks = {d: t.split() for d, t in docs.items()}
    df = {}
    for t in set(w for ws in toks.values() for w in ws):
        df[t] = sum(t in ws for ws in toks.values())
    seed_terms = set(toks[10])
    want = {}
    for d, ws in toks.items():
        if d == 10:
            continue
        sc = sum(
            ws.count(t) * math.log(n / df[t]) for t in seed_terms if t in ws
        )
        if sc > 0:
            want[d] = sc
    want_order = sorted(want, key=lambda d: (-want[d], -d))
    assert res["doc_id"].tolist() == want_order
    for d, sc in zip(res["doc_id"], res["score"]):
        assert abs(sc - want[d]) < 1e-12
    assert 10 not in res["doc_id"].tolist()
