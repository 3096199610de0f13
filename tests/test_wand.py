"""Block-max WAND: exact agreement with the dense disjunctive evaluator
and the single-process oracle; cursor/codec block isolation."""

import numpy as np
import pytest

from typesense_ray.corpus import generate_corpus_table
from typesense_ray.index_build import IndexConfig, build_index, doc_id_from_key
from typesense_ray.oracle import OracleIndex
from typesense_ray.query import LocalIndexSearcher

N_DOCS = 600
SEED = 11


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus_table(N_DOCS, SEED)


@pytest.fixture(scope="module")
def index_dir(ray_session, corpus, tmp_path_factory):
    import ray.data as rd

    out = str(tmp_path_factory.mktemp("wandidx"))
    # small block size so multi-block postings and skipping actually happen
    cfg = IndexConfig(batch_docs=300, block_size=16)
    build_index(rd.from_arrow(corpus), out, cfg, concurrency=2)
    return out


@pytest.fixture(scope="module")
def oracle(corpus):
    return OracleIndex(
        corpus.to_pylist(),
        text_field="content",
        doc_id_of=lambda r: doc_id_from_key(r["repo"], r["path"]),
    )


QUERIES = [
    "quasar",
    "pulsar redshift",
    "quasar nosuchterm pulsar",
    "tokamak qubit entropy lattice",
    "def return import lambda",
]


@pytest.mark.parametrize("q", QUERIES)
def test_wand_equals_dense(index_dir, q):
    s = LocalIndexSearcher(index_dir)
    dense = s.search(q, k=20, mode="bm25_or", disjunctive_method="dense")
    wand = s.search(q, k=20, mode="bm25_or", disjunctive_method="wand")
    assert dense["doc_id"].to_pylist() == wand["doc_id"].to_pylist(), q
    assert dense["score"].to_pylist() == wand["score"].to_pylist(), q


@pytest.mark.parametrize("q", QUERIES)
def test_disjunctive_matches_oracle(index_dir, oracle, q):
    s = LocalIndexSearcher(index_dir)
    got = s.search(q, k=20, mode="bm25_or", disjunctive_method="wand")
    want = oracle.search(q, k=20, mode="bm25_or")
    assert got["doc_id"].to_pylist() == [w[0] for w in want], q
    assert got["score"].to_pylist() == [w[1] for w in want], q


def test_wand_small_k_threshold_pruning(index_dir, oracle):
    s = LocalIndexSearcher(index_dir)
    for k in (1, 3, 50, 1000):
        got = s.search("quasar pulsar redshift", k=k, mode="bm25_or",
                       disjunctive_method="wand")
        want = oracle.search("quasar pulsar redshift", k=k, mode="bm25_or")
        assert got["doc_id"].to_pylist() == [w[0] for w in want], k


def test_block_isolated_decode(index_dir):
    """TermCursor.seek must land on exactly the same postings as a full
    decode, regardless of entry block."""
    from typesense_ray.scoring import bm25_idf
    from typesense_ray.wand import INF, TermCursor

    s = LocalIndexSearcher(index_dir)
    seg = max(s.segments, key=lambda g: g.n_docs)
    post = seg.postings(["quasar"])["quasar"]
    from typesense_ray.codec import decode_posting_ids

    full = decode_posting_ids(post["ids_vb"], post["df"]).astype(np.int64)
    dfs = s._dfs(["quasar"])
    cur = TermCursor(
        post, float(bm25_idf(dfs["quasar"], s.stats["n_docs"])),
        1.2, 0.75, s.stats["avgdl"], seg.doclen, 16, term="quasar",
    )
    # walk via next()
    seen = []
    while not cur.exhausted():
        seen.append(cur.doc)
        cur.next()
    assert seen == full.tolist()
    # random seeks
    rng = np.random.default_rng(0)
    for _ in range(25):
        target = int(rng.integers(0, full[-1] + 2))
        cur2 = TermCursor(
            post, 1.0, 1.2, 0.75, s.stats["avgdl"], seg.doclen, 16
        )
        cur2.seek(target)
        after = full[full >= target]
        assert cur2.doc == (int(after[0]) if after.size else INF)
