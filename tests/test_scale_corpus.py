"""Correctness at scale: over a ``tools/make_sf.py``-generated corpus
(the shape of the recorded sf1 bench point, scaled down to keep CI
fast), the dedup family must recover EXACTLY the planted duplicate
structure — not just run. Ground truth is recomputed independently
from the parquet by grouping verbatim-equal texts."""

import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def sf_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sfgen"))
    subprocess.run(
        [sys.executable, "tools/make_sf.py", out,
         "--docs", "20000", "--embeddings", "4000"],
        check=True,
    )
    return out


def _dup_groups(sf_dir):
    """text → sorted doc_id list for every text appearing ≥2 times."""
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    by_text: dict[str, list[int]] = {}
    for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        by_text.setdefault(txt, []).append(did)
    return {k: sorted(v) for k, v in by_text.items() if len(v) >= 2}


def test_exact_dedup_recovers_planted_dups(ray_session, sf_dir):
    import ray.data as rd

    from typesense_ray.functions.dedup import exact_dedup

    groups = _dup_groups(sf_dir)
    n_rows = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    n_distinct = n_rows - sum(len(v) - 1 for v in groups.values())
    assert groups, "generator must plant verbatim duplicates"

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    kept = exact_dedup(ds, text_col="text", id_col="doc_id")
    kept_ids = set()
    for b in kept.iter_batches(batch_format="pyarrow"):
        kept_ids.update(b["doc_id"].to_pylist())
    assert len(kept_ids) == n_distinct
    # the min-id winner survives from every dup group
    for ids in groups.values():
        assert ids[0] in kept_ids
        assert not (set(ids[1:]) & kept_ids)


def test_minhash_recovers_planted_dups(ray_session, sf_dir):
    import ray.data as rd

    from typesense_ray.functions.dedup import minhash_lsh_pairs

    groups = _dup_groups(sf_dir)
    want_pairs = {
        (a, b)
        for ids in groups.values()
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
    }
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    pairs = minhash_lsh_pairs(ds, text_col="text", id_col="doc_id",
                              threshold=0.9, num_perm=128, bands=32)
    got = {(min(a, b), max(a, b))
           for a, b in zip(pairs["a"].to_pylist(), pairs["b"].to_pylist())}
    # verbatim dups have J=1.0 → guaranteed band collision → 100% recall;
    # the J≥0.9 verify keeps precision (random pairs sit at J≈0.01)
    assert want_pairs <= got
    extras = got - want_pairs
    assert len(extras) <= max(2, len(want_pairs) // 20), extras


def test_simhash_groups_recovers_planted_dups(ray_session, sf_dir):
    import ray.data as rd

    from typesense_ray.functions.dedup import simhash_groups

    groups = _dup_groups(sf_dir)
    dup_ids = {d for ids in groups.values() for d in ids}
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = simhash_groups(ds).take_all()
    got_ids = {int(r["doc_id"]) for r in out}
    # verbatim dups share a simhash by construction
    assert dup_ids <= got_ids
