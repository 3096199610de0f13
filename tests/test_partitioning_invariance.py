"""Block-layout invariance for the distributed dedup/graph family.

A Ray Data operator's output must be a pure function of the dataset's
ROWS, never of how they happen to be split into blocks — on a real
cluster the block layout changes with node count, file sizes and
backpressure, so any layout sensitivity is a distributed-correctness
bug (results would differ between a 2-node and a 256-node run of the
same pipeline). Each op here runs over the SAME rows at two very
different partitionings (2 coarse blocks vs 17 skinny ones, one of
which is empty-ish) plus a shuffled row order, and must produce
identical canonical output.

The stream/groupby twin equivalence is covered in test_functions.py;
this module pins the orthogonal axis (physical layout + row order).
"""

from __future__ import annotations

import numpy as np
import pytest

from typesense_ray.functions.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    simhash_groups,
    simhash_near_pairs,
    word_ngram_jaccard_pairs,
)
from typesense_ray.functions.graph import connected_components

SEED = 31337
N_BASE = 90


def _rows() -> list[dict]:
    """~120 docs: random small-vocab texts + planted exact dups + planted
    one-word-edit near dups (high Jaccard, low hamming)."""
    rng = np.random.default_rng(SEED)
    words = [
        "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
        "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron",
    ]
    texts = [" ".join(rng.choice(words, 40)) for _ in range(N_BASE)]
    for i in range(12):  # exact dups of the first 12
        texts.append(texts[i])
    for i in range(12, 24):  # near dups: one word swapped
        w = texts[i].split()
        w[5] = "mutant"
        texts.append(" ".join(w))
    return [{"doc_id": i, "text": t} for i, t in enumerate(texts)]


ROWS = _rows()


def _layouts(ray_session):
    """Three datasets with identical rows, different physical shapes."""
    import ray.data as rd

    rng = np.random.default_rng(SEED + 1)
    shuffled = [ROWS[i] for i in rng.permutation(len(ROWS))]
    return [
        rd.from_items(ROWS).repartition(2),
        rd.from_items(ROWS).repartition(17),
        rd.from_items(shuffled).repartition(7),
    ]


def _canon_pairs(tbl_or_ds):
    if hasattr(tbl_or_ds, "take_all"):
        rows = tbl_or_ds.take_all()
    else:
        rows = tbl_or_ds.to_pylist()
    return sorted(
        (min(r["a"], r["b"]), max(r["a"], r["b"]),
         round(r.get("jaccard", 0.0), 12))
        for r in rows
    )


def _assert_all_equal(results, label):
    for i, r in enumerate(results[1:], 1):
        assert r == results[0], f"{label}: layout {i} diverged"
    assert results[0], f"{label}: empty result (fixture broken)"


def test_exact_dedup_layout_invariant(ray_session):
    outs = []
    for ds in _layouts(ray_session):
        kept = exact_dedup(ds, text_col="text").take_all()
        outs.append(sorted(r["doc_id"] for r in kept))
    _assert_all_equal(outs, "exact_dedup")
    # and the winner set is exactly: everyone minus the planted copies
    assert outs[0] == list(range(N_BASE + 12))[:N_BASE] + list(
        range(N_BASE + 12, N_BASE + 24)
    )


def test_minhash_pairs_layout_invariant(ray_session):
    outs = [
        _canon_pairs(
            minhash_lsh_pairs(ds, text_col="text", threshold=0.5)
        )
        for ds in _layouts(ray_session)
    ]
    _assert_all_equal(outs, "minhash_lsh_pairs")


def test_ngram_jaccard_layout_invariant(ray_session):
    outs = [
        _canon_pairs(
            word_ngram_jaccard_pairs(ds, text_col="text", threshold=0.5)
        )
        for ds in _layouts(ray_session)
    ]
    _assert_all_equal(outs, "word_ngram_jaccard_pairs")


def test_simhash_groups_layout_invariant(ray_session):
    outs = []
    for ds in _layouts(ray_session):
        got = simhash_groups(ds, text_col="text").take_all()
        by_hash: dict[int, list[int]] = {}
        for r in got:
            by_hash.setdefault(int(r["simhash"]), []).append(r["doc_id"])
        outs.append(
            sorted(tuple(sorted(v)) for v in by_hash.values())
        )
    _assert_all_equal(outs, "simhash_groups")


def test_simhash_near_pairs_layout_invariant(ray_session):
    outs = []
    for ds in _layouts(ray_session):
        got = simhash_near_pairs(ds, text_col="text", max_hamming=6)
        outs.append(_canon_pairs(got))
    _assert_all_equal(outs, "simhash_near_pairs")


@pytest.mark.parametrize("mode", ["stream", "groupby"])
def test_connected_components_layout_invariant(ray_session, mode):
    """CC labels are canonicalized to sorted component member-tuples —
    the label VALUE may legitimately differ, membership may not."""
    import ray.data as rd

    rng = np.random.default_rng(SEED + 2)
    edges = [{"a": int(rng.integers(0, 60)), "b": int(rng.integers(0, 60))}
             for _ in range(80)]
    shuffled = [edges[i] for i in rng.permutation(len(edges))]
    outs = []
    for ds in (
        rd.from_items(edges).repartition(2),
        rd.from_items(edges).repartition(13),
        rd.from_items(shuffled).repartition(5),
    ):
        got = connected_components(ds, mode=mode).to_pylist()
        comp: dict[int, list[int]] = {}
        for r in got:
            comp.setdefault(int(r["cluster"]), []).append(int(r["node"]))
        outs.append(sorted(tuple(sorted(v)) for v in comp.values()))
    _assert_all_equal(outs, f"connected_components[{mode}]")


# --- sampling / packing / shuffle / corpus-trained scoring -------------
#
# These four are the repo's "pure function of the data" claims made
# explicit: the sample membership, shard placement, pack layout and
# corpus-trained LM scores must not move when the block layout or row
# order does.

def _rows2() -> list[dict]:
    rng = np.random.default_rng(SEED + 3)
    langs = ["en", "de", "fr", "zh"]
    out = []
    for i in range(150):
        out.append(
            {
                "doc_id": i,
                "text": " ".join(
                    np.random.default_rng(SEED + 4 + i).choice(
                        ["lorem", "ipsum", "dolor", "sit", "amet"],
                        int(rng.integers(3, 40)),
                    )
                ),
                "lang": langs[int(rng.integers(0, 4))],
                "weight": float(rng.uniform(0.1, 9.0)),
            }
        )
    return out


ROWS2 = _rows2()


def _layouts2(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(SEED + 5)
    shuffled = [ROWS2[i] for i in rng.permutation(len(ROWS2))]
    return [
        rd.from_items(ROWS2).repartition(2),
        rd.from_items(ROWS2).repartition(17),
        rd.from_items(shuffled).repartition(7),
    ]


def test_stratified_sample_layout_invariant(ray_session):
    from typesense_ray.functions.sampling import stratified_sample

    outs = []
    for ds in _layouts2(ray_session):
        got = stratified_sample(ds, group_col="lang", k=5).take_all()
        outs.append(sorted((r["lang"], r["doc_id"]) for r in got))
    _assert_all_equal(outs, "stratified_sample")


def test_weighted_sample_layout_invariant(ray_session):
    from typesense_ray.functions.sampling import weighted_sample

    outs = []
    for ds in _layouts2(ray_session):
        got = weighted_sample(ds, weight_col="weight", k=20)
        outs.append(sorted(int(x) for x in got["doc_id"]))
    _assert_all_equal(outs, "weighted_sample")


def test_shard_shuffle_layout_invariant(ray_session):
    from typesense_ray.functions.sampling import shard_shuffle

    outs = []
    for ds in _layouts2(ray_session):
        got = shard_shuffle(ds, n_shards=4).take_all()
        outs.append(
            sorted((r["doc_id"], r["shard"], r["pos"]) for r in got)
        )
    _assert_all_equal(outs, "shard_shuffle")
    # and each shard's positions are a contiguous 0..n-1 permutation
    by_shard: dict[int, list[int]] = {}
    for _id, sh, pos in outs[0]:
        by_shard.setdefault(sh, []).append(pos)
    for sh, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps))), f"shard {sh} positions"


def test_pack_sequences_layout_invariant(ray_session):
    from typesense_ray.functions.packing import pack_sequences

    outs = []
    for ds in _layouts2(ray_session):
        got = pack_sequences(ds, budget=64).take_all()
        outs.append(
            sorted(
                (r["doc_id"], r["n_tokens"], r["pack_id"], r["pack_off"])
                for r in got
            )
        )
    _assert_all_equal(outs, "pack_sequences")


def test_char_lm_score_layout_invariant(ray_session):
    """The bigram model is trained on the corpus itself — the global
    histogram fold and the per-doc scores must both be layout-blind
    (scores compared bitwise: the probe sums in text order per doc)."""
    from typesense_ray.functions.text import char_lm_score

    outs = []
    for ds in _layouts2(ray_session):
        got = char_lm_score(ds).take_all()
        outs.append(sorted((r["doc_id"], r["avg_logprob"]) for r in got))
    _assert_all_equal(outs, "char_lm_score")
