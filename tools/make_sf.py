"""Deterministic large-scale test-table synthesizer.

Generates ``documents.parquet`` and ``embeddings.parquet`` with the SAME
schema and distribution shape as the driver's ``/root/testdata/sf*``
tables (bag-of-words texts over a small vocabulary, skewed lang mix,
round-robin sources; gaussian label-cluster embeddings), at an arbitrary
row count — the input for the larger-scale bench point that the sf0.1
tables (5k docs) are too small to exercise (per-op time there is
dominated by Ray's ~1.4 s fixed overhead, not throughput).

Seeded and content-stable: the same (n_docs, seed) always produces the
same bytes, so recorded bench artifacts are reproducible. Dup structure
is planted explicitly: ``dup_rate`` of rows are verbatim copies of
earlier rows (exact-dedup work), and the dedup queries' own
``_augmented_docs`` fixture adds near-dup perturbations on top.

Usage:  python tools/make_sf.py /tmp/sf1 --docs 400000 --embeddings 100000
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

def _make_vocab(n: int = 50_000, seed: int = 7) -> list[str]:
    """Deterministic synthetic vocabulary. The driver's sf* tables use a
    ~40-word vocabulary — fine at 5k docs, but at 400k docs it makes
    EVERY doc pair a char-5-gram near-duplicate (measured mean J=0.16 →
    ~2G LSH candidate pairs, which is an all-pairs workload by problem
    definition, not a dedup benchmark). Real web corpora have large
    vocabularies and near-zero random-pair similarity; 50k
    syllable-words sampled uniformly gives mean random-pair J≈0.01 →
    ~40k candidate pairs at 400k docs, so LSH candidates ≈ planted
    duplicates, the shape dedup is designed for."""
    rng = np.random.default_rng(seed)
    syll = [c + v for c in "bdklmnrstvz" for v in "aeiou"]
    seen: set[str] = set()
    out: list[str] = []
    while len(out) < n:
        w = "".join(rng.choice(syll, rng.integers(2, 5)))
        if w not in seen:
            seen.add(w)
            out.append(w)
    return out


VOCAB = _make_vocab()

LANGS = np.array(["en", "zh", "es", "fr", "de"])
LANG_P = np.array([0.41, 0.15, 0.15, 0.15, 0.14])
N_SOURCES = 20


def make_documents(out: str, n_docs: int, seed: int = 42,
                   dup_rate: float = 0.005, block_rows: int = 100_000):
    rng = np.random.default_rng(seed)
    writer = None
    try:
        for start in range(0, n_docs, block_rows):
            n = min(block_rows, n_docs - start)
            lens = rng.integers(30, 120, size=n)
            total = int(lens.sum())
            words = rng.integers(0, len(VOCAB), size=total)
            offs = np.concatenate(([0], np.cumsum(lens)))
            texts = [
                " ".join(VOCAB[w] for w in words[offs[i]:offs[i + 1]])
                for i in range(n)
            ]
            # verbatim duplicates of earlier rows in the same block
            n_dup = int(n * dup_rate)
            if n_dup:
                dst = rng.integers(n // 2, n, size=n_dup)
                src = rng.integers(0, n // 2, size=n_dup)
                for d, s in zip(dst, src):
                    texts[d] = texts[s]
            tbl = pa.table({
                "doc_id": pa.array(
                    np.arange(start, start + n, dtype=np.int64)),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(rng.choice(LANGS, size=n, p=LANG_P)),
                "source": pa.array(
                    [f"src{i % N_SOURCES}" for i in range(start, start + n)]
                ),
                "n_chars": pa.array(
                    np.fromiter((len(t) for t in texts), np.int64, n)),
            })
            if writer is None:
                writer = pq.ParquetWriter(out, tbl.schema)
            writer.write_table(tbl, row_group_size=25_000)
    finally:
        if writer is not None:
            writer.close()


def make_embeddings(out: str, n_vecs: int, dim: int = 64,
                    n_labels: int = 10, seed: int = 43,
                    block_rows: int = 100_000):
    rng = np.random.default_rng(seed)
    # noise σ=1.0 keeps in-cluster cosine ≈ 0.5 — clusterable for
    # IVF/kNN without making every in-cluster pair a cosine near-dup
    centroids = rng.normal(0, 1, size=(n_labels, dim)).astype(np.float32)
    writer = None
    try:
        for start in range(0, n_vecs, block_rows):
            n = min(block_rows, n_vecs - start)
            labels = rng.integers(0, n_labels, size=n).astype(np.int32)
            vecs = (centroids[labels]
                    + rng.normal(0, 1.0, size=(n, dim)).astype(np.float32))
            tbl = pa.table({
                "vec_id": pa.array(
                    np.arange(start, start + n, dtype=np.int64)),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(vecs.ravel(), pa.float32()), dim
                ).cast(pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            })
            if writer is None:
                writer = pq.ParquetWriter(out, tbl.schema)
            writer.write_table(tbl, row_group_size=25_000)
    finally:
        if writer is not None:
            writer.close()


EVENT_TYPES = np.array(["view", "click", "purchase", "signup", "error"])
EVENT_P = np.array([0.40, 0.30, 0.12, 0.09, 0.09])


def make_events(out: str, n_events: int, seed: int = 44,
                n_users: int | None = None, block_rows: int = 250_000):
    """`events` stream table in the driver's shape (TESTDATA.md):
    monotone microsecond timestamps over ~30 days (exponential
    inter-arrival), uniform-ish user ids, categorical event_type,
    exp-tailed positive value rounded to cents, and a tiny JSON props
    string — the 10x bench point for the windowing / sessionization /
    quantile / sketch family, whose sf0.1 input (100k rows) is floored
    by per-op fixed cost."""
    rng = np.random.default_rng(seed)
    if n_users is None:
        n_users = max(100, (n_events * 15) // 1000)
    span_us = 30 * 24 * 3600 * 1_000_000
    mean_gap = span_us / n_events
    writer = None
    t_cursor = np.int64(1_704_067_200_000_000)  # 2024-01-01 00:00:00 UTC
    try:
        for start in range(0, n_events, block_rows):
            n = min(block_rows, n_events - start)
            gaps = rng.exponential(mean_gap, size=n).astype(np.int64) + 1
            ts = t_cursor + np.cumsum(gaps)
            t_cursor = ts[-1]
            users = rng.integers(0, n_users, size=n).astype(np.int64)
            types = EVENT_TYPES[
                rng.choice(len(EVENT_TYPES), size=n, p=EVENT_P)
            ]
            value = np.round(rng.exponential(50.0, size=n), 2)
            k = rng.integers(0, 100, size=n)
            props = np.char.add(
                np.char.add('{"k": ', k.astype(str)), "}"
            )
            tbl = pa.table({
                "event_id": pa.array(
                    np.arange(start, start + n, dtype=np.int64)),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(users),
                "event_type": pa.array(types.tolist(), pa.string()),
                "value": pa.array(value, pa.float64()),
                "props": pa.array(props.tolist(), pa.string()),
            })
            if writer is None:
                writer = pq.ParquetWriter(out, tbl.schema)
            writer.write_table(tbl, row_group_size=50_000)
    finally:
        if writer is not None:
            writer.close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--docs", type=int, default=400_000)
    ap.add_argument("--embeddings", type=int, default=100_000)
    ap.add_argument("--events", type=int, default=0,
                    help="also generate events.parquet with this many rows")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    marker = os.path.join(
        args.out_dir, f"_DONE_{args.docs}_{args.embeddings}_{args.seed}")
    if not os.path.exists(marker):
        make_documents(os.path.join(args.out_dir, "documents.parquet"),
                       args.docs, seed=args.seed)
        make_embeddings(os.path.join(args.out_dir, "embeddings.parquet"),
                        args.embeddings, seed=args.seed + 1)
        with open(marker, "w") as f:
            f.write("ok")
    else:
        print("already generated:", args.out_dir)
    if args.events:
        ev_marker = os.path.join(
            args.out_dir, f"_DONE_EVENTS_{args.events}_{args.seed}")
        if not os.path.exists(ev_marker):
            make_events(os.path.join(args.out_dir, "events.parquet"),
                        args.events, seed=args.seed + 2)
            with open(ev_marker, "w") as f:
                f.write("ok")
    print("wrote", args.out_dir)


if __name__ == "__main__":
    main()
