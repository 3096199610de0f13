"""Benchmark decontamination: flag training docs that share a word
n-gram with a (small) benchmark/eval set — the standard pre-training
leakage filter (n-gram overlap, as popularized by GPT-3/PaLM-style
dataset reports; typically n = 8..13).

Distributed shape: the benchmark side is inherently tiny (an eval set,
thousands of rows, arriving as its own file), so its n-gram set is
built once and broadcast via ``ray.put`` — every corpus batch probes
it with one vectorized hash-set ``isin``; the 100-TB side streams
through ``map_batches`` and never shuffles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from typesense_ray.functions.text import batch_ngram_stream


def benchmark_ngram_set(texts: list, n: int = 8) -> frozenset:
    """Distinct word n-grams of the benchmark texts (driver-side: the
    benchmark set is small by construction)."""
    ng, _ = batch_ngram_stream(texts, n)
    return frozenset(ng.tolist())


def dup_span_flags(
    ds,
    n: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "auto",
    stream_max_rows: int = 5_000_000,
):
    """Exact duplicate-substring detection at n-token granularity (the
    Lee et al. 2022 "Deduplicating Training Data Makes Language Models
    Better" exact-substring role, at span rather than suffix-array
    resolution): a span is *duplicated* when its n-gram occurs ≥ 2
    times in the whole corpus (any doc, including the same one).
    Returns (id_col, dup_spans) for every doc with ≥ 1 duplicated span.

    Shape: per-batch n-gram histograms shrink each block to its
    distinct grams; the global fold keeps ONLY grams with count ≥ 2 —
    bounded by true duplication density, like dedup.py's pair tables —
    then broadcasts them for a vectorized ``isin`` probe per batch.
    ``mode='groupby'`` (or 'auto' past ``stream_max_rows`` partial
    rows) runs the fold as a distributed ``groupby(gram).sum`` and
    only the c ≥ 2 survivors ever leave the exchange.
    """
    import ray

    from typesense_ray.functions.text import batch_ngram_stream

    def hist(batch: pa.Table) -> pa.Table:
        ng, _ = batch_ngram_stream(batch[text_col].to_pylist(), n)
        u, c = (
            np.unique(ng, return_counts=True)
            if len(ng)
            else (np.empty(0, object), np.empty(0, np.int64))
        )
        return pa.table(
            {"g": pa.array(u.tolist(), pa.string()),
             "c": pa.array(c, pa.int64())}
        )

    partials = ds.map_batches(hist, batch_format="pyarrow").materialize()
    if mode == "auto":
        mode = "stream" if partials.count() <= stream_max_rows else "groupby"
    if mode == "groupby":
        from ray.data.aggregate import Sum

        agg = partials.groupby("g").aggregate(Sum("c", alias_name="c"))
        dup = agg.filter(lambda r: r["c"] >= 2).to_pandas()["g"]
    else:
        df = partials.to_pandas().groupby("g", as_index=False)["c"].sum()
        dup = df.loc[df["c"] >= 2, "g"]
    dup_set = frozenset(dup.tolist())
    ref = ray.put(dup_set)

    def probe(batch: pa.Table) -> pa.Table:
        dset = ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ng, unit = batch_ngram_stream(batch[text_col].to_pylist(), n)
        if len(ng) == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "dup_spans": pa.array([], pa.int64())}
            )
        hit = pd.Series(ng, dtype=object).isin(dset).to_numpy()
        counts = np.bincount(unit[hit], minlength=len(ids))
        keep = counts > 0
        return pa.table(
            {
                id_col: pa.array(ids[keep], pa.int64()),
                "dup_spans": pa.array(counts[keep], pa.int64()),
            }
        )

    return ds.map_batches(probe, batch_format="pyarrow")


def bloom_bitset(bench_ngrams, m_bits: int = 1 << 20) -> np.ndarray:
    """Bloom bit array (bool, ``m_bits`` long) for a benchmark n-gram
    set: two positions per n-gram, both derived from ONE 64-bit FNV-1a
    of the n-gram string (p1 = h mod m, p2 = (h // m) mod m — standard
    double hashing from independent bit ranges). FNV is the repo's
    SQL-expressible string hash, so a DuckDB oracle can rebuild the
    exact same bitset and membership answers, false positives included."""
    from typesense_ray.functions.text import fnv1a_ascii_batch

    bits = np.zeros(m_bits, dtype=bool)
    grams = list(bench_ngrams)
    if grams:
        h = fnv1a_ascii_batch(grams)
        mm = np.uint64(m_bits)
        bits[(h % mm).astype(np.int64)] = True
        bits[((h // mm) % mm).astype(np.int64)] = True
    return bits


def bloom_flag_contaminated(
    ds,
    bench_ngrams,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 20,
):
    """Bloom-filter variant of :func:`flag_contaminated` — the 100-TB
    scale path when even the benchmark n-gram SET is too wide to
    broadcast as Python strings: the broadcast is a fixed ``m_bits``-bit
    array (128 KiB at the default) regardless of benchmark size, probed
    with two vectorized gathers per batch. Deterministic: false
    positives are a pure function of the hash, mirrored exactly by the
    SQL oracle. Returns (id_col, bloom_hits) per doc with >= 1 n-gram
    occurrence whose both bloom bits are set."""
    import ray

    from typesense_ray.functions.text import (
        batch_ngram_stream,
        fnv1a_ascii_batch,
    )

    bits_ref = ray.put(np.packbits(bloom_bitset(bench_ngrams, m_bits)))
    mm = np.uint64(m_bits)

    def probe(batch: pa.Table) -> pa.Table:
        bits = np.unpackbits(ray.get(bits_ref)).view(bool)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ng, unit = batch_ngram_stream(batch[text_col].to_pylist(), n)
        empty = pa.table(
            {id_col: pa.array([], pa.int64()),
             "bloom_hits": pa.array([], pa.int64())}
        )
        if len(ng) == 0:
            return empty
        h = fnv1a_ascii_batch(ng.tolist())
        hit = bits[(h % mm).astype(np.int64)] & bits[
            ((h // mm) % mm).astype(np.int64)
        ]
        counts = np.bincount(unit[hit], minlength=len(ids))
        keep = counts > 0
        return pa.table(
            {
                id_col: pa.array(ids[keep], pa.int64()),
                "bloom_hits": pa.array(counts[keep], pa.int64()),
            }
        )

    return ds.map_batches(probe, batch_format="pyarrow")


def flag_contaminated(
    ds,
    bench_ngrams: frozenset,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Return a Dataset of (id_col, ngram_hits) for every doc with at
    least one n-gram occurrence found in ``bench_ngrams``.

    Per batch: flatten → n-gram stream (vectorized), one ``isin`` probe
    against the broadcast set, one ``bincount`` to count hits per doc.
    """
    import ray

    ref = ray.put(bench_ngrams)

    def probe(batch: pa.Table) -> pa.Table:
        bset = ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ng, unit = batch_ngram_stream(batch[text_col].to_pylist(), n)
        if len(ng) == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "ngram_hits": pa.array([], pa.int64())}
            )
        hit = pd.Series(ng, dtype=object).isin(bset).to_numpy()
        counts = np.bincount(unit[hit], minlength=len(ids))
        keep = counts > 0
        return pa.table(
            {
                id_col: pa.array(ids[keep], pa.int64()),
                "ngram_hits": pa.array(counts[keep], pa.int64()),
            }
        )

    return ds.map_batches(probe, batch_format="pyarrow")
