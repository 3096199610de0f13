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
