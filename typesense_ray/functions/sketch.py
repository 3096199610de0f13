"""Distributed cardinality sketches.

HyperLogLog (Flajolet et al. 2007) over a Ray Dataset column: the
sketch state is m = 2**p registers, each the max "rank" (position of
the first 1-bit in the hashed value's suffix) seen for that register.
Registers merge by elementwise max, so the distributed shape is the
ideal combiner pattern: each ``map_batches`` task reduces its batch to
at most m tiny (bucket, rho) rows, and one m-bounded ``groupby(bucket)
.aggregate(Max)`` exchange produces the global registers — the
all-to-all moves O(m x blocks) rows no matter how many input rows
stream through (the 100-TB path never shuffles data rows).

The hash is the repo's standard SQL-expressible 32-bit Knuth
multiplicative hash (``(x * 2654435761) mod 2**32``), so a DuckDB
oracle can recompute the registers exactly: bucket = h mod m, suffix =
h // m (32 - p bits), rho = (32 - p) - floor(log2(suffix)) for a
non-zero suffix else (32 - p) + 1. floor(log2(.)) over integers below
2**24 is exact in IEEE double on both sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

KNUTH = np.uint64(2654435761)
_M32 = np.uint64(0xFFFFFFFF)


def _rho(suffix: np.ndarray, w: int) -> np.ndarray:
    """Rank of the first 1-bit of a w-bit suffix (1-based from the MSB
    side): w - floor(log2(suffix)) for suffix > 0, else w + 1."""
    out = np.full(suffix.size, w + 1, dtype=np.int64)
    nz = suffix > 0
    out[nz] = w - np.floor(np.log2(suffix[nz].astype(np.float64))).astype(
        np.int64
    )
    return out


def hll_register_rows(ds, col: str, p: int = 8):
    """HLL registers of ``ds[col]`` (integer ids) as a Dataset of
    (bucket, max_rho) rows, one per NON-EMPTY register, sorted upstream
    of the caller. Per-batch partial max first (<= m rows per block),
    then one m-bounded groupby(bucket).aggregate(Max)."""
    from ray.data.aggregate import Max

    m = 1 << p
    w = 32 - p

    def partial(batch: pa.Table) -> pa.Table:
        x = batch[col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (x * KNUTH) & _M32
        bucket = (h % np.uint64(m)).astype(np.int64)
        rho = _rho((h >> np.uint64(p)).astype(np.int64), w)
        regs = np.zeros(m, dtype=np.int64)
        np.maximum.at(regs, bucket, rho)
        hit = np.flatnonzero(regs)
        return pa.table(
            {
                "bucket": pa.array(hit, pa.int64()),
                "rho": pa.array(regs[hit], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Max("rho", alias_name="max_rho"))
    )


def hll_estimate(buckets: np.ndarray, max_rho: np.ndarray, p: int = 8) -> float:
    """Cardinality estimate from (bucket, max_rho) register rows
    (absent buckets are zero registers), with the standard small-range
    linear-counting correction."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.float64)
    regs[np.asarray(buckets, dtype=np.int64)] = np.asarray(
        max_rho, dtype=np.float64
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


def cms_register_rows(ds, text_col: str = "text", d: int = 2,
                      m: int = 4096):
    """Count-min sketch of TERM OCCURRENCE frequencies over a text
    column: ``d`` hash rows x ``m`` buckets, every register the SUM of
    occurrence counts of the terms that hash into it. Registers merge
    additively, so the shape matches :func:`hll_register_rows`: each
    batch folds its occurrence stream into <= d*m (row, bucket, c)
    partials, and one (d*m)-bounded ``groupby((row, bucket)).Sum``
    exchange produces the global sketch — data rows never shuffle, and
    the sketch is fixed-size however wide the corpus vocabulary grows
    (the 100-TB path for heavy-hitter term stats where exact df tables
    are vocabulary-sized).

    Bucket positions derive from ONE FNV-1a per DISTINCT term (row_i =
    (h // m^i) mod m — independent bit ranges, same double-hash trick as
    the Bloom filter), so a DuckDB oracle recomputes every register
    exactly. Point estimates (min over rows) come from
    :func:`cms_estimate`.
    """
    from ray.data.aggregate import Sum

    from typesense_ray.functions.text import (
        batch_term_stream,
        fnv1a_ascii_batch,
    )

    mm = np.uint64(m)

    def partial(batch: pa.Table) -> pa.Table:
        flat, _ = batch_term_stream(batch[text_col].to_pylist())
        empty = pa.table(
            {"row": pa.array([], pa.int64()),
             "bucket": pa.array([], pa.int64()),
             "c": pa.array([], pa.int64())}
        )
        if len(flat) == 0:
            return empty
        import pandas as pd

        codes, uniq = pd.factorize(flat)
        occ = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        h = fnv1a_ascii_batch(uniq.tolist())
        rows_out = []
        buckets_out = []
        counts_out = []
        for r in range(d):
            pos = ((h // (mm ** np.uint64(r))) % mm).astype(np.int64)
            regs = np.zeros(m, dtype=np.int64)
            np.add.at(regs, pos, occ)
            hit = np.flatnonzero(regs)
            rows_out.append(np.full(hit.size, r, dtype=np.int64))
            buckets_out.append(hit)
            counts_out.append(regs[hit])
        return pa.table(
            {
                "row": pa.array(np.concatenate(rows_out), pa.int64()),
                "bucket": pa.array(np.concatenate(buckets_out), pa.int64()),
                "c": pa.array(np.concatenate(counts_out), pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["row", "bucket"])
        .aggregate(Sum("c", alias_name="c"))
    )


def cms_estimate(reg_df, terms: list, d: int = 2, m: int = 4096) -> np.ndarray:
    """Point-estimate occurrence counts for ``terms`` from a register
    frame (columns row, bucket, c): min over the d rows' registers.
    Never underestimates the true count."""
    from typesense_ray.functions.text import fnv1a_ascii_batch

    mm = np.uint64(m)
    regs = np.zeros((d, m), dtype=np.int64)
    regs[reg_df["row"].to_numpy(), reg_df["bucket"].to_numpy()] = (
        reg_df["c"].to_numpy()
    )
    h = fnv1a_ascii_batch(list(terms))
    est = np.full(len(terms), np.iinfo(np.int64).max, dtype=np.int64)
    for r in range(d):
        pos = ((h // (mm ** np.uint64(r))) % mm).astype(np.int64)
        est = np.minimum(est, regs[r, pos])
    return est
