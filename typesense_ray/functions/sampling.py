"""Deterministic sampling operators for training-data pipelines.

:func:`stratified_sample` — k docs per stratum (e.g. per language),
chosen by a seedless multiplicative hash of the id rather than an RNG:
the sample is a pure function of the data, so reruns, resumed runs and
the SQL oracle all agree bit-for-bit, and no coordination or state is
needed across tasks.

Distributed shape: per-block vectorized partial top-k per stratum
(sort + groupby-head — each block forwards at most ``k × strata``
rows), then ONE ``groupby(stratum).map_groups`` over those partials
(≤ k × blocks rows per stratum ever shuffle, never the corpus).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# Knuth's multiplicative constant; h = (id * KNUTH) mod 2^32 gives a
# well-scattered deterministic order expressible in ANSI SQL
KNUTH = np.uint64(2654435761)
_MOD = np.uint64(1 << 32)


def _hash_ids(ids: np.ndarray) -> np.ndarray:
    return (ids.astype(np.uint64) * KNUTH) % _MOD


def stratified_sample(
    ds,
    group_col: str = "lang",
    k: int = 5,
    id_col: str = "doc_id",
):
    """Return a Dataset of (group_col, id_col): the k ids with the
    smallest multiplicative hash per stratum (ties broken by id)."""
    import pandas as pd

    def partial_topk(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                group_col: batch[group_col].to_pandas(),
                id_col: batch[id_col].to_numpy(zero_copy_only=False),
            }
        )
        df["h"] = _hash_ids(df[id_col].to_numpy(np.int64))
        top = (
            df.sort_values(["h", id_col], kind="mergesort")
            .groupby(group_col, sort=False)
            .head(k)
        )
        return pa.Table.from_pandas(top.reset_index(drop=True))

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        top = g.sort_values(["h", id_col], kind="mergesort").head(k)
        return top[[group_col, id_col]].reset_index(drop=True)

    return (
        ds.map_batches(partial_topk, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(final_topk, batch_format="pandas")
    )
