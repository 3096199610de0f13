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


def shard_shuffle(
    ds,
    n_shards: int = 8,
    id_col: str = "doc_id",
    n_ranges: int = 256,
    stream_max_rows: int = 5_000_000,
):
    """Deterministic global training-data shuffle: every row gets a
    ``shard`` (hash mod n_shards — which output file it lands in) and a
    ``pos`` (its rank within the shard by (hash, id) — the read order),
    as a pure function of the data: reruns, resumes and the SQL oracle
    agree bit-for-bit, with no RNG state shipped anywhere.

    Distributed shape (grouped rank via the same two-level prefix-sum
    as packing.py): hash + coarse hash-range key per batch; per
    (shard, range) row counts fold to exclusive offsets (broadcast);
    ONE groupby((shard, range)) then sorts locally and adds its offset.
    No stage holds more than one (shard, range) cell's rows; the offset
    table is n_shards × n_ranges regardless of corpus size.
    """
    import pandas as pd
    import ray

    span = int(_MOD) // n_ranges

    def keys(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = _hash_ids(ids)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "h": pa.array(h.astype(np.int64), pa.int64()),
                "shard": pa.array(
                    (h % np.uint64(n_shards)).astype(np.int64), pa.int64()
                ),
                "part": pa.array(
                    (h // np.uint64(span)).astype(np.int64), pa.int64()
                ),
            }
        )

    keyed = ds.map_batches(keys, batch_format="pyarrow").materialize()

    def cell_counts(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"shard": batch["shard"].to_numpy(),
             "part": batch["part"].to_numpy()}
        )
        g = df.groupby(["shard", "part"], as_index=False).size()
        return pa.table(
            {
                "shard": pa.array(g["shard"], pa.int64()),
                "part": pa.array(g["part"], pa.int64()),
                "c": pa.array(g["size"], pa.int64()),
            }
        )

    partials_ds = keyed.map_batches(
        cell_counts, batch_format="pyarrow"
    ).materialize()
    if partials_ds.count() > stream_max_rows:
        from ray.data.aggregate import Sum

        cells = (
            partials_ds.groupby(["shard", "part"])
            .aggregate(Sum("c", alias_name="c"))
            .to_pandas()
        )
    else:
        cells = (
            pd.DataFrame(partials_ds.take_all())
            .groupby(["shard", "part"], as_index=False)["c"]
            .sum()
        )
    cells = cells.sort_values(["shard", "part"], ignore_index=True)
    grp = cells.groupby("shard")["c"]
    offs = grp.cumsum() - cells["c"]  # exclusive prefix within each shard
    off_map = {
        (int(s), int(p)): int(o)
        for s, p, o in zip(cells["shard"], cells["part"], offs)
    }
    off_ref = ray.put(off_map)

    def place(g: "pd.DataFrame") -> "pd.DataFrame":
        off = ray.get(off_ref)[(int(g["shard"].iat[0]), int(g["part"].iat[0]))]
        g = g.sort_values(["h", id_col], kind="mergesort")
        out = g[[id_col, "shard"]].copy()
        out["pos"] = off + np.arange(len(g), dtype=np.int64)
        return out.reset_index(drop=True)

    return keyed.groupby(["shard", "part"]).map_groups(
        place, batch_format="pandas"
    )


def rate_sample(
    ds,
    rates: dict,
    group_col: str = "source",
    id_col: str = "doc_id",
):
    """Deterministic weighted mixture sampling (the data-mixing pass):
    keep a row iff ``hash(id) / 2^32 < rates[group]`` — each group is
    independently downsampled to its target rate as a pure function of
    the data (no RNG state, rerun/oracle-stable). Rates broadcast via
    ``ray.put``; per batch one hash, one dict map, one compare."""
    import pandas as pd
    import ray

    thresholds = {
        k: min(int(v * float(_MOD)), int(_MOD)) for k, v in rates.items()
    }
    ref = ray.put(thresholds)

    def keep(batch: pa.Table) -> pa.Table:
        th = ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = _hash_ids(ids)
        thr = (
            pd.Series(batch[group_col].to_pylist())
            .map(th)
            .fillna(0)
            .to_numpy(np.uint64)
        )
        return batch.filter(pa.array(h < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def weighted_sample(
    ds,
    weight_col: str,
    k: int = 20,
    id_col: str = "doc_id",
):
    """Deterministic weighted sampling without replacement (Efraimidis–
    Spirakis A-ES): each row gets key ``u ** (1/w)`` with ``u`` a
    hash-derived uniform in (0, 1] — inclusion probability ∝ weight —
    and the k largest keys win. No RNG state: the sample is a pure
    function of the data (reruns, resumes and the SQL oracle agree).

    Distributed shape: per-block vectorized partial top-k (each block
    forwards ≤ k rows), driver merges k × blocks candidates. Returns
    (id_col, weight_col, key) for the winners."""
    import pandas as pd

    def partial_topk(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        w = batch[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        u = (_hash_ids(ids.astype(np.int64)).astype(np.float64) + 1.0) / float(
            _MOD
        )
        key = u ** (1.0 / w)
        df = pd.DataFrame({id_col: ids, weight_col: batch[weight_col],
                           "key": key})
        top = df.sort_values(
            ["key", id_col], ascending=[False, True], kind="mergesort"
        ).head(k)
        return pa.Table.from_pandas(top.reset_index(drop=True))

    parts = (
        ds.map_batches(partial_topk, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["key", id_col], ascending=[False, True],
                     kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
    return parts
