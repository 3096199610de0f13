"""Combiner-style grouped aggregation over a Dataset.

The pattern the engine uses everywhere a reference aggregate exists
(facet counts/stats ``src/index.cpp:608-640``, pricing summaries,
windowed rollups): a stateless ``map_batches(partial_fn)`` reduces each
block to at most |groups| partial rows, then the partials — orders of
magnitude smaller than the input — are merged.

Two merge paths, mirroring ``IndexConfig.df_mode``:

- ``stream`` (default): iterate the partial blocks and fold them with one
  pandas groupby on the driver. Right whenever group cardinality ≪ input
  (facets, windows, vocab) — no all-to-all shuffle, wall-time is the map
  stage.
- ``groupby``: ``Dataset.groupby(...).aggregate(...)`` over the partials —
  the all-to-all path for group cardinalities too large for one node
  (e.g. per-user rollups over billions of users at 100 TB).
"""

from __future__ import annotations

import pandas as pd

_MERGE_FNS = {"sum": "sum", "min": "min", "max": "max"}


def combiner_aggregate(
    ds,
    partial_fn,
    group_cols: list[str],
    merges: dict[str, str],
    mode: str = "stream",
) -> pd.DataFrame:
    """``map_batches(partial_fn)`` → merge partials by ``merges``
    (column → 'sum'|'min'|'max') grouped on ``group_cols``.

    ``partial_fn`` takes a pandas batch and must already return one row
    per group present in the batch (the combiner). Returns the final
    grouped frame (small by contract — derived metrics like averages are
    the caller's job, computed from merged sums/counts)."""
    part_ds = ds.map_batches(partial_fn, batch_format="pandas")
    if mode == "groupby":
        from ray.data.aggregate import Max, Min, Sum

        cls = {"sum": Sum, "min": Min, "max": Max}
        aggs = [cls[how](c, alias_name=c) for c, how in merges.items()]
        return part_ds.groupby(group_cols).aggregate(*aggs).to_pandas()
    parts = list(part_ds.iter_batches(batch_format="pandas", batch_size=None))
    if not parts:
        return pd.DataFrame(columns=group_cols + list(merges))
    allp = pd.concat(parts, ignore_index=True)
    if allp.empty:
        return pd.DataFrame(columns=group_cols + list(merges))
    agg_map = {c: (c, _MERGE_FNS[how]) for c, how in merges.items()}
    return allp.groupby(group_cols, as_index=False).agg(**agg_map)


def rollup_aggregate(
    ds,
    partial_fn,
    group_cols: list[str],
    merges: dict[str, str],
    label: str = "ALL",
    mode: str = "stream",
) -> pd.DataFrame:
    """SQL ``GROUP BY ROLLUP(group_cols)``: the leaf cells come from ONE
    :func:`combiner_aggregate` pass over the input; every super-aggregate
    level (prefixes of ``group_cols``, down to the grand total) is then
    re-merged from the |leaf|-bounded frame on the driver — the input is
    never re-scanned and nothing bigger than the leaf grid moves.
    Rolled-up key columns carry ``label`` (the COALESCE'd NULL)."""
    leaf = combiner_aggregate(ds, partial_fn, group_cols, merges, mode=mode)
    agg_map = {c: (c, _MERGE_FNS[how]) for c, how in merges.items()}
    frames = [leaf[group_cols + list(merges)].copy()]
    for lvl in range(len(group_cols) - 1, -1, -1):
        keys = group_cols[:lvl]
        if keys:
            f = leaf.groupby(keys, as_index=False).agg(**agg_map)
        else:
            f = (
                leaf.assign(_g=0)
                .groupby("_g", as_index=False)
                .agg(**agg_map)
                .drop(columns="_g")
            )
        for c in group_cols[lvl:]:
            f[c] = label
        frames.append(f[group_cols + list(merges)])
    return pd.concat(frames, ignore_index=True)


def pivot_counts(
    ds,
    row_col: str,
    col_col: str,
    col_values: tuple,
    prefix: str = "n_",
) -> pd.DataFrame:
    """Crosstab / PIVOT: count of rows per (row_col, col_col), widened to
    one column per ``col_values`` entry (missing cells 0). One combiner
    pass reduces every block to its |rows|×|cols| grid; the driver pivot
    touches only that grid — the input is never shuffled."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([row_col, col_col], as_index=False).size()
        return g.rename(columns={"size": "c"})

    leaf = combiner_aggregate(ds, partial, [row_col, col_col], {"c": "sum"})
    wide = (
        leaf.pivot(index=row_col, columns=col_col, values="c")
        .reindex(columns=list(col_values))
        .fillna(0)
        .astype("int64")
    )
    wide.columns = [f"{prefix}{v}" for v in col_values]
    return wide.reset_index().sort_values(row_col, ignore_index=True)
