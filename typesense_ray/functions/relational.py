"""Relational building blocks a training-data pipeline needs around the
search engine: broadcast joins and event sessionization.

Both are Ray-Data-first:

- :func:`broadcast_semi_join` — the 100 TB join shape for a small build
  side: filter/project the small table once, ``ray.put`` its key set,
  and apply a vectorized ``pc.is_in`` inside ``map_batches`` on the big
  side. No shuffle ever touches the big table (a hash/shuffle join would
  move every block for what is a Bloom-filter-sized lookup).
- :func:`sessionize` — gap-based sessions per key: ONE hash shuffle on
  the key (``groupby(key).map_groups``), then a vectorized sort + diff +
  cumsum per group. The classic streaming-sessionization semantics
  expressed as a batch groupby; at 10^9 users the groupby is the
  unavoidable exchange and each group is tiny.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def broadcast_semi_join(
    big_ds,
    small_keys: np.ndarray,
    key_col: str,
):
    """Keep big-side rows whose ``key_col`` is in ``small_keys`` (the
    probe side of a broadcast hash join). The key array is put in the
    object store ONCE and read zero-copy by every task — never captured
    in the closure (which would re-pickle it per task)."""
    import ray

    keys_ref = ray.put(pa.array(np.unique(small_keys)))

    def probe(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_in(batch[key_col], value_set=ray.get(keys_ref)))

    return big_ds.map_batches(probe, batch_format="pyarrow")


def sessionize(
    events_ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: float = 1800.0,
):
    """Gap-based sessionization: events of one key belong to the same
    session while consecutive gaps are ≤ ``gap_s`` seconds. Returns one
    row per session: (key, session_idx, n_events, start_ts, end_ts,
    sum_value) with session_idx numbered 0.. per key in time order.

    Shape: ``groupby(key).map_groups`` — the one all-to-all — then a
    fully vectorized per-group kernel (sort, diff, cumsum, reduceat).
    """
    import pandas as pd

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:  # map_groups may probe with an empty frame
            return pd.DataFrame(
                {key_col: [], "session_idx": [], "n_events": [],
                 "start_ts": pd.Series([], dtype="datetime64[us]"),
                 "end_ts": pd.Series([], dtype="datetime64[us]"),
                 "sum_value": []}
            )
        g = g.sort_values(ts_col, kind="stable")
        ts = g[ts_col].to_numpy()
        gaps = np.diff(ts.astype("datetime64[us]").astype(np.int64)) / 1e6
        new_session = np.r_[True, gaps > gap_s]  # first event opens session 0
        sid = np.cumsum(new_session) - 1
        starts = np.flatnonzero(new_session)
        assert (sid[starts] == np.arange(len(starts))).all()
        counts = np.diff(np.append(starts, len(g)))
        vals = g["value"].to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {
                key_col: g[key_col].iloc[0],
                "session_idx": np.arange(len(starts), dtype=np.int64),
                "n_events": counts.astype(np.int64),
                "start_ts": ts[starts],
                "end_ts": ts[np.append(starts[1:], len(g)) - 1],
                "sum_value": np.add.reduceat(vals, starts),
            }
        )

    return events_ds.groupby(key_col).map_groups(sessions, batch_format="pandas")
