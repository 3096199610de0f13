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
- :func:`asof_join` — point-in-time join (latest right row ≤ left ts
  per key): pad both sides to one schema, union, ONE
  ``groupby(key).map_groups`` co-partition, ``pd.merge_asof`` per key.
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


def _by_key_partition(ds, key_col: str, fn, n_parts: int = 64):
    """ONE coarse ``hash(key) % n_parts`` exchange instead of a raw
    per-key groupby: Ray's per-key ``map_groups`` pays one Python
    callback per key (~300 µs each — minutes of pure overhead at 10^6+
    keys), while ``n_parts`` callbacks cost nothing and keys still never
    split across partitions. ``fn`` receives each partition's frame
    (with a ``_part`` column it may ignore) and must handle MULTIPLE
    keys vectorized."""
    import pandas as pd

    def add_part(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(t[key_col].to_numpy(zero_copy_only=False))
        return t.append_column(
            "_part", pa.array((h % np.uint64(n_parts)).astype(np.int32))
        )

    keyed = ds.map_batches(add_part, batch_format="pyarrow")
    return keyed.groupby("_part").map_groups(fn, batch_format="pandas")


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

    Shape: ONE coarse ``hash(key) % 64`` exchange
    (:func:`_by_key_partition` — a per-key groupby pays one Python
    callback per key), then a fully vectorized MULTI-key kernel per
    partition (one sort by (key, ts), key-boundary-aware session
    breaks, reduceat per session).
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
        g = g.sort_values([key_col, ts_col], kind="mergesort")
        keys = g[key_col].to_numpy()
        ts = g[ts_col].to_numpy()
        ts_us = ts.astype("datetime64[us]").astype(np.int64)
        new_key = np.r_[True, keys[1:] != keys[:-1]]
        gaps = np.r_[0.0, (ts_us[1:] - ts_us[:-1]) / 1e6]
        new_session = new_key | (gaps > gap_s)
        starts = np.flatnonzero(new_session)
        counts = np.diff(np.append(starts, len(g)))
        # session ordinal within its key: start index minus the index of
        # its key's FIRST session start
        key_first = np.flatnonzero(new_key[starts])
        sess_idx = np.arange(starts.size) - np.repeat(
            key_first, np.diff(np.append(key_first, starts.size))
        )
        vals = g["value"].to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {
                key_col: keys[starts],
                "session_idx": sess_idx.astype(np.int64),
                "n_events": counts.astype(np.int64),
                "start_ts": ts[starts],
                "end_ts": ts[np.append(starts[1:], len(g)) - 1],
                "sum_value": np.add.reduceat(vals, starts),
            }
        )

    return _by_key_partition(events_ds, key_col, sessions)

def windowed_lag(
    events_ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
):
    """Per-key lag deltas (the feature-engineering step behind
    inter-arrival-time and value-change features): for every event with
    a predecessor in its key's (ts, id)-ordered history, emit seconds
    since the previous event and the value delta.

    Shape: ONE coarse hash(key)%64 exchange (:func:`_by_key_partition`),
    vectorized multi-key diff per partition — a row's predecessor is the
    previous row iff the key matches. Rows without a predecessor are
    dropped (SQL's ``lag() IS NULL``)."""
    import pandas as pd

    def deltas(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {id_col: pd.Series([], dtype=np.int64),
                 key_col: pd.Series([], dtype=np.int64),
                 "dt_s": pd.Series([], dtype=np.float64),
                 "dv": pd.Series([], dtype=np.float64)}
            )
        g = g.sort_values([key_col, ts_col, id_col], kind="mergesort")
        keys = g[key_col].to_numpy()
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        v = g[value_col].to_numpy(dtype=np.float64)
        same = keys[1:] == keys[:-1]
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy()[1:][same],
                key_col: keys[1:][same],
                "dt_s": ((ts[1:] - ts[:-1]) / 1e6)[same],
                "dv": (v[1:] - v[:-1])[same],
            }
        )

    return _by_key_partition(events_ds, key_col, deltas)


def rolling_mean(
    events_ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    window: int = 4,
):
    """Per-key rolling mean over the last ``window`` rows (current row
    inclusive), rows ordered by (ts, id) — SQL's
    ``AVG(v) OVER (PARTITION BY key ORDER BY ts, id
    ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW)``.

    ONE coarse hash(key)%64 exchange (:func:`_by_key_partition`); the
    multi-key kernel accumulates the ``window`` shifted copies
    oldest-first (key-boundary-masked) so the float addition order per
    row is IDENTICAL to an in-order per-key windowed sum."""
    import pandas as pd

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {id_col: pd.Series([], dtype=np.int64),
                 key_col: pd.Series([], dtype=np.int64),
                 "rmean": pd.Series([], dtype=np.float64)}
            )
        g = g.sort_values([key_col, ts_col, id_col], kind="mergesort")
        keys = g[key_col].to_numpy()
        v = g[value_col].to_numpy(dtype=np.float64)
        n = len(v)
        # position of each row within its key (rows of one key are
        # contiguous after the sort)
        new_key = np.r_[True, keys[1:] != keys[:-1]]
        kstarts = np.flatnonzero(new_key)
        pos = np.arange(n) - np.repeat(
            kstarts, np.diff(np.append(kstarts, n))
        )
        s = np.zeros(n, dtype=np.float64)
        for k in range(window - 1, 0, -1):
            in_key = pos[k:] >= k  # v[i-k] is the same key's row
            s[k:][in_key] += v[:-k][in_key]
        s += v
        cnt = np.minimum(pos.astype(np.float64) + 1.0, float(window))
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                key_col: keys,
                "rmean": s / cnt,
            }
        )

    return _by_key_partition(events_ds, key_col, roll)


def asof_join(
    left_ds,
    right_ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    left_cols: tuple[str, ...] = ("event_id",),
    right_cols: dict[str, str] | None = None,
):
    """Point-in-time (as-of) join: each left row picks the LATEST right
    row of the same key with ``right.ts <= left.ts`` — the attribution /
    feature join an equi-join cannot express without lookahead leakage
    (DuckDB ``ASOF LEFT JOIN`` semantics, ties included).

    ``right_cols`` maps right column → output name (must not collide
    with left columns). Left rows with no prior right row keep nulls.

    Shape: both sides are padded to ONE unified schema (typed null
    columns for the other side's payload) so they union into a single
    Dataset; ONE COARSE-partitioned ``groupby(hash(key) % 64)``
    co-partitions — the unavoidable exchange, but 64 ``map_groups``
    callbacks instead of one per key (a per-key groupby pays ~300µs of
    Python per key — measured 2-3 s at 10^4 keys) — and a single
    vectorized ``pd.merge_asof(..., by=key)`` (a C merge over two
    time-sorted frames) joins every key in the partition at once.
    Partitioning assumption: one PARTITION (corpus/64) fits a task;
    keys never split across partitions.
    """
    import pandas as pd

    right_cols = right_cols or {"value": "value_right"}
    l_schema = left_ds.schema()
    r_schema = right_ds.schema()
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))
    lpay = [c for c in left_cols if c not in (key_col, ts_col)]
    rpay_out = list(right_cols.values())

    n_parts = 64

    def _part(keys: pa.ChunkedArray) -> pa.Array:
        h = pd.util.hash_array(
            keys.to_numpy(zero_copy_only=False)
        )
        return pa.array((h % np.uint64(n_parts)).astype(np.int32))

    def pad_left(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in (key_col, ts_col, *lpay)}
        for src, out in right_cols.items():
            cols[out] = pa.nulls(t.num_rows, r_types[src])
        cols["_side"] = pa.array(np.zeros(t.num_rows, np.int8))
        cols["_part"] = _part(t[key_col])
        return pa.table(cols)

    def pad_right(t: pa.Table) -> pa.Table:
        cols = {key_col: t[key_col], ts_col: t[ts_col]}
        for c in lpay:
            cols[c] = pa.nulls(t.num_rows, l_types[c])
        for src, out in right_cols.items():
            cols[out] = t[src]
        cols["_side"] = pa.array(np.ones(t.num_rows, np.int8))
        cols["_part"] = _part(t[key_col])
        return pa.table(cols)

    both = left_ds.map_batches(pad_left, batch_format="pyarrow").union(
        right_ds.map_batches(pad_right, batch_format="pyarrow")
    )

    def join_part(g: pd.DataFrame) -> pd.DataFrame:
        left = g.loc[g["_side"] == 0, [key_col, ts_col, *lpay]]
        right = g.loc[g["_side"] == 1, [key_col, ts_col, *rpay_out]]
        return pd.merge_asof(
            left.sort_values(ts_col, kind="mergesort"),
            right.sort_values(ts_col, kind="mergesort"),
            on=ts_col,
            by=key_col,
            direction="backward",
        )

    return both.groupby("_part").map_groups(
        join_part, batch_format="pandas"
    )


def grouped_quantiles(
    ds,
    group_col: str = "event_type",
    value_col: str = "value",
    ps: tuple = (0.25, 0.5, 0.75, 0.95),
    n_ranges: int = 256,
    stream_max_rows: int = 5_000_000,
):
    """EXACT per-group discrete quantiles (value at 1-based rank
    ``ceil(p·n)``) without ever sorting or holding a whole group:
    distributed selection by value-range bucketing + grouped rank — the
    same two-level prefix-sum shape as packing/shard_shuffle.

    1. one cheap pass for the global [min, max] of ``value_col``;
    2. per-batch (group, bucket) row counts (bucket = linear slot in
       [min, max], monotone in value) → exclusive offsets per group and
       per-group totals → target ranks, broadcast;
    3. ONE ``groupby((group, bucket))`` exchange; each cell sorts only
       its bucket's values, adds its offset, and emits just the rows
       whose global in-group rank is a target — at most |groups|·|ps|
       rows ever reach the driver.

    Heavily-skewed value distributions concentrate cells (same caveat
    as any range partitioning); raise ``n_ranges`` to split hot cells.
    """
    import pandas as pd
    import ray

    # pass 1: global value range (two floats to the driver)
    def mm(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False)
        return pa.table({"lo": pa.array([float(v.min())] if len(v) else [],
                                        pa.float64()),
                         "hi": pa.array([float(v.max())] if len(v) else [],
                                        pa.float64())})

    parts = ds.map_batches(mm, batch_format="pyarrow").to_pandas()
    lo, hi = float(parts["lo"].min()), float(parts["hi"].max())
    width = (hi - lo) or 1.0

    def keys(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.clip(((v - lo) / width * n_ranges).astype(np.int64),
                    0, n_ranges - 1)
        return pa.table(
            {
                group_col: batch[group_col],
                value_col: pa.array(v, pa.float64()),
                "bucket": pa.array(b, pa.int64()),
            }
        )

    keyed = ds.map_batches(keys, batch_format="pyarrow").materialize()

    def cell_counts(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {group_col: batch[group_col].to_pandas(),
             "bucket": batch["bucket"].to_numpy()}
        )
        g = df.groupby([group_col, "bucket"], as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "c"}), preserve_index=False
        )

    partials_ds = keyed.map_batches(
        cell_counts, batch_format="pyarrow"
    ).materialize()
    if partials_ds.count() > stream_max_rows:
        from ray.data.aggregate import Sum

        cells = (
            partials_ds.groupby([group_col, "bucket"])
            .aggregate(Sum("c", alias_name="c"))
            .to_pandas()
        )
    else:
        cells = (
            pd.DataFrame(partials_ds.take_all())
            .groupby([group_col, "bucket"], as_index=False)["c"]
            .sum()
        )
    cells = cells.sort_values([group_col, "bucket"], ignore_index=True)
    offs = cells.groupby(group_col)["c"].cumsum() - cells["c"]
    off_map = {
        (g, int(b)): int(o)
        for g, b, o in zip(cells[group_col], cells["bucket"], offs)
    }
    totals = cells.groupby(group_col)["c"].sum()
    # 0-based target rank per group: ceil(p·n) − 1
    targets = {
        g: {int(np.ceil(p * n)) - 1: p for p in ps}
        for g, n in totals.items()
    }
    # locate the exact cells holding each target rank — known from the
    # cell-count table, so we can also bound the fast path BEFORE moving
    # any data: the target cells' total row count is already on the driver
    tcells: dict[tuple, dict[int, float]] = {}
    tcell_rows = 0
    by_group = {g: sub for g, sub in cells.groupby(group_col)}
    for g, want in targets.items():
        sub = by_group[g]
        cum = sub["c"].cumsum().to_numpy()
        for r, p in want.items():
            i = int(np.searchsorted(cum, r, side="right"))
            b = int(sub["bucket"].iloc[i])
            off = int(cum[i - 1]) if i else 0
            cell = tcells.setdefault((g, b), {})
            if not cell:
                tcell_rows += int(sub["c"].iloc[i])
            cell[r - off] = p

    if tcell_rows <= stream_max_rows:
        # FAST PATH: no second all-to-all — one broadcast filter pass
        # collects ONLY the |groups|·|ps| target cells' values (each
        # bounded by a 1/n_ranges value slice; the check above guards
        # pathological skew), then a tiny driver sort per cell.
        tref = ray.put(frozenset(tcells))

        def collect(batch: pa.Table) -> pa.Table:
            want_cells = ray.get(tref)
            gser = pd.Series(batch[group_col].to_pylist(), dtype=object)
            bser = batch["bucket"].to_numpy()
            mask = pd.Series(
                list(zip(gser, bser.tolist())), dtype=object
            ).isin(want_cells).to_numpy()
            return batch.filter(pa.array(mask))

        vals = keyed.map_batches(
            collect, batch_format="pyarrow"
        ).to_pandas()
        rows = []
        for (g, b), want in sorted(tcells.items(), key=lambda kv: kv[0]):
            sub = vals[(vals[group_col] == g) & (vals["bucket"] == b)]
            v = np.sort(sub[value_col].to_numpy(np.float64),
                        kind="mergesort")
            for ric, p in want.items():
                rows.append((g, p, float(v[ric])))
        import ray.data as rd

        return rd.from_pandas(
            pd.DataFrame(rows, columns=[group_col, "p", value_col])
        )

    # FALLBACK: distributed per-cell rank pick (one more all-to-all, but
    # no cell ever materializes on the driver)
    ref = ray.put((off_map, targets))

    def pick(g: "pd.DataFrame") -> "pd.DataFrame":
        om, tg = ray.get(ref)
        key = (g[group_col].iat[0], int(g["bucket"].iat[0]))
        off = om[key]
        want = tg[key[0]]
        v = np.sort(g[value_col].to_numpy(np.float64), kind="mergesort")
        hit = [(p, float(v[r - off]))
               for r, p in want.items() if off <= r < off + len(v)]
        return pd.DataFrame(
            {
                group_col: pd.Series([key[0]] * len(hit), dtype=object),
                "p": pd.Series([p for p, _ in hit], dtype=np.float64),
                value_col: pd.Series([x for _, x in hit], dtype=np.float64),
            }
        )

    return keyed.groupby([group_col, "bucket"]).map_groups(
        pick, batch_format="pandas"
    )


def quantile_trim(
    ds,
    group_col: str = "event_type",
    value_col: str = "value",
    lo: float = 0.05,
    hi: float = 0.95,
    n_ranges: int = 256,
):
    """Per-group percentile outlier trim (the standard numeric-cleaning
    pass): compute the exact [lo, hi] quantile bounds per group with
    :func:`grouped_quantiles` (distributed rank selection — never a full
    sort), broadcast the |groups|×2 bound table, and filter with one
    vectorized comparison map. Keeps rows with
    ``q_lo(group) <= value <= q_hi(group)``; no value arithmetic, so
    float equality with a SQL oracle is exact."""
    import pandas as pd
    import ray

    q = grouped_quantiles(
        ds, group_col, value_col, ps=(lo, hi), n_ranges=n_ranges
    ).to_pandas()
    bounds = {
        g: (float(sub[sub["p"] == lo][value_col].iloc[0]),
            float(sub[sub["p"] == hi][value_col].iloc[0]))
        for g, sub in q.groupby(group_col)
    }
    ref = ray.put(bounds)

    def keep(batch: pa.Table) -> pa.Table:
        b = ray.get(ref)
        groups = pd.Series(batch[group_col].to_pylist())
        los = groups.map(lambda g: b[g][0]).to_numpy(np.float64)
        his = groups.map(lambda g: b[g][1]).to_numpy(np.float64)
        v = batch[value_col].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array((v >= los) & (v <= his)))

    return ds.map_batches(keep, batch_format="pyarrow")


def _broadcast_join(
    left_ds, right_ds, left_on, right_on, lpay, right_cols, how, l_types
):
    """Map-side join against a broadcast right frame (the small-side
    plan hash_join switches to under ``broadcast_threshold``): the right
    table is collected once, key cast to the left key type, renamed to
    the output payload names, and ``ray.put`` — every left batch probes
    it with one vectorized ``pd.merge`` / ``isin``. Left batches keep
    their native dtypes (no union padding), so inner-join outputs need
    no dtype restoration."""
    import pandas as pd
    import ray

    rt = pa.Table.from_pandas(right_ds.to_pandas())
    cols = {left_on: rt[right_on].cast(l_types[left_on])}
    for src, out in right_cols.items():
        cols[out] = rt[src]
    rframe = pa.table(cols).to_pandas()
    if how in ("semi", "anti"):
        rframe = rframe[[left_on]].drop_duplicates()
    ref = ray.put(rframe)

    def probe(batch: "pd.DataFrame") -> "pd.DataFrame":
        right = ray.get(ref)
        left = batch[[left_on, *lpay]]
        if how in ("semi", "anti"):
            hit = left[left_on].isin(right[left_on].to_numpy())
            return (left[hit] if how == "semi" else left[~hit]).reset_index(
                drop=True
            )
        return pd.merge(left, right, on=left_on, how=how).reset_index(
            drop=True
        )

    return left_ds.map_batches(probe, batch_format="pandas")


def _bucket_of(a: np.ndarray, n: int) -> np.ndarray:
    """Deterministic join bucket for int or string keys (internal —
    both sides just need to agree)."""
    import pandas as pd

    if a.dtype.kind in "iu":
        return (
            (a.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(n)
        ).astype(np.int64)
    return (pd.util.hash_array(a, categorize=False) % n).astype(np.int64)


def hash_join(
    left_ds,
    right_ds,
    left_on: str,
    right_on: str,
    left_cols: tuple[str, ...] = (),
    right_cols: dict[str, str] | None = None,
    how: str = "inner",
    n_buckets: int = 64,
    salt: int = 1,
    broadcast_threshold: int = 0,
):
    """Distributed shuffle hash join (repartition join): both sides are
    padded to one unified schema, tagged with ``_side`` and a
    ``_bucket = hash(key) % n_buckets`` column, unioned, and
    co-partitioned by ONE ``groupby(_bucket)`` exchange; each bucket
    task runs a vectorized ``pd.merge`` over its 1/n_buckets slice.

    ``broadcast_threshold > 0`` enables the Spark-style auto-broadcast
    plan: when ``right_ds.count()`` is at or under the threshold, the
    right side is collected once, ``ray.put``, and probed map-side per
    left batch — NO exchange touches the big side. Counting a derived
    (non-source) right Dataset executes it, so materialize such inputs
    first if they feed other consumers; output is identical either way.

    Output columns: ``left_on`` (the join key), ``left_cols`` verbatim,
    and ``right_cols`` values (src → output rename; must not collide).
    ``how``: 'inner' or 'left' (left-join null fills become pandas NaN,
    so int right-payloads surface as float64 — the SQL NULL analogue),
    or 'semi' / 'anti' (left rows with ≥1 / no key match — SQL
    EXISTS / NOT EXISTS; right payload ignored, output never fans out).

    Partitioning assumption: a single (bucket, salt) cell fits a task.
    ``salt > 1`` is the hot-key mitigation: left rows spread round-robin
    over ``salt`` sub-cells (a hot key's rows split ``salt`` ways
    instead of landing on one task) and the RIGHT side is replicated
    once per salt — use it when the left side is large/skewed and the
    right side is small; join output is identical for any salt."""
    import pandas as pd

    right_cols = right_cols or {}
    if how in ("semi", "anti"):
        # right payload never appears in semi/anti output; dropping it
        # here keeps pad_right's key-only fast path from KeyError-ing
        # on a payload column that no longer exists in the slimmed table
        right_cols = {}
    r_schema = right_ds.schema()
    l_schema = left_ds.schema()
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))
    lpay = [c for c in left_cols if c != left_on]
    rpay_out = list(right_cols.values())

    if broadcast_threshold > 0 and right_ds.count() <= broadcast_threshold:
        return _broadcast_join(
            left_ds, right_ds, left_on, right_on, lpay, right_cols,
            how, l_types,
        )

    def pad_left(t: pa.Table) -> pa.Table:
        k = t[left_on].to_numpy(zero_copy_only=False)
        cols = {left_on: t[left_on]}
        for c in lpay:
            cols[c] = t[c]
        for src, out in right_cols.items():
            cols[out] = pa.nulls(t.num_rows, r_types[src])
        cols["_side"] = pa.array(np.zeros(t.num_rows, np.int8))
        cols["_bucket"] = pa.array(_bucket_of(k, n_buckets), pa.int64())
        cols["_salt"] = pa.array(
            np.arange(t.num_rows, dtype=np.int64) % salt, pa.int64()
        )
        return pa.table(cols)

    def pad_right(t: pa.Table) -> pa.Table:
        if how in ("semi", "anti"):
            # payload is ignored — forward each key once per block
            import pyarrow.compute as pc

            t = pa.table({right_on: pc.unique(t[right_on])})
        # bucket AFTER casting to the left key type: a float64 key (int
        # column gone through a null-padded pandas stage upstream) must
        # hash identically to the left side's int64 values
        kcast = t[right_on].cast(l_types[left_on])
        k = kcast.to_numpy(zero_copy_only=False)
        cols = {left_on: kcast}
        for c in lpay:
            cols[c] = pa.nulls(t.num_rows, l_types[c])
        for src, out in right_cols.items():
            cols[out] = t[src]
        cols["_side"] = pa.array(np.ones(t.num_rows, np.int8))
        cols["_bucket"] = pa.array(_bucket_of(k, n_buckets), pa.int64())
        base = pa.table(cols)
        if salt == 1:
            return base.append_column(
                "_salt", pa.array(np.zeros(t.num_rows, np.int64), pa.int64())
            )
        # replicate the (small) right side once per salt sub-cell
        return pa.concat_tables(
            base.append_column(
                "_salt",
                pa.array(np.full(t.num_rows, s, np.int64), pa.int64()),
            )
            for s in range(salt)
        )

    both = left_ds.map_batches(pad_left, batch_format="pyarrow").union(
        right_ds.map_batches(pad_right, batch_format="pyarrow")
    )

    out_types = {left_on: l_types[left_on]}
    out_types.update({c: l_types[c] for c in lpay})
    out_types.update({out: r_types[src] for src, out in right_cols.items()})

    # typed empty output (left joins keep right payload nullable/float —
    # the pandas NULL analogue): an untyped empty pandas block trips
    # Ray's size estimator (np.vectorize over 0 rows) on string columns
    empty_schema = pa.schema(
        [
            (c, (pa.float64()
                 if how == "left" and c in rpay_out
                 and pa.types.is_integer(t) else t))
            for c, t in out_types.items()
        ]
    )

    def join_bucket(g: "pd.DataFrame"):
        left = g.loc[g["_side"] == 0, [left_on, *lpay]]
        right = g.loc[g["_side"] == 1, [left_on, *rpay_out]]
        if how in ("semi", "anti"):
            hit = left[left_on].isin(right[left_on].unique())
            out = (left[hit] if how == "semi" else left[~hit]).reset_index(
                drop=True
            )
            if len(out) == 0:
                return empty_schema.empty_table()
            # no nulls in a kept left row — undo the union-stage drift
            for c in (left_on, *lpay):
                out[c] = out[c].astype(out_types[c].to_pandas_dtype())
            return out
        out = pd.merge(left, right, on=left_on, how=how).reset_index(drop=True)
        if len(out) == 0:
            return empty_schema.empty_table()
        if how == "inner":
            # no nulls survive an inner join — undo the float64 drift the
            # null-padded union stage forced onto int columns
            for c, t in out_types.items():
                out[c] = out[c].astype(t.to_pandas_dtype())
        return out

    return both.groupby(["_bucket", "_salt"]).map_groups(
        join_bucket, batch_format="pandas"
    )


def grouped_histogram(
    ds,
    group_col: str = "event_type",
    value_col: str = "value",
    n_bins: int = 20,
):
    """Fixed-bin histogram per group over the GLOBAL [min, max] value
    range: one cheap min/max pass, then per-batch (group, bin) count
    partials and a driver fold bounded by |groups| × n_bins — the
    shape-profiling aggregate every pipeline report starts with."""
    import pandas as pd

    def mm(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {"lo": pa.array([float(v.min())] if len(v) else [], pa.float64()),
             "hi": pa.array([float(v.max())] if len(v) else [], pa.float64())}
        )

    parts = ds.map_batches(mm, batch_format="pyarrow").to_pandas()
    lo, hi = float(parts["lo"].min()), float(parts["hi"].max())
    width = (hi - lo) or 1.0

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        # keep the exact float op order SQL uses: (v - lo) / (hi - lo) * n
        b = np.minimum(
            np.floor((v - lo) / width * n_bins).astype(np.int64), n_bins - 1
        )
        df = pd.DataFrame(
            {group_col: batch[group_col].to_pandas(), "bin": b}
        )
        g = df.groupby([group_col, "bin"], as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "c"}), preserve_index=False
        )

    folded = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby([group_col, "bin"], as_index=False)["c"]
        .sum()
        .sort_values([group_col, "bin"], ignore_index=True)
    )
    return folded, lo, hi


def grouped_distinct_count(
    ds,
    group_col: str = "event_type",
    key_col: str = "user_id",
    n_buckets: int = 64,
):
    """EXACT count(DISTINCT key) per group with ONE exchange: per-batch
    (group, key) dedup shrinks each block to its distinct pairs, the
    pairs co-partition by ``hash(key) % n_buckets`` (all duplicates of a
    pair share its key, hence its bucket), each bucket dedups and emits
    per-group partial counts, and the driver folds |groups| × n_buckets
    tiny rows. The count-distinct pushdown every aggregation layer
    needs; no corpus-sized set ever sits on one node."""
    import pandas as pd

    def pairs(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {group_col: batch[group_col].to_pandas(),
             key_col: batch[key_col].to_numpy(zero_copy_only=False)}
        ).drop_duplicates()
        df["_bucket"] = _bucket_of(
            df[key_col].to_numpy(), n_buckets
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    def count_bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        d = g[[group_col, key_col]].drop_duplicates()
        out = d.groupby(group_col, as_index=False).size()
        return out.rename(columns={"size": "c"})

    partials = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(count_bucket, batch_format="pandas")
        .to_pandas()
    )
    return (
        partials.groupby(group_col, as_index=False)["c"]
        .sum()
        .sort_values(group_col, ignore_index=True)
    )


def zscore_normalize(
    ds,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
):
    """Per-group z-score normalization (the standard feature-scaling
    pass): two streaming passes — per-batch (count, sum, sumsq) moment
    partials fold to |groups| rows on the driver, broadcast, then one
    vectorized ``(v − μ) / σ`` map. Returns (id_col, group_col, z)."""
    import pandas as pd
    import ray

    def moments(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {group_col: batch[group_col].to_pandas(),
             "v": batch[value_col].to_numpy(zero_copy_only=False)}
        )
        g = df.groupby(group_col, as_index=False).agg(
            n=("v", "size"), s=("v", "sum"), ss=("v", lambda x: (x ** 2).sum())
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    m = (
        ds.map_batches(moments, batch_format="pyarrow")
        .to_pandas()
        .groupby(group_col, as_index=False)
        .sum()
    )
    mu = m["s"] / m["n"]
    sd = np.sqrt(m["ss"] / m["n"] - mu ** 2)
    stats = {g: (float(u), float(s))
             for g, u, s in zip(m[group_col], mu, sd)}
    ref = ray.put(stats)

    def z(batch: pa.Table) -> pa.Table:
        st = ray.get(ref)
        groups = pd.Series(batch[group_col].to_pylist())
        mus = groups.map(lambda g: st[g][0]).to_numpy(np.float64)
        sds = groups.map(lambda g: st[g][1]).to_numpy(np.float64)
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                id_col: batch[id_col],
                group_col: batch[group_col],
                "z": pa.array((v - mus) / sds, pa.float64()),
            }
        )

    return ds.map_batches(z, batch_format="pyarrow")


def running_total(
    events_ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
):
    """Per-key running total of ``value_col`` in (ts, id) order — SQL's
    ``SUM(v) OVER (PARTITION BY key ORDER BY ts, id ROWS UNBOUNDED
    PRECEDING)``, the cumulative-feature pass. ONE coarse hash(key)%64
    exchange (:func:`_by_key_partition`); pandas' C segmented
    ``groupby(key).cumsum`` accumulates sequentially WITHIN each key —
    bit-identical floats to a per-key ``np.cumsum`` (a global cumsum
    minus per-key offsets would round differently and break the SQL
    hash match)."""
    import pandas as pd

    def cum(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {id_col: pd.Series([], dtype=np.int64),
                 key_col: pd.Series([], dtype=np.int64),
                 "cum": pd.Series([], dtype=np.float64)}
            )
        g = g.sort_values([key_col, ts_col, id_col], kind="mergesort")
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                key_col: g[key_col].to_numpy(),
                "cum": g[value_col].astype(np.float64)
                .groupby(g[key_col].to_numpy(), sort=False)
                .cumsum()
                .to_numpy(),
            }
        )

    return _by_key_partition(events_ds, key_col, cum)


def json_int_field(ds, col: str = "props", key: str = "k",
                   out_col: str | None = None):
    """Extract an integer field from a JSON-string column — the
    streaming parser shape for semi-structured sidecar columns (event
    properties, request metadata): one COMPILED-regex vectorized pass
    per batch (pandas ``str.extract`` — a C scan), never per-row
    ``json.loads``. Scoped to scalar integer fields at a fixed key,
    which is the hot case for event payloads; missing keys become
    nulls."""
    import re

    import pandas as pd

    out_col = out_col or key
    pattern = re.compile(rf'"{re.escape(key)}"\s*:\s*(-?\d+)')

    def ex(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch[col].to_pylist(), dtype=object)
        v = pd.to_numeric(
            s.str.extract(pattern, expand=False), errors="coerce"
        )
        return batch.append_column(
            out_col, pa.Array.from_pandas(v.astype("Int64"), type=pa.int64())
        )

    return ds.map_batches(ex, batch_format="pyarrow")
