#!/usr/bin/env python
"""Local stand-in for the driver's correctness harness: run every
``queries()`` entry and its ``oracle_sql()`` SQL side-by-side over an sf
dir, compare row count / schema (column-name set) / values (columns
sorted by name, rows sorted by all columns), and print one line per
query. Usage::

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            ignore_reinit_error=True, logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as em

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = em.queries(), em.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"{name:24s} ENGINE-ERROR {type(e).__name__}: {e}")
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"{name:24s} no_oracle rows={len(mine)}")
            continue
        try:
            oracle = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"{name:24s} ORACLE-ERROR {type(e).__name__}: {e}")
            n_fail += 1
            continue
        rows_ok = len(mine) == len(oracle)
        schema_ok = list(mine.columns) == list(oracle.columns)
        vals_ok = False
        detail = ""
        if rows_ok and schema_ok:
            # strict on dtype KIND (int vs float vs object — e.g. DuckDB
            # HUGEINT sums hash-mismatch the engine's int64), tolerant on
            # float low bits (float32 oracles like list_cosine_similarity)
            kind_bad = [
                c for c in mine.columns
                if mine[c].dtype.kind != oracle[c].dtype.kind
            ]
            if kind_bad:
                detail = f"dtype-kind mismatch: {kind_bad}"
            else:
                try:
                    pd.testing.assert_frame_equal(
                        mine, oracle, check_dtype=False, check_exact=False,
                        rtol=1e-6, atol=1e-9,
                    )
                    vals_ok = True
                except AssertionError as e:
                    detail = str(e).splitlines()[-1][:160]
        ok = rows_ok and schema_ok and vals_ok
        n_fail += 0 if ok else 1
        print(
            f"{name:24s} {'OK' if ok else 'FAIL'} rows={len(mine)}/{len(oracle)}"
            f" schema={'=' if schema_ok else list(mine.columns)}"
            + (f" | {detail}" if detail else "")
        )
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
