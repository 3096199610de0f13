"""Resumable partitioned-Parquet sink: the output contract a 100 TB
run needs — one directory per partition key with a ``_SUCCESS`` marker
committed AFTER the data, so a failed run restarts and skips every
partition that already finished instead of rewriting (or worse,
double-appending) anything.

Shape: ``groupby(partition_col).map_groups`` co-locates each partition
in ONE task (the one exchange); the task writes ``part-<val>/data.
parquet`` via tmp-file + atomic rename, then the marker. Crash at any
point leaves either nothing or a complete, marked partition — rerun
semantics are exactly-once per partition. Pick the partition key so a
partition is task-sized (input shard id, key range, date); for bigger
partitions shard the key further upstream.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

SUCCESS_FILE = "_SUCCESS"


def write_partitioned(
    ds,
    out_dir: str,
    partition_col: str,
    resume: bool = True,
):
    """Write ``ds`` as ``<out_dir>/part-<value>/data.parquet`` (one dir
    per distinct ``partition_col`` value). Returns a pyarrow Table
    (partition, n_rows, skipped) — ``skipped`` rows were already
    complete from a prior run and untouched."""
    import pandas as pd
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        val = g[partition_col].iloc[0]
        pdir = os.path.join(out_dir, f"part-{val}")
        marker = os.path.join(pdir, SUCCESS_FILE)
        if resume and os.path.exists(marker):
            return pd.DataFrame(
                {"partition": [str(val)], "n_rows": [len(g)],
                 "skipped": [True]}
            )
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, f".data.parquet.tmp-{os.getpid()}")
        pq.write_table(
            pa.Table.from_pandas(g.reset_index(drop=True)), tmp
        )
        os.replace(tmp, os.path.join(pdir, "data.parquet"))
        with open(marker, "w"):
            pass
        return pd.DataFrame(
            {"partition": [str(val)], "n_rows": [len(g)], "skipped": [False]}
        )

    stats = (
        ds.groupby(partition_col)
        .map_groups(write_group, batch_format="pandas")
        .take_all()
    )
    return pa.table(
        {
            "partition": pa.array([r["partition"] for r in stats], pa.string()),
            "n_rows": pa.array([r["n_rows"] for r in stats], pa.int64()),
            "skipped": pa.array([r["skipped"] for r in stats], pa.bool_()),
        }
    )


def read_partitioned(out_dir: str):
    """Reopen a :func:`write_partitioned` layout as a Dataset, reading
    only partitions whose ``_SUCCESS`` marker exists (half-written
    partitions from a crashed run are invisible)."""
    import ray.data as rd

    files = [
        os.path.join(out_dir, d, "data.parquet")
        for d in sorted(os.listdir(out_dir))
        if d.startswith("part-")
        and os.path.exists(os.path.join(out_dir, d, SUCCESS_FILE))
    ]
    return rd.read_parquet(files)
