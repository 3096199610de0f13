"""Graph operators for dedup pipelines: connected components over a
near-duplicate pair table, so "A≈B, B≈C" collapses into ONE cluster
{A, B, C} with a canonical representative (the minimum node id) — the
step that turns pairwise dedup output into keep/drop decisions.

Algorithm: iterative min-label propagation with per-round label
compression (pointer jumping), the batch form of hash-to-min — see
Kiveris et al., "Connected Components in MapReduce and Beyond" (SoCC
2014) for the family. Each round every edge proposes min(label[a],
label[b]) to both endpoints (ONE vectorized ``map_batches`` over the
edge Dataset, labels broadcast via ``ray.put`` and probed with
``np.searchsorted``); per-block partial mins shrink the proposals to
≤ |nodes| rows per block before the driver folds them and compresses
labels (label[n] ← label[label[n]]). Compression makes convergence
O(log diameter) rounds, and near-dup graphs are near-cliques anyway
(2-3 rounds in practice).

Scale contract: the EDGE table streams — only the LABEL table (one
int64 pair per node that appears in ANY candidate pair) must fit the
driver/object store, the same bounded-by-duplicate-density contract as
the pair tables it consumes (dedup.py). Beyond that bound, swap the
driver fold for ``groupby(node).aggregate(Min)`` and the compression
step for the large-star/small-star exchanges of the paper; the
per-round edge pass is unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def connected_components(
    pairs_ds,
    a_col: str = "a",
    b_col: str = "b",
    max_rounds: int = 64,
):
    """Return a pyarrow Table (node, cluster) for every node appearing
    in ``pairs_ds``; ``cluster`` is the min node id of its component."""
    import pandas as pd
    import ray

    edges = pairs_ds.select_columns([a_col, b_col]).materialize()

    # node universe (bounded by pair density — see module docstring)
    def block_nodes(batch: pa.Table) -> pa.Table:
        u = np.unique(
            np.concatenate(
                [
                    batch[a_col].to_numpy(zero_copy_only=False),
                    batch[b_col].to_numpy(zero_copy_only=False),
                ]
            ).astype(np.int64)
        )
        return pa.table({"node": pa.array(u, pa.int64())})

    parts = edges.map_batches(block_nodes, batch_format="pyarrow").take_all()
    nodes = np.unique(np.array([r["node"] for r in parts], dtype=np.int64))
    labels = nodes.copy()
    if nodes.size == 0:
        return pa.table(
            {"node": pa.array([], pa.int64()),
             "cluster": pa.array([], pa.int64())}
        )

    for _ in range(max_rounds):
        ref = ray.put((nodes, labels))

        def propose(batch: pa.Table) -> pa.Table:
            nds, lbs = ray.get(ref)
            a = batch[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
            b = batch[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
            m = np.minimum(lbs[np.searchsorted(nds, a)],
                           lbs[np.searchsorted(nds, b)])
            df = pd.DataFrame(
                {"node": np.concatenate([a, b]), "lab": np.concatenate([m, m])}
            )
            g = df.groupby("node", as_index=False)["lab"].min()
            return pa.table(
                {"node": pa.array(g["node"], pa.int64()),
                 "lab": pa.array(g["lab"], pa.int64())}
            )

        props = edges.map_batches(propose, batch_format="pyarrow").take_all()
        if not props:
            break
        pdf = pd.DataFrame(props).groupby("node", as_index=False)["lab"].min()
        new = labels.copy()
        idx = np.searchsorted(nodes, pdf["node"].to_numpy(np.int64))
        new[idx] = np.minimum(new[idx], pdf["lab"].to_numpy(np.int64))
        # pointer jumping: compress label chains before the next round
        for _ in range(32):
            jumped = new[np.searchsorted(nodes, new)]
            if np.array_equal(jumped, new):
                break
            new = jumped
        if np.array_equal(new, labels):
            break
        labels = new

    return pa.table(
        {"node": pa.array(nodes, pa.int64()),
         "cluster": pa.array(labels, pa.int64())}
    )
