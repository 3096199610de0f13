"""Graph operators for dedup pipelines: connected components over a
near-duplicate pair table, so "A≈B, B≈C" collapses into ONE cluster
{A, B, C} with a canonical representative (the minimum node id) — the
step that turns pairwise dedup output into keep/drop decisions.

Two execution modes (``mode=`` like the pair-dedup ops in dedup.py):

- ``'stream'`` — iterative min-label propagation with per-round label
  compression (pointer jumping), the batch form of hash-to-min. Each
  round every edge proposes min(label[a], label[b]) to both endpoints
  (ONE vectorized ``map_batches`` over the edge Dataset, labels
  broadcast via ``ray.put`` and probed with ``np.searchsorted``);
  per-block partial mins shrink the proposals to ≤ |nodes| rows per
  block before the driver folds them and compresses labels
  (label[n] ← label[label[n]]). Fastest at normal dup density; the
  LABEL table (one int64 pair per node in any candidate pair) lives on
  the driver.

- ``'groupby'`` — fully distributed alternating large-star/small-star
  rounds (Kiveris et al., "Connected Components in MapReduce and
  Beyond", SoCC 2014): each round rewrites the EDGE Dataset with two
  coarse node-partitioned exchanges plus one pair-keyed dedup exchange;
  no driver-side label table at ANY density — the only driver state is
  a 3-scalar convergence invariant per round, and the only collect is
  the final (node, cluster) star-edge table this function returns.
  At convergence every component is a star centered at its minimum.

``'auto'`` counts the edge rows and picks — the same escape hatch the
pair-dedup reduces have, so a pathologically duplicate-heavy corpus
(precisely when near-dedup runs) never folds a corpus-sized table on
the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

STREAM_MAX_EDGES = 5_000_000
_N_PARTS = 64


def _node_part(x: np.ndarray, n_parts: int) -> np.ndarray:
    """Coarse partition key over node ids (multiplicative mix so dense
    id ranges spread)."""
    with np.errstate(over="ignore"):
        h = x.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    return ((h >> np.uint64(32)) % np.uint64(n_parts)).astype(np.int32)


def _cc_stars_groupby(edges, max_rounds: int, n_parts: int = _N_PARTS):
    """Distributed CC: alternating large-star/small-star edge rewrites.

    Edge canonical form throughout: (u, v) with u > v, no self loops.
    large-star connects every strictly-larger neighbor of each center
    to the center's minimum; small-star connects every smaller neighbor
    (and the center) to that minimum. Both are ONE coarse
    hash(center) % n_parts exchange with a fully vectorized per-group
    kernel (lexsort + reduceat-style run mins — no per-node Python
    loop); a pair-keyed dedup exchange bounds edge growth per round and
    yields the per-partition (count, hash-sum) partials the 3-scalar
    convergence invariant folds from."""
    import pandas as pd

    def orient(t: pa.Table) -> pa.Table:
        a = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = np.maximum(a, b)
        lo = np.minimum(a, b)
        keep = hi != lo
        df = pd.DataFrame({"u": hi[keep], "v": lo[keep]}).drop_duplicates()
        return pa.table(
            {"u": pa.array(df["u"].to_numpy(), pa.int64()),
             "v": pa.array(df["v"].to_numpy(), pa.int64())}
        )

    def star_stage(ds, kind: str):
        def prep(t: pa.Table) -> pa.Table:
            u = t["u"].to_numpy(zero_copy_only=False)
            v = t["v"].to_numpy(zero_copy_only=False)
            if kind == "large":
                # every node is a center; neighbors in both directions
                c = np.concatenate([u, v])
                nb = np.concatenate([v, u])
            else:
                # centers are the larger endpoints (edges oriented u > v)
                c, nb = u, v
            return pa.table(
                {"part": pa.array(_node_part(c, n_parts)),
                 "c": pa.array(c, pa.int64()),
                 "n": pa.array(nb, pa.int64())}
            )

        def emit(g: pd.DataFrame) -> pd.DataFrame:
            if len(g) == 0:
                return pd.DataFrame(
                    {"u": pd.Series([], dtype=np.int64),
                     "v": pd.Series([], dtype=np.int64)}
                )
            c = g["c"].to_numpy()
            nb = g["n"].to_numpy()
            order = np.lexsort((nb, c))
            c = c[order]
            nb = nb[order]
            uc, starts, counts = np.unique(
                c, return_index=True, return_counts=True
            )
            m = np.minimum(nb[starts], uc)  # min(N(c) ∪ {c}) per center
            mrep = np.repeat(m, counts)
            if kind == "large":
                mask = nb > c  # strictly larger neighbors re-point to min
                out_u, out_v = nb[mask], mrep[mask]
            else:
                mask = nb != mrep
                out_u = np.concatenate([nb[mask], uc])
                out_v = np.concatenate([mrep[mask], m])
            df = pd.DataFrame({"u": out_u, "v": out_v})
            df = df[df["u"] != df["v"]].drop_duplicates()
            return df

        return (
            ds.map_batches(prep, batch_format="pyarrow")
            .groupby("part")
            .map_groups(emit, batch_format="pandas")
        )

    def dedup_stage(ds):
        from typesense_ray.functions.dedup import _pair_part

        def addp(t: pa.Table) -> pa.Table:
            return t.append_column(
                "ppart",
                pa.array(
                    _pair_part(
                        t["u"].to_numpy(zero_copy_only=False),
                        t["v"].to_numpy(zero_copy_only=False),
                        n_parts,
                    )
                ),
            )

        def dd(g: pd.DataFrame) -> pd.DataFrame:
            return g.drop_duplicates(["u", "v"])[["u", "v"]]

        return (
            ds.map_batches(addp, batch_format="pyarrow")
            .groupby("ppart")
            .map_groups(dd, batch_format="pandas")
        )

    def invariant(ds) -> tuple[int, int, int]:
        # (edge count, two independent 64-bit hash sums) — per-block
        # partials, driver folds 3 scalars per block
        def partial(t: pa.Table) -> pa.Table:
            u = t["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
            v = t["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
            with np.errstate(over="ignore"):
                h1 = (u * np.uint64(0x9E3779B97F4A7C15)) ^ v
                h2 = (v * np.uint64(0xC2B2AE3D27D4EB4F)) ^ u
            return pa.table(
                {"n": pa.array([t.num_rows], pa.int64()),
                 "h1": pa.array([int(h1.sum(dtype=np.uint64))], pa.uint64()),
                 "h2": pa.array([int(h2.sum(dtype=np.uint64))], pa.uint64())}
            )

        parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
        n = sum(r["n"] for r in parts)
        h1 = sum(r["h1"] for r in parts) & ((1 << 64) - 1)
        h2 = sum(r["h2"] for r in parts) & ((1 << 64) - 1)
        return (n, h1, h2)

    E = edges.map_batches(orient, batch_format="pyarrow").materialize()
    prev = invariant(E)
    if prev[0] == 0:
        return pa.table(
            {"node": pa.array([], pa.int64()),
             "cluster": pa.array([], pa.int64())}
        )
    converged = False
    for _ in range(max_rounds):
        E = dedup_stage(star_stage(star_stage(E, "large"), "small"))
        E = E.materialize()
        cur = invariant(E)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        # an unconverged star fixed point means the labels below may split
        # one component into several — never consume that table silently
        raise RuntimeError(
            f"connected_components(mode='groupby') did not reach the "
            f"large-star/small-star fixed point within max_rounds="
            f"{max_rounds} (last invariant {prev}); increase max_rounds"
        )

    # fixed point: every component is a star (x, min) — the final label
    # table is exactly these edges plus the centers' self-labels; this
    # collect is the function's return value (bounded by node count)
    final = E.to_pandas()
    nodes = np.concatenate(
        [final["u"].to_numpy(np.int64), final["v"].to_numpy(np.int64)]
    )
    labs = np.concatenate(
        [final["v"].to_numpy(np.int64), final["v"].to_numpy(np.int64)]
    )
    df = (
        pd.DataFrame({"node": nodes, "cluster": labs})
        .groupby("node", as_index=False)["cluster"]
        .min()
        .sort_values("node", ignore_index=True)
    )
    return pa.table(
        {"node": pa.array(df["node"], pa.int64()),
         "cluster": pa.array(df["cluster"], pa.int64())}
    )


def connected_components(
    pairs_ds,
    a_col: str = "a",
    b_col: str = "b",
    max_rounds: int = 64,
    mode: str = "auto",
    stream_max_edges: int = STREAM_MAX_EDGES,
):
    """Return a pyarrow Table (node, cluster) for every node appearing
    in ``pairs_ds``; ``cluster`` is the min node id of its component.

    ``mode``: 'stream' (driver label fold — fastest at normal dup
    density), 'groupby' (fully distributed large-star/small-star — no
    driver label table at any density), or 'auto' (count the edge rows
    and pick)."""
    import pandas as pd
    import ray

    edges = pairs_ds.select_columns([a_col, b_col]).materialize()
    if mode == "auto":
        mode = "stream" if edges.count() <= stream_max_edges else "groupby"
    if mode == "groupby":
        E = edges.map_batches(
            lambda t: pa.table(
                {"u": t[a_col].cast(pa.int64()),
                 "v": t[b_col].cast(pa.int64())}
            ),
            batch_format="pyarrow",
        )
        return _cc_stars_groupby(E, max_rounds)

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
