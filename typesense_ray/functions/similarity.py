"""Similarity search over an embedding column (``list<float>``).

- :func:`knn_bruteforce` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put``), each ``map_batches`` task computes a
  vectorized partial top-k (numpy matmul), and the driver merges the tiny
  per-block top-k's. No shuffle.
- :class:`IVFIndex` — the scale path: coarse k-means centroids from a
  size-capped sample, centroid-partitioned Parquet inverted lists (the
  ONLY layout — nothing materializes the dataset on the driver), queries
  probe only ``nprobe`` lists with lazy per-list loads.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def vecs_to_numpy(col) -> np.ndarray:
    """Zero-copy-ish decode of an Arrow ``list<float>`` /
    ``fixed_size_list<float>`` column into an (n, dim) float64 matrix:
    flatten the child values buffer and reshape — no per-row Python
    lists."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.astype(np.float64, copy=False).reshape(n, -1)


def knn_bruteforce(
    ds,
    queries: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    metric: str = "cosine",
) -> pa.Table:
    """Exact top-k for each query row. Returns (query_id, {id_col}, score,
    rank), ranked by (score desc, id desc) per query."""
    import ray

    q = np.asarray(queries, dtype=np.float64)
    if q.ndim == 1:
        q = q[None, :]
    qn = _normalize(q) if metric == "cosine" else q
    q_ref = ray.put(qn)

    def partial_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)  # zero-copy read from the object store
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        v = vecs_to_numpy(batch[vec_col])
        vn = _normalize(v) if metric == "cosine" else v
        sims = vn @ qm.T  # (batch, nq)
        nq = qm.shape[0]
        kk = min(k, len(ids))
        part = np.argpartition(sims, len(ids) - kk, axis=0)[len(ids) - kk :]
        rows = part.T.ravel()  # per query, its kk rows
        qids = np.repeat(np.arange(nq, dtype=np.int32), kk)
        return pa.table(
            {"query_id": pa.array(qids, pa.int32()),
             id_col: pa.array(ids[rows], pa.int64()),
             "score": pa.array(sims[rows, qids], pa.float64())}
        )

    parts = ds.map_batches(
        partial_topk, batch_format="pyarrow", batch_size=4096
    ).take_all()
    out_rows = {"query_id": [], id_col: [], "score": [], "rank": []}
    by_q: dict[int, list] = {}
    for r in parts:
        by_q.setdefault(r["query_id"], []).append((r["score"], r[id_col]))
    for qi in sorted(by_q):
        rows = sorted(by_q[qi], key=lambda t: (-t[0], -t[1]))[:k]
        for rank, (s, did) in enumerate(rows, 1):
            out_rows["query_id"].append(qi)
            out_rows[id_col].append(did)
            out_rows["score"].append(s)
            out_rows["rank"].append(rank)
    return pa.table(
        {"query_id": pa.array(out_rows["query_id"], pa.int32()),
         id_col: pa.array(out_rows[id_col], pa.int64()),
         "score": pa.array(out_rows["score"], pa.float64()),
         "rank": pa.array(out_rows["rank"], pa.int32())}
    )


class IVFIndex:
    """Coarse-quantized ANN: size-capped sample → k-means (few Lloyd
    iterations) → centroid-partitioned Parquet inverted lists. Centroids
    are broadcast; assignment is a stateless map_batches; each query scans
    only nprobe lists, loaded lazily from their partitions and cached."""

    def __init__(self, n_centroids: int = 16, n_iter: int = 5, seed: int = 3):
        self.n_centroids = n_centroids
        self.n_iter = n_iter
        self.seed = seed
        self.centroids: np.ndarray | None = None
        self.lists: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self.out_dir: str | None = None
        self.id_col = "vec_id"
        self.vec_col = "embedding"

    @classmethod
    def load(cls, out_dir: str) -> "IVFIndex":
        """Reopen a spilled index written by ``fit``."""
        import json as _json
        import os

        with open(os.path.join(out_dir, "ivf_meta.json")) as f:
            meta = _json.load(f)
        idx = cls(meta["n_centroids"], meta["n_iter"], meta["seed"])
        idx.centroids = np.asarray(meta["centroids"], dtype=np.float64)
        idx.out_dir = out_dir
        idx.id_col = meta["id_col"]
        idx.vec_col = meta["vec_col"]
        return idx

    def fit(self, ds, vec_col: str = "embedding", id_col: str = "vec_id",
            sample_fraction: float | None = None, out_dir: str | None = None,
            max_train: int = 65536):
        """Train centroids on a driver sample capped at ``max_train``
        vectors (``sample_fraction`` overrides the auto cap) and write the
        centroid-partitioned list layout — the 100 TB path: queries read
        only probed partitions, a failed build rerun overwrites per
        partition, and NOTHING materializes the full dataset anywhere."""
        import json as _json
        import os
        import tempfile

        import ray

        if out_dir is None:
            out_dir = tempfile.mkdtemp(prefix="tsray-ivf-")
        if sample_fraction is None:
            n_total = ds.count()
            sample_fraction = min(1.0, max_train / max(n_total, 1))
        sample = (
            ds
            if sample_fraction >= 1.0
            else ds.random_sample(sample_fraction, seed=self.seed)
        )
        sm_parts = [
            vecs_to_numpy(b[vec_col])
            for b in sample.iter_batches(
                batch_format="pyarrow", batch_size=8192
            )
        ]
        sm = _normalize(np.concatenate(sm_parts))
        rng = np.random.default_rng(self.seed)
        c = sm[rng.choice(len(sm), min(self.n_centroids, len(sm)), replace=False)]
        for _ in range(self.n_iter):
            assign = np.argmax(sm @ c.T, axis=1)
            for j in range(len(c)):
                members = sm[assign == j]
                if len(members):
                    v = members.mean(axis=0)
                    nv = np.linalg.norm(v)
                    if nv > 0:
                        c[j] = v / nv
        self.centroids = c
        c_ref = ray.put(c)

        def assign_batch(batch: pa.Table) -> pa.Table:
            cm = ray.get(c_ref)
            v = _normalize(vecs_to_numpy(batch[vec_col]))
            a = np.argmax(v @ cm.T, axis=1).astype(np.int32)
            return pa.table(
                {id_col: batch[id_col], vec_col: batch[vec_col],
                 "centroid": pa.array(a)}
            )

        self.id_col, self.vec_col = id_col, vec_col
        ds.map_batches(assign_batch, batch_format="pyarrow").write_parquet(
            os.path.join(out_dir, "lists"), partition_cols=["centroid"]
        )
        with open(os.path.join(out_dir, "ivf_meta.json"), "w") as f:
            _json.dump(
                {"n_centroids": self.n_centroids, "n_iter": self.n_iter,
                 "seed": self.seed, "id_col": id_col, "vec_col": vec_col,
                 "centroids": self.centroids.tolist()}, f,
            )
        self.out_dir = out_dir
        return self

    def _load_list(self, c: int):
        """Fetch one inverted list from the partitioned layout (cached)."""
        import os

        import pyarrow.dataset as pads

        t = pads.dataset(
            os.path.join(self.out_dir, "lists"), partitioning="hive"
        ).to_table(
            filter=pads.field("centroid") == c,
            columns=[self.id_col, self.vec_col],
        )
        if t.num_rows == 0:
            return None
        ids = np.asarray(t[self.id_col].to_numpy(), dtype=np.int64)
        vecs = _normalize(vecs_to_numpy(t[self.vec_col]))
        self.lists[c] = (ids, vecs)
        return self.lists[c]

    def search(self, query: np.ndarray, k: int = 10, nprobe: int = 4):
        q = np.asarray(query, dtype=np.float64).ravel()
        qn = q / (np.linalg.norm(q) or 1.0)
        order = np.argsort(-(self.centroids @ qn))[:nprobe]
        best: list[tuple[float, int]] = []
        for c_ in order:
            if int(c_) not in self.lists:
                if self.out_dir is None or self._load_list(int(c_)) is None:
                    continue
            ids, vecs = self.lists[int(c_)]
            sims = vecs @ qn
            for s, i in zip(sims.tolist(), ids.tolist()):
                best.append((s, i))
        best.sort(key=lambda t: (-t[0], -t[1]))
        return best[:k]


def label_centroids(ds, vec_col: str = "embedding", label_col: str = "label"):
    """Per-label centroid of an embedding column: per-batch (label →
    vector-sum, count) partials — each block reduces to ≤ |labels| rows
    of dim floats — folded and divided on the driver. The grouped
    mean-pooling step of class-prototype / nearest-centroid pipelines.
    Returns a pandas DataFrame (label, dim, centroid)."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        labels = batch[label_col].to_numpy(zero_copy_only=False)
        mat = np.array(batch[vec_col].to_pylist(), dtype=np.float64)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), mat.shape[1]))
        np.add.at(sums, inv, mat)
        counts = np.bincount(inv, minlength=len(uniq))
        return pa.table(
            {
                "label": pa.array(uniq.astype(np.int64), pa.int64()),
                "n": pa.array(counts, pa.int64()),
                "s": pa.array(list(sums), pa.list_(pa.float64())),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    rows = []
    for label, grp in parts.groupby("label"):
        tot = np.sum(np.stack(grp["s"].to_numpy()), axis=0)
        n = grp["n"].sum()
        c = tot / n
        rows.extend(
            {"label": int(label), "dim": i + 1, "centroid": float(v)}
            for i, v in enumerate(c)
        )
    return pd.DataFrame(rows)


class PQIndex:
    """Product quantization — the compressed-vector scale path (Jégou
    et al., "Product Quantization for Nearest Neighbor Search", PAMI
    2011): split each (L2-normalized) vector into ``m`` subspaces,
    k-means each subspace into ``k ≤ 256`` codewords, store one uint8
    code per subspace — dim × 4 bytes shrinks to ``m`` bytes per
    vector, so a 100-TB float corpus fits hot memory as a few TB of
    codes.

    Distributed shape: codebooks train on a driver sample capped at
    ``max_train`` (like IVFIndex.fit); encoding is a stateless
    ``map_batches`` (codebooks broadcast via ``ray.put``); search is
    asymmetric-distance (ADC): ONE (m × k) inner-product lookup table
    per query, then per-block vectorized ``lut[j, codes[:, j]]``
    gathers + partial top-k — the driver merges k × blocks rows.
    """

    def __init__(self, m: int = 8, k: int = 256, n_iter: int = 8,
                 seed: int = 3):
        self.m = m
        self.k = k
        self.n_iter = n_iter
        self.seed = seed
        self.codebooks: np.ndarray | None = None  # (m, k, dim/m)
        self.codes_ds = None
        self.id_col = "vec_id"
        self.vec_col = "embedding"

    def fit(self, ds, vec_col: str = "embedding", id_col: str = "vec_id",
            max_train: int = 65536):
        import ray

        self.vec_col, self.id_col = vec_col, id_col
        n = ds.count()
        frac = min(1.0, max_train / max(n, 1))
        sample = ds.random_sample(frac, seed=self.seed) if frac < 1.0 else ds
        train = _normalize(vecs_to_numpy(
            pa.Table.from_pandas(sample.to_pandas())[vec_col]
        ))
        dim = train.shape[1]
        assert dim % self.m == 0, "dim must divide into m subspaces"
        sub = dim // self.m
        rng = np.random.default_rng(self.seed)
        books = np.empty((self.m, self.k, sub), np.float64)
        for j in range(self.m):
            x = train[:, j * sub:(j + 1) * sub]
            c = x[rng.choice(len(x), size=min(self.k, len(x)),
                             replace=False)]
            if len(c) < self.k:  # degenerate tiny inputs: pad by repeat
                c = np.concatenate([c] * (self.k // len(c) + 1))[: self.k]
            for _ in range(self.n_iter):
                d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
                a = d.argmin(1)
                for ci in range(self.k):
                    pts = x[a == ci]
                    if len(pts):
                        c[ci] = pts.mean(0)
            books[j] = c
        self.codebooks = books
        ref = ray.put(books)
        m, k_ = self.m, self.k

        def encode(batch: pa.Table) -> pa.Table:
            bks = ray.get(ref)
            vecs = _normalize(vecs_to_numpy(batch[vec_col]))
            nrows = len(vecs)
            codes = np.empty((nrows, m), np.uint8)
            for j in range(m):
                x = vecs[:, j * sub:(j + 1) * sub]
                # ||x-c||² argmin == (x·c − ||c||²/2) argmax, vectorized
                dots = x @ bks[j].T - 0.5 * (bks[j] ** 2).sum(1)
                codes[:, j] = dots.argmax(1).astype(np.uint8)
            return pa.table(
                {
                    id_col: batch[id_col],
                    "code": pa.array(
                        list(codes), pa.list_(pa.uint8(), m)
                    ),
                }
            )

        self.codes_ds = ds.map_batches(
            encode, batch_format="pyarrow"
        ).materialize()
        return self

    def search(self, q: np.ndarray, k: int = 10):
        """ADC top-k: returns [(score, id)] by approximate inner product
        against the normalized corpus (≈ cosine ranking)."""
        import ray

        qn = np.asarray(q, np.float64)
        qn = qn / np.linalg.norm(qn)
        sub = qn.shape[0] // self.m
        lut = np.stack(
            [self.codebooks[j] @ qn[j * sub:(j + 1) * sub]
             for j in range(self.m)]
        )  # (m, k)
        lut_ref = ray.put(lut)
        id_col, m = self.id_col, self.m

        def partial(batch: pa.Table) -> pa.Table:
            lt = ray.get(lut_ref)
            codes = np.array(batch["code"].to_pylist(), np.uint8)
            scores = np.zeros(len(codes), np.float64)
            for j in range(m):
                scores += lt[j, codes[:, j]]
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            top = np.argsort(-scores, kind="mergesort")[:k]
            return pa.table(
                {id_col: pa.array(ids[top]),
                 "score": pa.array(scores[top], pa.float64())}
            )

        parts = self.codes_ds.map_batches(
            partial, batch_format="pyarrow"
        ).to_pandas()
        parts = parts.sort_values(
            ["score", id_col], ascending=[False, False], ignore_index=True
        ).head(k)
        return [(float(s), int(i))
                for s, i in zip(parts["score"], parts[id_col])]


def kmeans_assign(
    ds,
    k: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int = 6,
):
    """One deterministic Lloyd iteration of k-means over an embedding
    column, returning a pyarrow Table (id_col, cluster) sorted by id.

    Deterministic construction (no RNG, so a DuckDB oracle can replay
    it): seeds are the embeddings of the k SMALLEST ids; every vector is
    assigned to the nearest seed (squared L2, ties to the lower cluster
    id); cluster means are recomputed and rounded to ``round_to``
    decimals (rounding pins the float result so both engines agree);
    vectors are re-assigned against the updated centroids.

    Distributed shape: seed selection is a per-block partial min-k (no
    sort/all-to-all); each assignment pass is a broadcast of the (k, d)
    centroid matrix + one vectorized distance matmul per batch; the mean
    recomputation is the combiner pattern — each batch emits k partial
    (sum, count) rows, the driver folds k x blocks tiny rows. No data
    rows ever shuffle.
    """
    import ray

    # --- seeds: k smallest ids (per-block partial min-k, driver merge)
    def min_k(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="mergesort")[:k]
        return batch.take(order).select([id_col, vec_col])

    head = ds.map_batches(min_k, batch_format="pyarrow").to_pandas()
    head = head.sort_values(id_col, ignore_index=True).head(k)
    seeds = np.array(head[vec_col].tolist(), dtype=np.float64)
    # fewer rows than clusters: every row is its own seed (k shrinks);
    # downstream closures size everything off the shipped seed matrix
    k = seeds.shape[0]

    def assign(X: np.ndarray, C: np.ndarray) -> np.ndarray:
        # squared L2 per (row, centroid) via explicit subtract-square-sum
        # (matches the oracle's elementwise distance; argmin ties go to
        # the first = lowest cluster id)
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return np.argmin(d2, axis=1)

    c_ref = ray.put(seeds)

    def partial_sums(batch: pa.Table) -> pa.Table:
        C = ray.get(c_ref)
        kk = C.shape[0]
        X = np.array(batch[vec_col].to_pylist(), dtype=np.float64)
        lab = assign(X, C)
        sums = np.zeros_like(C)
        np.add.at(sums, lab, X)
        counts = np.bincount(lab, minlength=kk).astype(np.int64)
        return pa.table(
            {
                "cid": pa.array(np.arange(kk), pa.int64()),
                "vsum": pa.array(sums.tolist(),
                                 pa.list_(pa.float64())),
                "n": pa.array(counts, pa.int64()),
            }
        )

    parts = ds.map_batches(
        partial_sums, batch_format="pyarrow"
    ).to_pandas()
    dim = seeds.shape[1]
    sums = np.zeros((k, dim), dtype=np.float64)
    counts = np.zeros(k, dtype=np.int64)
    for cid, vsum, n in zip(parts["cid"], parts["vsum"], parts["n"]):
        sums[cid] += np.asarray(vsum, dtype=np.float64)
        counts[cid] += n
    means = seeds.copy()
    nz = counts > 0
    means[nz] = np.round(sums[nz] / counts[nz, None], round_to)

    m_ref = ray.put(means)

    def final_assign(batch: pa.Table) -> pa.Table:
        C = ray.get(m_ref)
        X = np.array(batch[vec_col].to_pylist(), dtype=np.float64)
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster": pa.array(assign(X, C), pa.int64()),
            }
        )

    out = ds.map_batches(final_assign, batch_format="pyarrow").to_pandas()
    out = out.sort_values(id_col, ignore_index=True)
    return pa.table(
        {
            id_col: pa.array(out[id_col], pa.int64()),
            "cluster": pa.array(out["cluster"], pa.int64()),
        }
    )


def rerank_by_cosine(
    emb_ds,
    cand_ids,
    qvec: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Cosine scores for a BOUNDED candidate id set — the rerank stage
    of hybrid retrieval (lexical top-N -> vector rerank): broadcast the
    id set once, probe every batch with a vectorized ``pc.is_in``, and
    compute the float64 normalized dot only for hits. Only
    |candidates| rows ever leave the scan; the big side streams."""
    import ray

    ids = np.unique(np.asarray(list(cand_ids), dtype=np.int64))
    ids_ref = ray.put(pa.array(ids, pa.int64()))
    qn = np.asarray(qvec, dtype=np.float64)
    qn = qn / np.linalg.norm(qn)
    q_ref = ray.put(qn)

    def probe(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.filter(
            pc.is_in(batch[id_col], value_set=ray.get(ids_ref))
        )
        if t.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64())}
            )
        v = vecs_to_numpy(t[vec_col])
        cos = _normalize(v) @ ray.get(q_ref)
        return pa.table(
            {id_col: t[id_col].cast(pa.int64()),
             "cosine": pa.array(cos, pa.float64())}
        )

    return emb_ds.map_batches(probe, batch_format="pyarrow")
