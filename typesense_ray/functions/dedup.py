"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

All are expressed as Dataset transforms: vectorized ``map_batches`` for
per-doc signatures, ``groupby`` for the bucket/shuffle step (the classic
shingle → minhash → band → bucket-groupby pipeline), with candidate
verification as a second small stage. At 100 TB the only all-to-all is
the band-bucket groupby whose rows are (band, hash, id) triples —
tiny compared to the corpus.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_MERSENNE = (1 << 61) - 1


def _hash64_bytes(s: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big"
    )


def text_hash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Add a stable 16-hex content hash column (for exact dedup)."""
    hashes = [
        hashlib.blake2b((t or "").encode("utf-8"), digest_size=8).hexdigest()
        for t in batch[text_col].to_pylist()
    ]
    return batch.append_column("text_hash", pa.array(hashes, pa.string()))


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup: content-hash each row, pick the min-id winner per hash
    with a two-stage aggregate (per-batch pandas partial → global
    ``groupby(hash).min``), then semi-join the winners back. Returns the
    surviving rows.

    Reference role: Topster kv_map per-key dedup (``include/topster.h:
    168-213``) generalized to corpus dedup. The winner aggregate moves
    only (hash, id) pairs; the per-group work is vectorized pandas, not
    one callback per group."""
    import pandas as pd

    hashed = ds.map_batches(
        lambda b: text_hash_batch(b, text_col), batch_format="pyarrow"
    )

    def partial_min(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df[["text_hash", id_col]]
            .groupby("text_hash", as_index=False)[id_col]
            .min()
        )

    # final reduce over the (hash, min_id) partials: they are tiny (one row
    # per distinct text per batch), so stream them to the driver; at
    # distinct-text counts beyond driver RAM switch this to
    # groupby("text_hash").aggregate(Min) — the partials are unchanged.
    win_by_hash: dict[str, int] = {}
    for b in hashed.map_batches(partial_min, batch_format="pandas").iter_batches(
        batch_format="pandas"
    ):
        for h, i in zip(b["text_hash"], b[id_col]):
            cur = win_by_hash.get(h)
            if cur is None or i < cur:
                win_by_hash[h] = i
    win_ids = set(win_by_hash.values())

    def keep_winners(b: pa.Table) -> pa.Table:
        import numpy as np

        m = np.fromiter(
            (x in win_ids for x in b[id_col].to_pylist()), bool, b.num_rows
        )
        return b.filter(pa.array(m))

    return hashed.map_batches(keep_winners, batch_format="pyarrow")


# -- shingles / jaccard ------------------------------------------------------


def char_shingles(text: str, k: int = 5) -> set[int]:
    """Stable hashed character k-grams (crc32-based — stable across runs
    and processes, unlike builtin hash())."""
    from zlib import crc32

    t = " ".join((text or "").lower().split())
    if len(t) < k:
        return {crc32(t.encode())} if t else set()
    b = t.encode("utf-8")
    # byte-level k-grams over the utf-8 stream (ascii-dominated corpora:
    # identical to char k-grams)
    return {crc32(b[i : i + k]) for i in range(len(b) - k + 1)}


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    sa, sb = char_shingles(a, k), char_shingles(b, k)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0


class MinHasher:
    """Seeded universal-hash MinHash signatures (vectorized per doc)."""

    def __init__(self, num_perm: int = 64, seed: int = 1729):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
        self.num_perm = num_perm

    def signature(self, shingle_hashes: set[int]) -> np.ndarray:
        if not shingle_hashes:
            return np.full(self.num_perm, _MERSENNE, dtype=np.uint64)
        x = np.fromiter(shingle_hashes, dtype=np.uint64, count=len(shingle_hashes))
        # (a*x + b) mod p per permutation, computed in uint64 with natural
        # mod-2^64 wraparound (a deterministic universal-ish hash family —
        # the exact function only needs to be a consistent hash, same trick
        # as datasketch's vectorized minhash)
        ax = (self.a[:, None] * x[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
        return ax.min(axis=1)


def minhash_lsh_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.8,
    seed: int = 1729,
):
    """MinHash+LSH near-dup detection.

    Pipeline: map_batches(shingle→minhash→explode to (band, band_hash, id))
    → groupby(band, band_hash) → candidate pairs → verify true n-gram
    Jaccard on the pair texts → pairs ≥ threshold, deduplicated, a < b.

    The verify stage broadcasts the candidate pair texts by joining ids
    back to the corpus (small side after LSH); at larger scale, swap the
    broadcast for a hash-join of pairs against the corpus.
    """
    import pandas as pd

    rows_per_band = num_perm // bands
    hasher = MinHasher(num_perm, seed)

    n_parts = 64  # shuffle partitions for the bucket exchange

    def to_bands(batch: pa.Table) -> pa.Table:
        out_part, out_hash, out_id = [], [], []
        ids = batch[id_col].to_pylist()
        for did, text in zip(ids, batch[text_col].to_pylist()):
            sig = hasher.signature(char_shingles(text, shingle_k))
            for bnd in range(bands):
                chunk = sig[bnd * rows_per_band : (bnd + 1) * rows_per_band]
                # band index mixed into the digest → one flat bucket key
                h = hashlib.blake2b(
                    bytes([bnd]) + chunk.tobytes(), digest_size=8
                ).digest()
                out_part.append(h[0] % n_parts)
                out_hash.append(h.hex())
                out_id.append(did)
        return pa.table(
            {"part": pa.array(out_part, pa.int32()),
             "band_hash": pa.array(out_hash, pa.string()),
             id_col: pa.array(out_id)}
        )

    # bucket → candidate pairs: ONE all-to-all over the (part, band_hash,
    # id) triples — 16 short rows per doc regardless of text size — into
    # ≤64 coarse partitions (bounded map_groups callbacks; a per-bucket
    # groupby would pay one callback per LSH bucket). Buckets never split
    # across partitions (part = f(band_hash)), so the within-partition
    # pandas groupby sees every member of each of its buckets; the driver
    # only ever sees the candidate-pair set (bounded by true-dup density).
    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, grp in g.groupby("band_hash")[id_col]:
            if len(grp) > 1:
                ids = np.sort(grp.to_numpy())
                ia, ib = np.triu_indices(ids.size, k=1)
                out_a.append(ids[ia])
                out_b.append(ids[ib])
        if not out_a:
            return pd.DataFrame({"a": [], "b": []}, dtype=np.int64)
        return pd.DataFrame(
            {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}
        )

    pair_rows = (
        ds.map_batches(to_bands, batch_format="pyarrow")
        .groupby("part")
        .map_groups(part_pairs, batch_format="pandas")
        .take_all()
    )
    pairs: set[tuple[int, int]] = {
        (int(r["a"]), int(r["b"])) for r in pair_rows
    }
    if not pairs:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})

    # verify with true n-gram Jaccard; shingle sets computed once per doc
    # (not per pair), distributed: the candidate id-set is broadcast once
    # (ray.put) and each task returns shingle arrays only for its
    # candidates — the driver pulls |candidates| rows, not the corpus
    import ray

    need_ref = ray.put(frozenset(x for p in pairs for x in p))

    def cand_shingles(t: pa.Table) -> pa.Table:
        need_set = ray.get(need_ref)
        out_id, out_sh = [], []
        for did, txt in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            if did in need_set:
                out_id.append(did)
                out_sh.append(
                    np.fromiter(char_shingles(txt, shingle_k), dtype=np.uint64)
                )
        return pa.table(
            {id_col: pa.array(out_id, pa.int64()),
             "sh": pa.array([s.tolist() for s in out_sh],
                            pa.list_(pa.uint64()))}
        )

    shingles: dict[int, set[int]] = {
        r[id_col]: set(int(x) for x in r["sh"])
        for r in ds.map_batches(
            cand_shingles, batch_format="pyarrow"
        ).take_all()
    }
    out_a, out_b, out_j = [], [], []
    for a, b_ in sorted(pairs):
        sa, sb = shingles.get(a, set()), shingles.get(b_, set())
        if not sa and not sb:
            j = 1.0
        else:
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            j = inter / union if union else 0.0
        if j >= threshold:
            out_a.append(a)
            out_b.append(b_)
            out_j.append(j)
    return pa.table({"a": pa.array(out_a, pa.int64()),
                     "b": pa.array(out_b, pa.int64()),
                     "jaccard": pa.array(out_j, pa.float64())})


def word_ngram_jaccard_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.6,
    df_cap: int = 64,
):
    """Exact word-n-gram Jaccard near-dup pairs (no sketching).

    Semantics: per doc, the DISTINCT set of word n-grams over the
    normalized non-empty token stream (same normalization as the index
    tokenizer); shingles shared by more than ``df_cap`` docs are stopword
    shingles and are excluded from BOTH the pair candidates and the
    per-doc set sizes (so Jaccard is exact over the kept-shingle
    universe). Returns (a, b, jaccard) for pairs with jaccard ≥ threshold.

    Distributed shape: map_batches(shingle+hash, distinct per doc) →
    groupby(shingle_hash).map_groups emitting (a, b) co-occurrence rows
    for groups of size ≤ df_cap — the diagonal row (d, d) carries each
    doc's kept-shingle size contribution so ONE pair-count groupby yields
    both sizes (diagonal) and common counts (off-diagonal) — → final
    jaccard over the aggregated counts. The all-to-alls move only
    (uint64, int64) rows; per-group pair fan-out is bounded by df_cap².
    The aggregated count table is ≤ n_docs + Σ per-bucket pairs rows and
    is reduced driver-side; at larger scale broadcast the diagonal via
    ``ray.put`` and stream the off-diagonal rows through map_batches.
    """
    import pandas as pd

    from typesense_ray.tokenizer import normalized_slots

    def shingle_rows(batch: pa.Table) -> pa.Table:
        out_id: list[int] = []
        out_sh: list[str] = []
        for did, text in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            toks = [t for t in normalized_slots(text or "") if t]
            shs = {
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            }
            out_id.extend([did] * len(shs))
            out_sh.extend(shs)
        h = pd.util.hash_array(np.asarray(out_sh, dtype=object))
        return pa.table(
            {
                "h": pa.array(h, pa.uint64()),
                id_col: pa.array(out_id, pa.int64()),
            }
        )

    def emit_cooc(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g[id_col].to_numpy())
        if ids.size > df_cap:
            return pd.DataFrame({"a": [], "b": []}, dtype=np.int64)
        ia, ib = np.triu_indices(ids.size, k=0)
        return pd.DataFrame({"a": ids[ia], "b": ids[ib]})

    counts = (
        ds.map_batches(shingle_rows, batch_format="pyarrow")
        .groupby("h")
        .map_groups(emit_cooc, batch_format="pandas")
        .groupby(["a", "b"])
        .count()
        .to_pandas()
    )
    diag = counts[counts["a"] == counts["b"]]
    sizes = dict(zip(diag["a"], diag["count()"]))
    pairs = counts[counts["a"] != counts["b"]]
    if len(pairs):
        na = pairs["a"].map(sizes).to_numpy(dtype=np.float64)
        nb = pairs["b"].map(sizes).to_numpy(dtype=np.float64)
        c = pairs["count()"].to_numpy(dtype=np.float64)
        jac = c / (na + nb - c)
        keep = jac >= threshold
        pairs = pairs[keep].assign(jaccard=jac[keep])
        pairs = pairs.sort_values(["a", "b"]).reset_index(drop=True)
    else:
        pairs = pd.DataFrame({"a": [], "b": [], "jaccard": []})
    return pa.table(
        {
            "a": pa.array(pairs["a"], pa.int64()),
            "b": pa.array(pairs["b"], pa.int64()),
            "jaccard": pa.array(pairs["jaccard"], pa.float64()),
        }
    )


# -- simhash ----------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (term-frequency weighted)."""
    from collections import Counter

    toks = Counter((text or "").lower().split())
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for tok, w in toks.items():
        h = _hash64_bytes(tok)
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), w, -w)
    return int(
        np.bitwise_or.reduce(
            (acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
        )
    )


def simhash_groups(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Exact-simhash grouping (hamming-0): map_batches(simhash) →
    groupby(simhash); emits groups with >1 member. For hamming ≤ d, split
    the 64 bits into d+1 bands and bucket-join each band (same LSH shape
    as minhash_lsh_pairs)."""
    import pandas as pd

    def add_sim(batch: pa.Table) -> pa.Table:
        sims = [simhash64(t) for t in batch[text_col].to_pylist()]
        return pa.table(
            {id_col: batch[id_col], "simhash": pa.array(sims, pa.uint64())}
        )

    def groups(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({id_col: [], "simhash": [], "group_size": []})
        g = g.sort_values(id_col)
        g["group_size"] = len(g)
        return g

    return (
        ds.map_batches(add_sim, batch_format="pyarrow")
        .groupby("simhash")
        .map_groups(groups, batch_format="pandas")
    )


# -- embedding near-dup ------------------------------------------------------


def embedding_dup_pairs(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 7,
):
    """Embedding-cosine near-dup: random-hyperplane LSH bucket (groupby
    signature) → within-bucket exact pairwise cosine → pairs ≥ threshold.
    Two vectors with cosine ≥ 0.95 collide in all n_planes bits with
    probability (1 - θ/π)^n ≈ 0.5 for n=8; run with 2-3 plane seeds for
    recall at scale (union of pairs)."""
    import pandas as pd

    def add_sig(batch: pa.Table, plane_seed: int) -> pa.Table:
        vecs = np.array(batch[vec_col].to_pylist(), dtype=np.float64)
        rng = np.random.default_rng(plane_seed)
        planes = rng.standard_normal((vecs.shape[1], n_planes))
        sig = (vecs @ planes > 0).astype(np.uint8)
        packed = np.packbits(sig, axis=1)[:, 0].astype(np.int64)
        return pa.table(
            {id_col: batch[id_col], "bucket": pa.array(packed),
             vec_col: batch[vec_col]}
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "cosine": []})
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        v = np.array(g[vec_col].tolist(), dtype=np.float64)
        norm = np.linalg.norm(v, axis=1, keepdims=True)
        norm[norm == 0] = 1.0
        vn = v / norm
        sim = vn @ vn.T
        out_a, out_b, out_c = [], [], []
        n = len(ids)
        for i in range(n):
            for j in range(i + 1, n):
                if sim[i, j] >= threshold:
                    out_a.append(int(ids[i]))
                    out_b.append(int(ids[j]))
                    out_c.append(float(sim[i, j]))
        return pd.DataFrame({"a": out_a, "b": out_b, "cosine": out_c})

    return (
        ds.map_batches(lambda b: add_sig(b, seed), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
