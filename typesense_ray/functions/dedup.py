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
_MAX_U64 = (1 << 64) - 1  # empty-set signature sentinel (never a real min)
_FNV_PRIME = np.uint64(1099511628211)
_FNV_OFFSET = np.uint64(14695981039346656037)


def _hash64_bytes(s: str) -> int:
    """Token hash for simhash: first 8 bytes (big-endian) of sha256.
    sha256 (not blake2b) so an external SQL oracle can recompute the full
    simhash bit-exactly: DuckDB exposes sha256() but not blake2b, and
    ``('0x' || substr(sha256(tok), 1, 16))::UBIGINT`` reproduces this
    value exactly (see oracle_sql()['simhash_groups'])."""
    return int.from_bytes(hashlib.sha256(s.encode("utf-8")).digest()[:8], "big")


# -- distributed pair machinery ----------------------------------------------
#
# The pair-dedup ops (minhash LSH, simhash near-pairs, n-gram jaccard) end
# with a candidate-pair reduce. At normal dup density that table is tiny and
# a driver-side pandas fold is the fastest reduce (Ray's sort-based multi-key
# aggregate measures ~60x slower over 10^6 groups). A pathologically
# duplicate-heavy corpus, though, makes the candidate set corpus-sized, so
# every op takes mode='stream'|'groupby'|'auto': 'auto' counts the candidate
# rows and switches to the distributed shape, where pairs stay a Dataset
# end-to-end — pair-keyed coarse exchange for dedup/aggregation, and a
# broadcast-free merge join against an id-partitioned parquet sidecar for
# per-doc values (the same partitioned-layout pattern IVFIndex uses).

PAIR_STREAM_MAX_ROWS = 5_000_000


def _profile(label: str, t0: float) -> float:
    """GRAFT_PROFILE=1 stage-timing hook (the reproducible breakdown the
    bench discrepancies are diagnosed with): prints one stderr line per
    stage boundary and returns a fresh t0. No-op otherwise."""
    import os
    import sys
    import time

    t1 = time.perf_counter()
    if os.environ.get("GRAFT_PROFILE"):
        print(f"[profile] {label}: {t1 - t0:.3f}s", file=sys.stderr)
    return t1


def _pair_part(a: np.ndarray, b: np.ndarray, n_parts: int) -> np.ndarray:
    """Partition key over (a, b) pairs — mixes both ids so hot ids spread."""
    with np.errstate(over="ignore"):
        h = (
            a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        ) ^ b.astype(np.uint64)
    return (h % np.uint64(n_parts)).astype(np.int32)


def _bucket_pairs(keys: np.ndarray, ids: np.ndarray):
    """All within-bucket (a, b) id pairs (a < b) for rows grouped by
    ``keys`` — fully vectorized: lexsort by (key, id), find bucket runs,
    then ONE triu per DISTINCT bucket size over a (buckets, size) id
    matrix. No per-bucket Python loop. Returns (a, b) int64 arrays."""
    order = np.lexsort((ids, keys))
    k = keys[order]
    d = ids[order]
    _, idx_start, counts = np.unique(k, return_index=True,
                                     return_counts=True)
    multi = counts >= 2
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    starts_m = idx_start[multi]
    counts_m = counts[multi]
    for s in np.unique(counts_m):
        sel = starts_m[counts_m == s]
        mat = d[sel[:, None] + np.arange(int(s))[None, :]]
        ia, ib = np.triu_indices(int(s), k=1)
        out_a.append(mat[:, ia].ravel())
        out_b.append(mat[:, ib].ravel())
    if not out_a:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(out_a), np.concatenate(out_b)


def _dedup_pairs_dataset(pairs_ds, n_parts: int = 64):
    """Distinct (a, b) rows without materializing on the driver: pair-keyed
    coarse exchange → per-partition vectorized drop_duplicates (pairs never
    split across partitions, so partition-local distinct is global)."""
    import pandas as pd

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "ppart",
            pa.array(_pair_part(t["a"].to_numpy(), t["b"].to_numpy(), n_parts)),
        )

    def drop_dup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"], ignore_index=True)[["a", "b"]]

    return (
        pairs_ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("ppart")
        .map_groups(drop_dup, batch_format="pandas")
    )


def _write_vals_partitioned(vals_ds, id_col: str, n_parts: int = 64) -> str:
    """Write per-doc values as an id-hash-partitioned parquet layout under
    /tmp — the small side of the pair↔value merge join. One write serves
    both attach passes (keys a and b partition the same way)."""
    import tempfile

    root = tempfile.mkdtemp(prefix="tsray-pairvals-")

    def add_part(t: pa.Table) -> pa.Table:
        k = t[id_col].to_numpy().astype(np.uint64)
        return t.append_column(
            "vpart", pa.array((k % np.uint64(n_parts)).astype(np.int32))
        )

    vals_ds.map_batches(add_part, batch_format="pyarrow").write_parquet(
        root, partition_cols=["vpart"]
    )
    return root


def _attach_from_layout(
    pairs_ds, root: str, key_col: str, id_col: str, val_col: str,
    out_col: str, n_parts: int = 64,
):
    """Attach vals[key] to each pair row via a co-partitioned merge join:
    pairs exchange on key % n_parts; each of the ≤n_parts callbacks reads
    ONLY its value partition from the layout — no driver dict, no
    broadcast of a corpus-sized map."""
    import os

    import pandas as pd
    import pyarrow.dataset as pads

    part_col = f"__part_{key_col}"

    def add_part(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy().astype(np.uint64)
        return t.append_column(
            part_col, pa.array((k % np.uint64(n_parts)).astype(np.int32))
        )

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        p = int(g[part_col].iloc[0])
        pdir = os.path.join(root, f"vpart={p}")
        if os.path.isdir(pdir):
            vt = pads.dataset(pdir).to_table(columns=[id_col, val_col])
            m = dict(zip(vt[id_col].to_pylist(), vt[val_col].to_pylist()))
        else:
            m = {}
        g = g.drop(columns=[part_col])
        g[out_col] = g[key_col].map(m)
        return g

    return (
        pairs_ds.map_batches(add_part, batch_format="pyarrow")
        .groupby(part_col)
        .map_groups(attach, batch_format="pandas")
    )


def text_hash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Add two independent vectorized 64-bit content hashes (128 bits of
    key together — collision-negligible at 10^12 docs, where a single
    64-bit key would birthday-collide)."""
    import pandas as pd

    s = np.asarray(
        pd.Series(batch[text_col].to_pylist()).fillna(""), dtype=object
    )
    h1 = pd.util.hash_array(s)
    h2 = pd.util.hash_array(s, hash_key="1b2e3d4c5a6f7081")
    out = batch.append_column("text_hash", pa.array(h1, pa.uint64()))
    return out.append_column("text_hash2", pa.array(h2, pa.uint64()))


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                reduce: str = "auto"):
    """Exact dedup: content-hash each row (vectorized, 128-bit key), pick
    the min-id winner per hash with a two-stage aggregate (per-batch
    pandas partial → winner merge), then semi-join the winners back via a
    ``ray.put`` broadcast of the sorted winner-id array and a vectorized
    ``pc.is_in`` filter over the RAW dataset. Returns the surviving rows.

    Winner merge, mirroring ``IndexConfig.df_mode``: ``"stream"`` folds
    the (hash, min_id) partials with one vectorized pandas groupby on the
    driver (right when distinct texts fit one node — no all-to-all);
    ``"groupby"`` is the distributed ``groupby(hash).aggregate(Min)``
    all-to-all for corpora whose distinct-text count exceeds driver RAM;
    ``"auto"`` picks by ``ds.count()`` (parquet metadata — row count
    bounds the distinct count).

    Reference role: Topster kv_map per-key dedup (``include/topster.h:
    168-213``) generalized to corpus dedup. Either way the driver holds
    only winner-sized state (the output ids), broadcast once."""
    import pandas as pd
    import ray
    from ray.data.aggregate import Min

    hashed = ds.map_batches(
        lambda b: text_hash_batch(b, text_col), batch_format="pyarrow"
    )

    def partial_min(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df[["text_hash", "text_hash2", id_col]]
            .groupby(["text_hash", "text_hash2"], as_index=False)[id_col]
            .min()
        )

    partials = hashed.map_batches(partial_min, batch_format="pandas")
    if reduce == "auto":
        try:
            n_rows = ds.count()
        except Exception:
            n_rows = None
        reduce = "stream" if n_rows is not None and n_rows <= 5_000_000 else "groupby"
    if reduce == "stream":
        parts = list(partials.iter_batches(batch_format="pandas", batch_size=None))
        if parts:
            allp = pd.concat(parts, ignore_index=True)
            win = np.sort(
                allp.groupby(["text_hash", "text_hash2"])[id_col]
                .min()
                .to_numpy()
            )
        else:
            win = np.empty(0, np.int64)
    else:
        winners = partials.groupby(["text_hash", "text_hash2"]).aggregate(
            Min(id_col, alias_name="win")
        )
        win_parts = [
            b["win"].to_numpy()
            for b in winners.iter_batches(
                batch_format="pyarrow", batch_size=65536
            )
        ]
        win = (
            np.sort(np.concatenate(win_parts))
            if win_parts
            else np.empty(0, np.int64)
        )
    win_ref = ray.put(pa.array(win, pa.int64()))

    def keep_winners(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(
            pc.is_in(b[id_col].cast(pa.int64()), value_set=ray.get(win_ref))
        )

    # winner ids are globally unique (one min id per hash group), so the
    # keep pass filters the RAW dataset by id — no second hashing pass
    return ds.map_batches(keep_winners, batch_format="pyarrow")


# -- shingles / jaccard ------------------------------------------------------


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """Distinct byte-level k-grams over the whitespace-normalized lowered
    utf-8 stream, packed losslessly into uint64 (k ≤ 8 — no hash, no
    collisions) via one vectorized sliding-window pass. Returns a sorted
    unique uint64 array."""
    t = " ".join((text or "").lower().split())
    b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, np.uint64)
    if b.size < k:
        v = 0
        for x in b.tolist():
            v = (v << 8) | x
        return np.array([v], np.uint64)
    # pack each window by shifting k length-(n-k+1) uint64 lanes — ~1.7x
    # faster than sliding_window_view(b, k).astype(u64) @ mult, which
    # materializes a k-wide strided copy; values are bit-identical
    u = b.astype(np.uint64)
    n_w = b.size - k + 1
    v = u[:n_w].copy()
    for j in range(1, k):
        v <<= np.uint64(8)
        v |= u[j:j + n_w]
    return np.unique(v)


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    sa, sb = char_shingles(a, k), char_shingles(b, k)
    if not sa.size and not sb.size:
        return 1.0
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    union = sa.size + sb.size - inter
    return inter / union if union else 0.0


def _sig_matrix(col, num_perm: int) -> np.ndarray:
    """Zero-copy (n, num_perm) uint64 view of a fixed_size_binary
    signature column (chunk offsets honored); falls back to a bytes join
    for plain binary columns."""
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    parts = []
    for ch in chunks:
        if not len(ch):
            continue
        if pa.types.is_fixed_size_binary(ch.type) and ch.null_count == 0:
            flat = np.frombuffer(ch.buffers()[1], dtype=np.uint64)
            o = ch.offset * num_perm
            parts.append(flat[o:o + len(ch) * num_perm])
        else:
            parts.append(
                np.frombuffer(b"".join(ch.to_pylist()), dtype=np.uint64)
            )
    if not parts:
        return np.empty((0, num_perm), np.uint64)
    flat = parts[0] if len(parts) == 1 else np.concatenate(parts)
    return flat.reshape(-1, num_perm)


class MinHasher:
    """Seeded universal-hash MinHash signatures (vectorized per doc)."""

    def __init__(self, num_perm: int = 64, seed: int = 1729):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
        self.num_perm = num_perm

    def signature(self, shingle_ids: np.ndarray) -> np.ndarray:
        if shingle_ids.size == 0:
            return np.full(self.num_perm, _MAX_U64, dtype=np.uint64)
        x = shingle_ids.astype(np.uint64, copy=False)
        # min(a*x) + b mod 2^64 per permutation (natural uint64 wraparound,
        # odd-ish random multipliers — multiply-shift family). The exact
        # function only needs to be a consistent min-wise hash; an earlier
        # version reduced mod the Mersenne prime 2^61-1 like datasketch,
        # but numpy's uint64 `%` is an un-SIMD'd integer division that was
        # 58% of the whole signature stage (2.4x kernel cost for no
        # accuracy the exact-Jaccard verify doesn't already guarantee —
        # banding recall at the verify threshold is the same 0.9998 under
        # either family). The +b is hoisted OUT of the (perms, shingles)
        # pass: which shingle attains the min is decided by a*x alone, so
        # adding the per-perm constant after the reduce keeps the min-wise
        # property and drops a full matrix-sized add (1.5x on the kernel;
        # planted-dup pair sets verified unchanged at sf0.001/0.01/0.1 and
        # the 400k-doc corpus).
        with np.errstate(over="ignore"):
            m = (self.a[:, None] * x[None, :]).min(axis=1)
            return m + self.b


def minhash_lsh_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.8,
    seed: int = 1729,
    mode: str = "auto",
    stream_max_rows: int = PAIR_STREAM_MAX_ROWS,
):
    """MinHash+LSH near-dup detection.

    Pipeline: map_batches(shingle→minhash→explode to (band, band_hash, id))
    → groupby(band, band_hash) → candidate pairs → verify true n-gram
    Jaccard on the pair texts → pairs ≥ threshold, deduplicated, a < b.

    ``mode``: the candidate-pair reduce. 'stream' dedups/verifies via the
    driver with the candidate shingle dict broadcast (fastest at normal
    dup density, bounded by candidate count); 'groupby' keeps pairs a
    Dataset end-to-end — pair-keyed coarse exchange for the cross-band
    dedup, then two broadcast-free merge joins against an id-partitioned
    shingle sidecar (:func:`_attach_from_layout`) for the verify — so a
    pathologically duplicate-heavy corpus never materializes a
    corpus-sized pair set or shingle dict on one node. 'auto' counts the
    candidate rows and picks.
    """
    import pandas as pd

    rows_per_band = num_perm // bands
    hasher = MinHasher(num_perm, seed)

    n_parts = 64  # shuffle partitions for the bucket exchange

    def compute_sigs(batch: pa.Table) -> pa.Table:
        """(id, signature blob) — signatures are computed ONCE and reused
        by both the banding pass and the signature-agreement prefilter.

        The per-doc loop is deliberate: each doc's (num_perm, n_shingles)
        hash matrix (~1 MB at 128 perms) stays L2-resident, while a
        batch-wide perm-tiled ``minimum.reduceat`` kernel touches
        16 × total_shingles × 8 B per tile (hundreds of MB) and measured
        17× SLOWER on the sf0.1 corpus — cache locality beats loop
        elimination here."""
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        sigs = np.empty((ids.size, hasher.num_perm), dtype=np.uint64)
        for i, text in enumerate(batch[text_col].to_pylist()):
            sigs[i] = hasher.signature(char_shingles(text, shingle_k))
        # fixed_size_binary built from the matrix buffer in one shot — no
        # per-row bytes objects; consumers view it back zero-copy
        sig_arr = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(hasher.num_perm * 8), ids.size,
            [None, pa.py_buffer(sigs.tobytes())],
        )
        return pa.table({id_col: pa.array(ids, pa.int64()), "sig": sig_arr})

    def to_bands(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n = ids.size
        sigs = _sig_matrix(batch["sig"], hasher.num_perm)
        # band mixing: FNV-style fold of each band's rows + the band index
        # — all lanes at once (no per-doc/per-band hashlib calls)
        sig3 = sigs.reshape(n, bands, rows_per_band)
        h = np.broadcast_to(
            _FNV_OFFSET ^ np.arange(bands, dtype=np.uint64), (n, bands)
        ).copy()
        with np.errstate(over="ignore"):
            for r in range(rows_per_band):
                h = (h ^ sig3[:, :, r]) * _FNV_PRIME
        return pa.table(
            {
                "part": pa.array((h % np.uint64(n_parts)).ravel().astype(np.int32)),
                "band_hash": pa.array(h.ravel(), pa.uint64()),
                id_col: pa.array(np.repeat(ids, bands)),
            }
        )

    # bucket → candidate pairs: ONE all-to-all over the (part, band_hash,
    # id) triples — `bands` short rows per doc regardless of text size —
    # into ≤64 coarse partitions (bounded map_groups callbacks; a
    # per-bucket groupby would pay one callback per LSH bucket). Buckets
    # never split across partitions (part = f(band_hash)), so the
    # within-partition pandas groupby sees every member of each of its
    # buckets; the driver only ever sees the candidate-pair set (bounded
    # by true-dup density).
    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        a, b = _bucket_pairs(
            g["band_hash"].to_numpy(), g[id_col].to_numpy()
        )
        return pd.DataFrame({"a": a, "b": b})

    import time

    t0 = time.perf_counter()
    sig_ds = ds.map_batches(
        compute_sigs, batch_format="pyarrow"
    ).materialize()
    t0 = _profile("minhash signatures", t0)
    cand_ds = (
        sig_ds.map_batches(to_bands, batch_format="pyarrow")
        .groupby("part")
        .map_groups(part_pairs, batch_format="pandas")
    ).materialize()
    t0 = _profile("minhash band exchange", t0)
    n_cand = cand_ds.count()
    empty_out = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "jaccard": pa.array([], pa.float64())})
    if n_cand == 0:
        return empty_out
    if mode == "auto":
        mode = "stream" if n_cand <= stream_max_rows else "groupby"
    if mode == "groupby":
        return _verify_pairs_groupby(
            ds, cand_ds, text_col, id_col, shingle_k, threshold
        )

    import ray
    import ray.data as rd

    # collect candidate pairs as flat numpy, cross-band dedup via ONE
    # lexsort + neighbor-diff (pandas drop_duplicates over two int64 cols
    # measured ~10x slower at 10^6 rows)
    ab = [
        (b["a"].to_numpy(zero_copy_only=False),
         b["b"].to_numpy(zero_copy_only=False))
        for b in cand_ds.iter_batches(batch_format="pyarrow",
                                      batch_size=None)
        if b.num_rows
    ]
    aa = np.concatenate([x[0] for x in ab]).astype(np.int64, copy=False)
    bb = np.concatenate([x[1] for x in ab]).astype(np.int64, copy=False)
    if aa.size and max(aa.max(), bb.max()) < (1 << 31) and aa.min() >= 0:
        # pack (a, b) into one uint64 key: single-key unique sorts ~3x
        # faster than a two-key lexsort at 10^6 pairs
        key = np.unique(
            (aa.astype(np.uint64) << np.uint64(32)) | bb.astype(np.uint64)
        )
        aa = (key >> np.uint64(32)).astype(np.int64)
        bb = (key & np.uint64(0xFFFFFFFF)).astype(np.int64)
    else:
        order = np.lexsort((bb, aa))
        aa, bb = aa[order], bb[order]
        first = np.empty(aa.size, np.bool_)
        first[0] = True
        first[1:] = (aa[1:] != aa[:-1]) | (bb[1:] != bb[:-1])
        aa, bb = aa[first], bb[first]

    # SIGNATURE-AGREEMENT PREFILTER: permissive band configs (few rows per
    # band) surface 10^5-10^6 false candidates on repetitive corpora; the
    # exact shingle verify on all of them dominates the op. The full
    # num_perm signature estimates Jaccard with std sqrt(t(1-t)/P) (~0.035
    # at P=128), so keeping est >= threshold - 0.25 (>= 7 sigma below a
    # TRUE pair's mean agreement) discards false candidates with
    # negligible recall risk while the kept set stays near true-dup
    # density. Signatures were computed once above; only CANDIDATE docs'
    # signatures are collected (pc.is_in against the broadcast id set) —
    # candidate count is what stream mode already bounds, the corpus
    # signature table never hits the driver. The lane-equality mean runs
    # driver-side in fixed-size chunks: ~10^8 uint64 compares, far cheaper
    # than one object-store round trip of the pair table.
    cand_ids = np.unique(np.concatenate([aa, bb]))
    if cand_ids.size * 2 >= sig_ds.count():
        # candidate set ≈ corpus (dup-heavy input): a map-side filter
        # pass would keep nearly every row — skip the extra Ray stage
        # and pull the materialized signature blocks directly; the
        # searchsorted probe below ignores non-candidate rows
        sig_tab = sig_ds.to_pandas()
    else:
        cand_ids_ref = ray.put(cand_ids)

        def only_cands(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            want = pa.array(ray.get(cand_ids_ref), pa.int64())
            return t.filter(pc.is_in(t[id_col], value_set=want))

        sig_tab = sig_ds.map_batches(
            only_cands, batch_format="pyarrow"
        ).to_pandas()
    sig_ids = sig_tab[id_col].to_numpy()
    sig_mat = np.frombuffer(
        b"".join(sig_tab["sig"].tolist()), dtype=np.uint64
    ).reshape(len(sig_ids), hasher.num_perm)
    id_order = np.argsort(sig_ids)
    sig_ids_s = sig_ids[id_order]
    # uint64 lane gathers are memory-bandwidth bound (~8x slower measured);
    # a uint8 view of each lane biases per-lane agreement UP by <=1/256 —
    # the prefilter only forwards pairs, survivors are exact-verified, so
    # the bias can only add a few false survivors, never drop a true pair.
    mat8 = (sig_mat[id_order] & np.uint64(0xFF)).astype(np.uint8)
    pos_a = np.searchsorted(sig_ids_s, aa)
    pos_b = np.searchsorted(sig_ids_s, bb)
    P = hasher.num_perm
    n_screen = min(16, P)
    # stage-1 screen on 16 lanes (wider binomial spread -> wider margin:
    # threshold - 0.45), stage-2 on all lanes at threshold - 0.25; both
    # floors are >=5 sigma below a true pair's mean agreement
    floor1 = int(np.floor(n_screen * max(0.0, threshold - 0.45)))
    floor2 = int(np.floor(P * max(0.0, threshold - 0.25)))
    keep_parts = []
    for s in range(0, aa.size, 262_144):
        e = s + 262_144
        pa_c, pb_c = pos_a[s:e], pos_b[s:e]
        agree1 = (
            mat8[pa_c, :n_screen] == mat8[pb_c, :n_screen]
        ).sum(axis=1, dtype=np.int32)
        k = agree1 >= floor1
        sub_a, sub_b = pa_c[k], pb_c[k]
        agree2 = (mat8[sub_a] == mat8[sub_b]).sum(axis=1, dtype=np.int32)
        k[np.flatnonzero(k)[agree2 < floor2]] = False
        keep_parts.append(k)
    keep_mask = np.concatenate(keep_parts)
    aa, bb = aa[keep_mask], bb[keep_mask]
    t0 = _profile("minhash sig prefilter", t0)
    if aa.size == 0:
        return empty_out
    pairs_df = pd.DataFrame({"a": aa, "b": bb})

    # verify with true n-gram Jaccard, DISTRIBUTED: shingle sets computed
    # once per surviving candidate doc (broadcast id-set, each task returns
    # arrays only for its candidates), then the candidate-pair table fans
    # back out through map_batches with the shingle dict broadcast once.
    # The driver holds the candidate table and the candidate shingle dict
    # (both bounded by post-prefilter candidate count, not corpus).
    need_ref = ray.put(
        frozenset(pairs_df["a"].tolist()) | frozenset(pairs_df["b"].tolist())
    )

    def cand_shingles(t: pa.Table) -> pa.Table:
        need_set = ray.get(need_ref)
        out_id, out_sh = [], []
        for did, txt in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            if did in need_set:
                out_id.append(did)
                out_sh.append(char_shingles(txt, shingle_k))
        return pa.table(
            {id_col: pa.array(out_id, pa.int64()),
             "sh": pa.array([s.tolist() for s in out_sh],
                            pa.list_(pa.uint64()))}
        )

    shingles: dict[int, np.ndarray] = {
        r[id_col]: np.asarray(r["sh"], dtype=np.uint64)
        for r in ds.map_batches(
            cand_shingles, batch_format="pyarrow"
        ).take_all()
    }
    sh_ref = ray.put(shingles)
    no_sh = np.empty(0, np.uint64)

    def verify(batch: pa.Table) -> pa.Table:
        sh = ray.get(sh_ref)
        aa = batch["a"].to_numpy()
        bb = batch["b"].to_numpy()
        jac = np.empty(len(aa), np.float64)
        for i in range(len(aa)):
            sa = sh.get(int(aa[i]), no_sh)
            sb = sh.get(int(bb[i]), no_sh)
            if not sa.size and not sb.size:
                jac[i] = 1.0
                continue
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            jac[i] = inter / union if union else 0.0
        keep = jac >= threshold
        return pa.table({"a": pa.array(aa[keep]), "b": pa.array(bb[keep]),
                         "jaccard": pa.array(jac[keep], pa.float64())})

    t0 = _profile("minhash cand shingles", t0)
    verified = (
        rd.from_pandas(pairs_df)
        .repartition(max(1, min(64, len(pairs_df) // 20_000 + 1)))
        .map_batches(verify, batch_format="pyarrow")
        .to_pandas()
    )
    _profile("minhash verify", t0)
    if len(verified) == 0:
        return empty_out
    verified = verified.sort_values(["a", "b"], ignore_index=True)
    return pa.table({"a": pa.array(verified["a"], pa.int64()),
                     "b": pa.array(verified["b"], pa.int64()),
                     "jaccard": pa.array(verified["jaccard"], pa.float64())})


def _verify_pairs_groupby(ds, cand_ds, text_col, id_col, shingle_k, threshold):
    """Fully-distributed candidate dedup + exact-Jaccard verify (the
    'groupby' mode of :func:`minhash_lsh_pairs`): distinct pairs via the
    pair-keyed exchange, a corpus shingle sidecar written id-partitioned
    once, two merge-join attaches (shingle sets ride as uint64-packed
    binary blobs so they survive the pandas↔arrow exchanges), then a
    vectorized per-row verify. No driver-side pair table or shingle dict
    at any point; the returned true-dup set is bounded by real duplicate
    density."""
    distinct = _dedup_pairs_dataset(cand_ds)

    def all_shingles(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
        blobs = [
            char_shingles(txt, shingle_k).tobytes()
            for txt in t[text_col].to_pylist()
        ]
        return pa.table(
            {id_col: pa.array(ids, pa.int64()),
             "sh": pa.array(blobs, pa.binary())}
        )

    root = _write_vals_partitioned(
        ds.map_batches(all_shingles, batch_format="pyarrow"), id_col
    )
    pairs = _attach_from_layout(distinct, root, "a", id_col, "sh", "__sa")
    pairs = _attach_from_layout(pairs, root, "b", id_col, "sh", "__sb")

    def verify(t: pa.Table) -> pa.Table:
        aa = t["a"].to_numpy()
        bb = t["b"].to_numpy()
        sa = t["__sa"].to_pylist()
        sb = t["__sb"].to_pylist()
        jac = np.empty(len(aa), np.float64)
        for i in range(len(aa)):
            va = (np.frombuffer(sa[i], dtype=np.uint64)
                  if sa[i] else np.empty(0, np.uint64))
            vb = (np.frombuffer(sb[i], dtype=np.uint64)
                  if sb[i] else np.empty(0, np.uint64))
            if not va.size and not vb.size:
                jac[i] = 1.0
                continue
            inter = np.intersect1d(va, vb, assume_unique=True).size
            union = va.size + vb.size - inter
            jac[i] = inter / union if union else 0.0
        keep = jac >= threshold
        return pa.table(
            {"a": pa.array(aa[keep], pa.int64()),
             "b": pa.array(bb[keep], pa.int64()),
             "jaccard": pa.array(jac[keep], pa.float64())}
        )

    out = pairs.map_batches(verify, batch_format="pyarrow").to_pandas()
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    out = out.sort_values(["a", "b"], ignore_index=True)
    return pa.table(
        {"a": pa.array(out["a"], pa.int64()),
         "b": pa.array(out["b"], pa.int64()),
         "jaccard": pa.array(out["jaccard"], pa.float64())}
    )


def _ngram_jaccard_finish_groupby(cooc, id_col: str, threshold: float):
    """Distributed finish for :func:`word_ngram_jaccard_pairs` ('groupby'
    mode): pair-keyed exchange sums the per-partition (a, b, c) partials
    (pairs never split across partitions, so the partition-local sum is
    the global count), the diagonal rows become the per-doc kept-shingle
    sizes sidecar, and two merge joins attach both sizes for the final
    jaccard filter. No driver-side pair table at any dup density."""
    import shutil

    import pandas as pd

    def add_ppart(t: pa.Table) -> pa.Table:
        return t.append_column(
            "ppart",
            pa.array(_pair_part(t["a"].to_numpy(), t["b"].to_numpy(), 64)),
        )

    def sum_counts(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["a", "b"], as_index=False)["c"].sum()

    counts = (
        cooc.map_batches(add_ppart, batch_format="pyarrow")
        .groupby("ppart")
        .map_groups(sum_counts, batch_format="pandas")
    ).materialize()

    def diag_rows(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        m = a == b
        return pa.table(
            {id_col: pa.array(a[m], pa.int64()),
             "n": pa.array(t["c"].to_numpy()[m], pa.int64())}
        )

    def offdiag_rows(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        m = a != b
        return pa.table(
            {"a": pa.array(a[m], pa.int64()),
             "b": pa.array(b[m], pa.int64()),
             "c": pa.array(t["c"].to_numpy()[m], pa.int64())}
        )

    root = _write_vals_partitioned(
        counts.map_batches(diag_rows, batch_format="pyarrow"), id_col
    )
    pairs = counts.map_batches(offdiag_rows, batch_format="pyarrow")
    pairs = _attach_from_layout(pairs, root, "a", id_col, "n", "__na")
    pairs = _attach_from_layout(pairs, root, "b", id_col, "n", "__nb")

    def finish(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy().astype(np.float64)
        na = t["__na"].to_numpy().astype(np.float64)
        nb = t["__nb"].to_numpy().astype(np.float64)
        jac = c / (na + nb - c)
        keep = jac >= threshold
        return pa.table(
            {"a": pa.array(t["a"].to_numpy()[keep], pa.int64()),
             "b": pa.array(t["b"].to_numpy()[keep], pa.int64()),
             "jaccard": pa.array(jac[keep], pa.float64())}
        )

    out = pairs.map_batches(finish, batch_format="pyarrow").to_pandas()
    shutil.rmtree(root, ignore_errors=True)
    out = out.sort_values(["a", "b"], ignore_index=True)
    return pa.table(
        {"a": pa.array(out["a"], pa.int64()),
         "b": pa.array(out["b"], pa.int64()),
         "jaccard": pa.array(out["jaccard"], pa.float64())}
    )


def word_ngram_jaccard_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.6,
    df_cap: int = 64,
    mode: str = "auto",
    stream_max_rows: int = PAIR_STREAM_MAX_ROWS,
):
    """Exact word-n-gram Jaccard near-dup pairs (no sketching).

    Semantics: per doc, the DISTINCT set of word n-grams over the
    normalized non-empty token stream (same normalization as the index
    tokenizer); shingles shared by more than ``df_cap`` docs are stopword
    shingles and are excluded from BOTH the pair candidates and the
    per-doc set sizes (so Jaccard is exact over the kept-shingle
    universe). Returns (a, b, jaccard) for pairs with jaccard ≥ threshold.

    Distributed shape: map_batches(shingle+hash, distinct per doc) →
    COARSE-partitioned shingle exchange (``part = h % 64`` → ≤64
    ``map_groups`` callbacks; a per-shingle groupby would pay one Python
    callback per distinct shingle — 10^5+ of them) emitting combined
    (a, b, c) co-occurrence partials for shingle groups of size ≤ df_cap.
    Per-doc set sizes ride the same reduce as diagonal (d, d, c) rows,
    but are computed as ONE sentinel total per doc in the shingle map
    (each doc lives in one batch) plus NEGATIVE per-doc corrections for
    dropped (df > df_cap) memberships from the exchange — the earlier
    per-partition diagonal design emitted one (d, d) row per (doc,
    partition) pair, ~17M finish-exchange rows at 400k docs vs ~400k
    now. The all-to-alls move only (uint64, int64) rows; per-group pair
    fan-out is bounded by df_cap².

    ``mode``: the final pair-count reduce. 'stream' folds the partition
    partials with ONE vectorized pandas groupby on the driver (fastest at
    normal density — Ray's sort-based multi-key aggregate measures ~60x
    slower over 10^6 groups; driver state bounded by the distinct-pair
    count). 'groupby' keeps the reduce distributed: pair-keyed coarse
    exchange sums the partials per partition (pairs never split across
    partitions), the diagonal sizes become an id-partitioned sidecar, and
    two merge joins attach |A| and |B| for the jaccard filter — no
    driver-side pair table at any density. 'auto' counts the partial rows
    and picks.
    """
    import pandas as pd

    from typesense_ray.tokenizer import normalized_slot_codes

    n_parts = 64

    def shingle_rows(batch: pa.Table) -> pa.Table:
        # Vectorized shingling over the dictionary-encoded slot stream
        # (Arrow C++ tokenize+factorize for ASCII batches, see
        # ``normalized_slot_codes``): hash only the DISTINCT tokens, then
        # one FNV-style fold over the n positions of every n-gram start
        # (no per-doc set / " ".join — both were the measured hot loop).
        # The hash is deterministic per token value
        # (``pd.util.hash_array``), so shingle identity is consistent
        # across batches; 64-bit collisions are negligible at corpus
        # vocabulary sizes (same risk the string hash already had).
        empty = pa.table(
            {
                "part": pa.array([], pa.int32()),
                "h": pa.array([], pa.uint64()),
                id_col: pa.array([], pa.int64()),
            }
        )
        m = batch.num_rows
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        codes, uniq, unit_ix, _pos = normalized_slot_codes(batch[text_col])
        if codes.size == 0:
            return empty
        lens = np.bincount(unit_ix, minlength=m)
        tokh = pd.util.hash_array(np.asarray(uniq, dtype=object))
        ph = tokh[codes]
        n_starts = np.maximum(lens - (n - 1), 0)
        tot_s = int(n_starts.sum())
        if tot_s == 0:
            return empty
        doc_offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
        grp_off = np.repeat(
            np.concatenate(([0], np.cumsum(n_starts)[:-1])), n_starts
        )
        within = np.arange(tot_s, dtype=np.int64) - grp_off
        starts = np.repeat(doc_offs, n_starts) + within
        # in-place fold with one reused gather buffer — fresh numpy
        # temps here cost more in first-touch page faults than the
        # arithmetic (measured: iteration 0 of an allocate-per-step fold
        # ran 100× slower than iterations 1-2 on warm buffers)
        g = np.full(tot_s, 0xCBF29CE484222325, dtype=np.uint64)
        prime = np.uint64(0x100000001B3)
        gat = np.empty(tot_s, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for k in range(n):
                np.take(ph, starts + k, out=gat)
                np.bitwise_xor(g, gat, out=g)
                np.multiply(g, prime, out=g)
        did_s = np.repeat(ids, n_starts)
        # distinct (doc, h): ids arrive doc-grouped, so one lexsort +
        # neighbor-diff replaces the hash-table drop_duplicates
        # (~5× faster at 1.4M mostly-unique rows; downstream is an
        # order-insensitive partition exchange)
        order = np.lexsort((g, did_s))
        ds_s, g_s = did_s[order], g[order]
        keep = np.empty(len(g_s), bool)
        keep[0:1] = True
        np.not_equal(g_s[1:], g_s[:-1], out=keep[1:])
        keep[1:] |= ds_s[1:] != ds_s[:-1]
        h = g_s[keep]
        kept_ids = ds_s[keep]
        # per-doc distinct-shingle TOTALS as sentinel rows (part = -1,
        # h = count): each doc lives in exactly one batch, so this is
        # exact and costs ONE row per doc — the earlier design derived
        # per-doc sizes from diagonal (d, d) rows emitted by every
        # partition touching the doc, which multiplied the finish
        # exchange by the partition count (~17M partial rows at 400k
        # docs vs ~400k now; dropped-shingle corrections flow as
        # negative diagonals from part_cooc)
        run_start = np.empty(len(kept_ids), bool)
        run_start[0:1] = True
        np.not_equal(kept_ids[1:], kept_ids[:-1], out=run_start[1:])
        doc_u = kept_ids[run_start]
        tot = np.diff(np.r_[np.flatnonzero(run_start), len(kept_ids)])
        part = np.concatenate(
            [
                (h % np.uint64(n_parts)).astype(np.int32),
                np.full(len(doc_u), -1, np.int32),
            ]
        )
        return pa.table(
            {
                "part": pa.array(part),
                "h": pa.array(
                    np.concatenate([h, tot.astype(np.uint64)]), pa.uint64()
                ),
                id_col: pa.array(
                    np.concatenate([kept_ids, doc_u]), pa.int64()
                ),
            }
        )

    def part_cooc(g: pd.DataFrame) -> pd.DataFrame:
        # shingles never split across partitions (part = f(h)), so group
        # sizes within the partition are global df counts. Pair fan-out is
        # fully vectorized: lexsort by (h, doc), find group runs, then ONE
        # triu per DISTINCT group size (≤ df_cap sizes) over a (groups,
        # size) matrix — no per-shingle Python loop.
        if int(g["part"].iat[0]) == -1:
            # sentinel group: per-doc distinct-shingle totals computed in
            # shingle_rows — pass through as positive diagonal counts
            d = g[id_col].to_numpy()
            return pd.DataFrame(
                {"a": d, "b": d, "c": g["h"].to_numpy().astype(np.int64)}
            )
        h = g["h"].to_numpy()
        d = g[id_col].to_numpy()
        order = np.lexsort((d, h))
        h = h[order]
        d = d[order]
        _, idx_start, counts = np.unique(
            h, return_index=True, return_counts=True
        )
        keepg = counts <= df_cap
        out_a, out_b, out_c = [], [], []
        dropped = ~keepg
        if dropped.any():
            # stopword shingles (df > df_cap) are excluded from BOTH the
            # pair candidates and the per-doc set sizes: emit one
            # NEGATIVE diagonal per (doc, dropped-membership count) to
            # correct the sentinel totals — rows scale with dropped
            # memberships (≈0 on natural corpora), not with docs×parts
            dmem = d[np.repeat(dropped, counts)]
            du, dc = np.unique(dmem, return_counts=True)
            out_a.append(du)
            out_b.append(du)
            out_c.append(-dc.astype(np.int64))
        multi = keepg & (counts >= 2)
        pair_a, pair_b = [], []
        if multi.any():
            starts_m = idx_start[multi]
            counts_m = counts[multi]
            for s in np.unique(counts_m):
                sel = starts_m[counts_m == s]
                mat = d[sel[:, None] + np.arange(int(s))[None, :]]
                ia, ib = np.triu_indices(int(s), k=1)
                pair_a.append(mat[:, ia].ravel())
                pair_b.append(mat[:, ib].ravel())
        # COMBINE inside the partition: the same (a, b) pair recurs across
        # many shingles, so shipping raw co-occurrence rows to the global
        # pair-count groupby explodes the shuffle (10^7-10^8 rows at a few
        # thousand docs of repetitive text) — one vectorized count reduces
        # each partition to its distinct pairs with partial counts; the
        # pre-combined negative size corrections (out_*) append after
        if pair_a:
            aa = np.concatenate(pair_a).astype(np.int64, copy=False)
            bb = np.concatenate(pair_b).astype(np.int64, copy=False)
            if aa.min() >= 0 and max(aa.max(), bb.max()) < (1 << 31):
                # composite-uint64 count (~4× faster than the two-int-key
                # pandas groupby at 10^6 rows); ids ≥ 2^31 fall back
                key, c = np.unique(
                    (aa.astype(np.uint64) << np.uint64(32))
                    | bb.astype(np.uint64),
                    return_counts=True,
                )
                out_a.append((key >> np.uint64(32)).astype(np.int64))
                out_b.append((key & np.uint64(0xFFFFFFFF)).astype(np.int64))
                out_c.append(c.astype(np.int64))
            else:
                raw = (
                    pd.DataFrame({"a": aa, "b": bb})
                    .groupby(["a", "b"], as_index=False)
                    .size()
                )
                out_a.append(raw["a"].to_numpy())
                out_b.append(raw["b"].to_numpy())
                out_c.append(raw["size"].to_numpy(np.int64))
        if not out_a:
            return pd.DataFrame(
                {
                    "a": np.empty(0, np.int64),
                    "b": np.empty(0, np.int64),
                    "c": np.empty(0, np.int64),
                }
            )
        return pd.DataFrame(
            {
                "a": np.concatenate(out_a),
                "b": np.concatenate(out_b),
                "c": np.concatenate(out_c),
            }
        )

    import time

    t0 = time.perf_counter()
    cooc = (
        ds.map_batches(shingle_rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(part_cooc, batch_format="pandas")
    ).materialize()
    t0 = _profile("ngram shingle+cooc exchange", t0)
    n_partial = cooc.count()
    if mode == "auto":
        mode = "stream" if n_partial <= stream_max_rows else "groupby"
    if mode == "groupby":
        return _ngram_jaccard_finish_groupby(cooc, id_col, threshold)

    # 'stream': the partition partials are already combined (distinct
    # pairs + partial counts), so fold them with ONE vectorized pandas
    # groupby-sum on the driver — Ray's sort-based multi-key aggregate
    # pays per-group cost over 10^6 (a, b) groups (~60x slower measured).
    # Driver state is bounded by the distinct-pair count.
    parts = list(cooc.iter_batches(batch_format="pandas", batch_size=None))
    if parts:
        from typesense_ray.agg import fold_grouped

        allp = pd.concat(parts, ignore_index=True)
        counts = fold_grouped(allp, ["a", "b"], {"c": "sum"}).rename(
            columns={"c": "count()"}
        )
    else:
        counts = pd.DataFrame({"a": [], "b": [], "count()": []})
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
    _profile("ngram stream fold", t0)
    return pa.table(
        {
            "a": pa.array(pairs["a"], pa.int64()),
            "b": pa.array(pairs["b"], pa.int64()),
            "jaccard": pa.array(pairs["jaccard"], pa.float64()),
        }
    )


# -- simhash ----------------------------------------------------------------

# _BIT_SPREAD_LUT[b] = uint64 whose byte lane j holds bit j of byte b —
# lets a (tokens, 8-byte) hash matrix be segment-summed as 8 uint64 lanes
# per token instead of 64 upcast uint8 columns (np.add.reduceat runs 6×
# faster on 8× fewer elements with no int64 upcast; see
# _segment_bit_counts)
_BIT_SPREAD_LUT = np.zeros(256, np.uint64)
for _b in range(256):
    _v = 0
    for _j in range(8):
        _v |= ((_b >> _j) & 1) << (8 * _j)
    _BIT_SPREAD_LUT[_b] = np.uint64(_v)
del _b, _v, _j


def _segment_bit_counts(
    h: np.ndarray, starts: np.ndarray, seg_lens: np.ndarray
) -> np.ndarray:
    """Per-segment count of set bits per bit position over a uint64 hash
    stream: returns (n_segments, 64) int64 where cell (s, j) = number of
    hashes in segment s with bit j set. SWAR packed-lane accumulation:
    each hash byte spreads to a uint64 of eight 0/1 byte lanes
    (``_BIT_SPREAD_LUT``), one native-uint64 ``np.add.reduceat`` sums the
    lanes per segment, and the lane bytes are read back out. Byte lanes
    saturate at 255, so segments longer than 255 hashes are split into
    sub-segments and re-folded in int64. Little-endian host assumed
    (same contract as the callers' uint64↔uint8 views)."""
    hb = h.view(np.uint8).reshape(-1, 8)
    spread = _BIT_SPREAD_LUT[hb]  # (T, 8) uint64, byte lanes 0/1
    MAXSEG = 255
    nsplit = (seg_lens - 1) // MAXSEG
    if len(seg_lens) == 0:
        return np.zeros((0, 64), np.int64)
    if nsplit.max() == 0:
        acc = np.add.reduceat(spread, starts, axis=0)
        return acc.view(np.uint8).reshape(len(starts), 64).astype(np.int64)
    pieces = nsplit + 1
    sub_owner = np.repeat(np.arange(len(seg_lens)), pieces)
    offs = np.concatenate([np.arange(p) * MAXSEG for p in pieces])
    sub_starts = np.repeat(starts, pieces) + offs
    acc = np.add.reduceat(spread, sub_starts, axis=0)
    lanes = acc.view(np.uint8).reshape(len(sub_starts), 64)
    ones = np.zeros((len(seg_lens), 64), np.int64)
    np.add.at(ones, sub_owner, lanes)
    return ones


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (term-frequency weighted) —
    scalar reference; the batch kernel is :func:`simhash_batch`."""
    out = simhash_batch([text])
    return int(out[0])


def simhash_batch(texts: list[str | None]) -> np.ndarray:
    """Vectorized SimHash for a whole batch: factorize all tokens once,
    hash only the DISTINCT tokens, and segment-count set bits per doc
    with the SWAR packed-lane fold (:func:`_segment_bit_counts` — 6×
    faster than the earlier (tokens, 64)-uint8 ``np.unpackbits`` +
    int64-upcast ``reduceat``, which itself replaced an unbuffered
    ``np.add.at`` scatter; bit-identical output throughout). The per-doc
    bit is ``2·ones > n_tokens`` (⇔ the classic ±1 accumulator > 0).
    The uint64 → uint8 ``view``s assume a little-endian host."""
    import pandas as pd

    n = len(texts)
    tok_lists = [(t or "").lower().split() for t in texts]
    lens = np.fromiter(map(len, tok_lists), dtype=np.int64, count=n)
    total = int(lens.sum())
    if total == 0:
        return np.zeros(n, dtype=np.uint64)
    from itertools import chain

    flat = np.fromiter(chain.from_iterable(tok_lists), dtype=object,
                       count=total)
    codes, uniq = pd.factorize(flat)
    tok_h = np.fromiter(
        (_hash64_bytes(t) for t in uniq), dtype=np.uint64, count=len(uniq)
    )
    h = np.ascontiguousarray(tok_h[codes])
    nz = lens > 0
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))[nz]
    ones = _segment_bit_counts(h, starts, lens[nz])
    out_bits = (2 * ones) > lens[nz, None]
    packed = np.packbits(out_bits.astype(np.uint8), axis=1,
                         bitorder="little")
    out = np.zeros(n, dtype=np.uint64)
    out[nz] = packed.view(np.uint64).ravel()
    return out


def simhash_arrow(col) -> np.ndarray:
    """Arrow-native SimHash over a string column — bit-identical to
    ``simhash_batch(col.to_pylist())`` but ~7× faster on ASCII text:
    lowering, whitespace split and token factorization all stay in
    Arrow C++ (``ascii_lower`` → ``utf8_split_whitespace`` →
    ``dictionary_encode``), so per-occurrence Python string objects are
    never materialized and only the DISTINCT tokens cross into Python
    for hashing (the host is DRAM-bandwidth-bound at full concurrency —
    see BASELINE.md — so cutting allocated bytes is the lever here).

    ``utf8_lower`` diverges from ``str.lower`` on a few codepoints
    (Turkish İ, Greek final sigma), so non-ASCII rows take the scalar
    kernel and are scattered back — the function's output equals
    ``simhash_batch`` on EVERY input, not just ASCII."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    col = pc.fill_null(col, "")
    ascii_mask = pc.string_is_ascii(col).to_numpy(zero_copy_only=False)
    out = np.zeros(n, dtype=np.uint64)
    if not ascii_mask.all():
        rows = np.flatnonzero(~ascii_mask)
        py = col.take(pa.array(rows)).to_pylist()
        out[rows] = simhash_batch(py)
        if not ascii_mask.any():
            return out
        col = col.filter(pa.array(ascii_mask))
        idx = np.flatnonzero(ascii_mask)
    else:
        idx = None
    m = len(col)
    # utf8_split_whitespace ≡ str.split() on EVERY ASCII char (probed
    # 0x00-0x7F), where RE2's \s+ missed \x0b and \x1c-\x1f — so this is
    # both 2.9x faster than split_pattern_regex and closer to the
    # simhash_batch contract; affix empties still come out of the filter
    toks = pc.utf8_split_whitespace(pc.ascii_lower(col))
    flat = pc.list_flatten(toks)
    lens_all = pc.list_value_length(toks).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    doc_ix = np.repeat(np.arange(m, dtype=np.int64), lens_all)
    keep_arr = pc.not_equal(flat, "")  # regex split keeps affix empties
    doc_ix = doc_ix[keep_arr.to_numpy(zero_copy_only=False)]
    flat = flat.filter(keep_arr)
    denc = pc.dictionary_encode(flat)
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = denc.dictionary.to_pylist()
    tok_h = np.fromiter(
        (_hash64_bytes(t) for t in uniq), dtype=np.uint64, count=len(uniq)
    )
    h = np.ascontiguousarray(tok_h[codes])
    lens = np.bincount(doc_ix, minlength=m)
    nz = lens > 0
    sub = np.zeros(m, dtype=np.uint64)
    if nz.any():
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))[nz]
        ones = _segment_bit_counts(h, starts, lens[nz])
        out_bits = (2 * ones) > lens[nz, None]
        packed = np.packbits(out_bits.astype(np.uint8), axis=1,
                             bitorder="little")
        sub[nz] = packed.view(np.uint64).ravel()
    if idx is None:
        return sub
    out[idx] = sub
    return out


def simhash_groups(
    ds, text_col: str = "text", id_col: str = "doc_id", n_parts: int = 64
):
    """Exact-simhash grouping (hamming-0): map_batches(simhash) → ONE
    coarse ``simhash % n_parts`` exchange → vectorized within-partition
    run detection (lexsort + unique-run counts, no per-key callback).
    A groupby over the raw simhash would mean one Ray sort over
    corpus-cardinality keys plus one Python callback per DISTINCT hash —
    minutes at 10⁶+ keys; the coarse exchange is the same shape as
    ``simhash_near_pairs``/``minhash_lsh_pairs``. Emits groups with >1
    member. For hamming ≤ d, use :func:`simhash_near_pairs`."""
    import pandas as pd

    def add_sim(batch: pa.Table) -> pa.Table:
        sims = simhash_arrow(batch[text_col])
        return pa.table(
            {
                "part": pa.array(
                    (sims % np.uint64(n_parts)).astype(np.int32)
                ),
                id_col: batch[id_col],
                "simhash": pa.array(sims, pa.uint64()),
            }
        )

    def part_groups(g: pd.DataFrame) -> pd.DataFrame:
        sims = g["simhash"].to_numpy(dtype=np.uint64)
        ids = g[id_col].to_numpy(dtype=np.int64)
        order = np.lexsort((ids, sims))
        s = sims[order]
        d = ids[order]
        _, counts = np.unique(s, return_counts=True)
        sizes = np.repeat(counts, counts)  # aligns: s is sorted
        keep = sizes >= 2
        return pd.DataFrame(
            {
                id_col: d[keep],
                "simhash": s[keep],
                "group_size": sizes[keep].astype(np.int64),
            }
        )

    return (
        ds.map_batches(add_sim, batch_format="pyarrow")
        .groupby("part")
        .map_groups(part_groups, batch_format="pandas")
    )


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR)."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
        x = (x & np.uint64(0x3333333333333333)) + (
            (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
        )
        x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


def simhash_near_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n_parts: int = 64,
    mode: str = "auto",
    stream_max_rows: int = PAIR_STREAM_MAX_ROWS,
) -> pa.Table:
    """SimHash near-dup pairs within Hamming distance ``max_hamming``:
    split the 64 bits into ``max_hamming + 1`` bands (pigeonhole — two
    hashes within distance d agree on at least one of d+1 bands), bucket
    each band through the coarse-partitioned groupby (same shape as
    minhash LSH), then verify exact ``popcount(a ^ b) ≤ d`` on the
    candidate pairs (vectorized SWAR popcount). 100% recall by
    construction — LSH banding here is exact, not probabilistic.

    ``mode`` as in :func:`minhash_lsh_pairs`: 'stream' verifies on the
    driver with a broadcast id→simhash dict; 'groupby' keeps pairs a
    Dataset (pair-keyed distinct + two merge joins against an
    id-partitioned simhash sidecar); 'auto' counts candidates and picks."""
    import pandas as pd
    import ray

    bands = max_hamming + 1
    bits = 64 // bands
    shifts = [np.uint64(b * bits) for b in range(bands)]
    mask = np.uint64((1 << bits) - 1)

    def to_bands(batch: pa.Table) -> pa.Table:
        sims = simhash_arrow(batch[text_col])
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        # band key mixes the band index above the band's bits so buckets
        # from different bands never collide
        keys = np.concatenate(
            [
                ((sims >> sh) & mask) | np.uint64(b + 1) << np.uint64(48)
                for b, sh in enumerate(shifts)
            ]
        )
        return pa.table(
            {
                "part": pa.array((keys % np.uint64(n_parts)).astype(np.int32)),
                "band_hash": pa.array(keys, pa.uint64()),
                id_col: pa.array(np.tile(ids, bands)),
            }
        )

    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        a, b = _bucket_pairs(
            g["band_hash"].to_numpy(), g[id_col].to_numpy()
        )
        return pd.DataFrame({"a": a, "b": b})

    cand_ds = (
        ds.map_batches(to_bands, batch_format="pyarrow")
        .groupby("part")
        .map_groups(part_pairs, batch_format="pandas")
    ).materialize()
    n_cand = cand_ds.count()
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "hamming": pa.array([], pa.int64())})
    if n_cand == 0:
        return empty
    if mode == "auto":
        mode = "stream" if n_cand <= stream_max_rows else "groupby"

    if mode == "groupby":
        distinct = _dedup_pairs_dataset(cand_ds)

        def all_sims(t: pa.Table) -> pa.Table:
            sims = simhash_arrow(t[text_col])
            return pa.table(
                {id_col: pa.array(
                    np.asarray(t[id_col].to_pylist(), dtype=np.int64)),
                 "simhash": pa.array(sims, pa.uint64())}
            )

        root = _write_vals_partitioned(
            ds.map_batches(all_sims, batch_format="pyarrow"), id_col
        )
        withv = _attach_from_layout(distinct, root, "a", id_col,
                                    "simhash", "__ha")
        withv = _attach_from_layout(withv, root, "b", id_col,
                                    "simhash", "__hb")

        def verify(t: pa.Table) -> pa.Table:
            aa = t["a"].to_numpy()
            bb = t["b"].to_numpy()
            ha = t["__ha"].to_numpy().astype(np.uint64)
            hb = t["__hb"].to_numpy().astype(np.uint64)
            ham = _popcount64(ha ^ hb).astype(np.int64)
            keep = ham <= max_hamming
            return pa.table(
                {"a": pa.array(aa[keep], pa.int64()),
                 "b": pa.array(bb[keep], pa.int64()),
                 "hamming": pa.array(ham[keep], pa.int64())}
            )

        out = withv.map_batches(verify, batch_format="pyarrow").to_pandas()
        import shutil

        shutil.rmtree(root, ignore_errors=True)
        out = out.sort_values(["a", "b"], ignore_index=True)
        return pa.table(
            {"a": pa.array(out["a"], pa.int64()),
             "b": pa.array(out["b"], pa.int64()),
             "hamming": pa.array(out["hamming"], pa.int64())}
        )

    pairs = cand_ds.to_pandas().astype(np.int64)
    aa0 = pairs["a"].to_numpy()
    bb0 = pairs["b"].to_numpy()
    if aa0.size and max(aa0.max(), bb0.max()) < (1 << 31) and aa0.min() >= 0:
        # packed single-key unique: ~3x faster than a two-column
        # drop_duplicates at 10^6 pairs (same trick as minhash)
        key = np.unique(
            (aa0.astype(np.uint64) << np.uint64(32)) | bb0.astype(np.uint64)
        )
        pairs = pd.DataFrame(
            {"a": (key >> np.uint64(32)).astype(np.int64),
             "b": (key & np.uint64(0xFFFFFFFF)).astype(np.int64)}
        )
    else:
        pairs = pairs.drop_duplicates(ignore_index=True)

    need_ref = ray.put(
        frozenset(pairs["a"].tolist()) | frozenset(pairs["b"].tolist())
    )

    def cand_sims(t: pa.Table) -> pa.Table:
        need = ray.get(need_ref)
        ids = t[id_col].to_pylist()
        keep = [i for i, d in enumerate(ids) if d in need]
        sims = simhash_arrow(t[text_col].take(pa.array(keep, pa.int64())))
        return pa.table(
            {id_col: pa.array([ids[i] for i in keep], pa.int64()),
             "simhash": pa.array(sims, pa.uint64())}
        )

    sim_of = {
        r[id_col]: np.uint64(r["simhash"])
        for r in ds.map_batches(cand_sims, batch_format="pyarrow").take_all()
    }
    a = pairs["a"].to_numpy()
    b = pairs["b"].to_numpy()
    sa = np.array([sim_of[x] for x in a], dtype=np.uint64)
    sb = np.array([sim_of[x] for x in b], dtype=np.uint64)
    ham = _popcount64(sa ^ sb).astype(np.int64)
    keep = ham <= max_hamming
    order = np.lexsort((b[keep], a[keep]))
    return pa.table(
        {"a": pa.array(a[keep][order], pa.int64()),
         "b": pa.array(b[keep][order], pa.int64()),
         "hamming": pa.array(ham[keep][order], pa.int64())}
    )


# -- embedding near-dup ------------------------------------------------------


def embedding_dup_pairs(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int | None = None,
    seed: int = 7,
    seeds: list[int] | None = None,
    tile: int = 4096,
    n_parts: int = 256,
):
    """Embedding-cosine near-dup: random-hyperplane LSH bucket → within-
    bucket exact pairwise cosine (tiled matmul + a vectorized threshold
    scan) → pairs ≥ threshold.

    Recall knobs:
      * ``seeds=[s1, s2, ...]`` runs the bucket→verify pass once per plane
        seed and unions the (exactly-verified) pair sets — two vectors
        with cosine ≥ 0.95 collide under ONE 8-plane seed with probability
        (1 - θ/π)^8 ≈ 0.43, under the union of two independent seeds
        ≈ 0.67, three ≈ 0.81. The union is deduped by a pair-keyed coarse
        exchange (pairs never split across partitions), never on the
        driver. ``seeds`` overrides ``seed``; default is the single
        ``seed`` (the sparse-duplicate fast path).
      * ``n_planes=None`` adapts the signature width to the corpus:
        ceil(log2(n_rows / 1024)) planes clamped to [8, 20], so expected
        bucket occupancy stays ~1k and bucket count (shuffle width) grows
        with the corpus instead of being capped at 2^8.

    Execution shape: buckets are exchanged by ``bucket % n_parts`` (ONE
    coarse shuffle of ≤``n_parts`` partitions, not one Ray group per
    distinct signature); within a partition the per-bucket runs are found
    by ONE lexsort and each bucket gets the tiled matmul scan. The tile
    keeps peak memory O(tile²) regardless of bucket size — a
    near-duplicate-heavy corpus collapses into ONE hyperplane bucket
    (identical vectors agree on every extra plane too, so re-bucketing
    cannot split them), and the full n×n similarity matrix there would
    OOM the worker. Compute stays O(b²) — inherent to exact verification;
    the output itself is the bound."""
    import pandas as pd

    from typesense_ray.functions.similarity import vecs_to_numpy

    if n_planes is None:
        n = ds.count()
        n_planes = int(min(20, max(8, np.ceil(np.log2(max(n, 2) / 1024.0)))))
    plane_seeds = list(seeds) if seeds else [seed]
    n_parts_eff = int(min(1 << n_planes, n_parts))
    weights = (np.uint64(1) << np.arange(n_planes, dtype=np.uint64))

    def add_sig(batch: pa.Table, plane_seed: int) -> pa.Table:
        vecs = vecs_to_numpy(batch[vec_col])
        rng = np.random.default_rng(plane_seed)
        planes = rng.standard_normal((vecs.shape[1], n_planes))
        sig = (vecs @ planes > 0).astype(np.uint64)
        packed = (sig @ weights).astype(np.int64)
        return pa.table(
            {id_col: batch[id_col], "bucket": pa.array(packed),
             "cpart": pa.array((packed % n_parts_eff).astype(np.int32)),
             vec_col: batch[vec_col]}
        )

    def scan_bucket(ids: np.ndarray, vn: np.ndarray, out_a, out_b, out_s):
        m = len(ids)
        for i0 in range(0, m, tile):
            vi = vn[i0 : i0 + tile]
            for j0 in range(i0, m, tile):
                sim = vi @ vn[j0 : j0 + tile].T
                if i0 == j0:
                    iu, ju = np.triu_indices(
                        sim.shape[0], k=1, m=sim.shape[1]
                    )
                    vals = sim[iu, ju]
                    keep = vals >= threshold
                    out_a.append(ids[i0 + iu[keep]])
                    out_b.append(ids[j0 + ju[keep]])
                    out_s.append(vals[keep])
                else:
                    ii, jj = np.nonzero(sim >= threshold)
                    out_a.append(ids[i0 + ii])
                    out_b.append(ids[j0 + jj])
                    out_s.append(sim[ii, jj])

    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"a": pd.Series([], dtype=np.int64),
             "b": pd.Series([], dtype=np.int64),
             "cosine": pd.Series([], dtype=np.float64)}
        )
        if len(g) < 2:
            return empty
        g = g.sort_values(["bucket", id_col], ignore_index=True)
        buckets = g["bucket"].to_numpy()
        ids_all = g[id_col].to_numpy()
        v = np.array(g[vec_col].tolist(), dtype=np.float64)
        norm = np.linalg.norm(v, axis=1, keepdims=True)
        norm[norm == 0] = 1.0
        vn_all = v / norm
        _, starts, counts = np.unique(
            buckets, return_index=True, return_counts=True
        )
        out_a, out_b, out_s = [], [], []
        for s, c in zip(starts[counts >= 2], counts[counts >= 2]):
            scan_bucket(
                ids_all[s : s + c], vn_all[s : s + c], out_a, out_b, out_s
            )
        if not out_a:
            return empty
        return pd.DataFrame(
            {"a": np.concatenate(out_a).astype(np.int64),
             "b": np.concatenate(out_b).astype(np.int64),
             "cosine": np.concatenate(out_s).astype(np.float64)}
        )

    def pairs_for_seed(plane_seed: int):
        return (
            ds.map_batches(
                lambda b, s=plane_seed: add_sig(b, s),
                batch_format="pyarrow",
            )
            .groupby("cpart")
            .map_groups(part_pairs, batch_format="pandas")
        )

    out = pairs_for_seed(plane_seeds[0])
    if len(plane_seeds) == 1:
        return out
    for s in plane_seeds[1:]:
        out = out.union(pairs_for_seed(s))

    def add_ppart(t: pa.Table) -> pa.Table:
        return t.append_column(
            "ppart",
            pa.array(_pair_part(t["a"].to_numpy(), t["b"].to_numpy(), 64)),
        )

    def drop_dup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"], ignore_index=True)[
            ["a", "b", "cosine"]
        ]

    return (
        out.map_batches(add_ppart, batch_format="pyarrow")
        .groupby("ppart")
        .map_groups(drop_dup, batch_format="pandas")
    )
