"""Index build: corpus Dataset → durable Parquet posting segments.

Ray-Data-first rendition of the reference's import/index path
(``src/collection.cpp:240-305`` → ``src/index.cpp:429-507``): where the
reference hash-routes docs to in-RAM shard threads
(``seq_id % num_memory_shards``, ``src/collection.cpp:290``), this engine
is partition-parallel over the input Parquet — each batch becomes one
immutable, content-addressed *segment* (term dictionary + delta+varbyte
postings + block-max skip metadata + docs sidecar), written atomically
with a manifest for checkpoint-resume.

Scale notes (the design target is ~10^12 files on a multi-node cluster):

- There is **no all-to-all posting shuffle**: postings stay segment-local
  (Lucene-style), so hot-term skew ("the", "import") cannot concentrate
  one term's global postings in a single task. The only wide operation is
  the global document-frequency aggregate — a ``groupby("term")`` over
  tiny ``(term, df)`` rows (one per term per segment).
- Stateful work (tokenizer tables, codec buffers) lives in a
  ``SegmentWriter`` **actor pool** (``map_batches(cls, concurrency=N)``);
  setup happens once per actor, not per batch.
- Segments are resumable: the segment id is a content hash of its sorted
  doc ids + config; a rerun skips segments whose manifest already exists.
- Doc ids are *derived from data* (64-bit blake2b of ``(repo, path)``),
  not a serial counter like the reference's ``next_seq_id``
  (``src/collection.cpp:102-171``) — deterministic under any parallelism.
  At 10^12 docs, switch ``id_bits=128`` (collision-safe) or assign ids by
  global rank in a dedicated sort pass.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field, asdict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from typesense_ray.codec import (
    BLOCK_SIZE,
    block_max_meta,
    encode_positions,
    varbyte_encode,
    delta_encode,
)
from typesense_ray.tokenizer import doc_term_positions


@dataclass(frozen=True)
class IndexConfig:
    text_field: str = "content"
    id_fields: tuple[str, ...] = ("repo", "path")  # hashed → doc_id
    id_field: str | None = None  # explicit int64 id column (overrides id_fields)
    meta_fields: tuple[str, ...] = ()  # carried into segment docs table
    sha_field: str | None = "sha256"  # verified per row when present
    verify_sha: bool = True
    batch_docs: int = 4096  # docs per segment
    block_size: int = BLOCK_SIZE
    k1: float = 1.2
    b: float = 0.75

    def fingerprint(self) -> str:
        blob = json.dumps(asdict(self), sort_keys=True).encode()
        return hashlib.blake2b(blob, digest_size=8).hexdigest()


def doc_id_from_key(repo: str, path: str) -> int:
    h = hashlib.blake2b(f"{repo}\0{path}".encode("utf-8"), digest_size=8)
    return int.from_bytes(h.digest(), "big") & 0x7FFFFFFFFFFFFFFF


DOCS_FILE = "docs.parquet"
POSTINGS_FILE = "postings.parquet"
MANIFEST_FILE = "manifest.json"


class SegmentWriter:
    """Actor-pool stage: one input batch → one durable index segment.

    ``__init__`` runs once per actor (state setup); ``__call__`` runs per
    batch and returns a one-row manifest table (the stage's output
    dataset is the build's lineage/metrics log).
    """

    def __init__(self, out_dir: str, cfg: IndexConfig):
        self.out_dir = out_dir
        self.cfg = cfg
        self.seg_root = os.path.join(out_dir, "segments")
        os.makedirs(self.seg_root, exist_ok=True)

    # -- helpers -----------------------------------------------------------

    def _doc_ids(self, batch: pa.Table) -> np.ndarray:
        cfg = self.cfg
        if cfg.id_field:
            ids = batch[cfg.id_field].to_numpy()
            if ids.min() < 0:
                raise ValueError("id_field values must be non-negative")
            return ids.astype(np.uint64)
        cols = [batch[f].to_pylist() for f in cfg.id_fields]
        return np.array(
            [doc_id_from_key(*key) for key in zip(*cols)], dtype=np.uint64
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        cfg = self.cfg
        n = batch.num_rows
        if n == 0:
            return _manifest_schema_empty()

        doc_ids = self._doc_ids(batch)
        order = np.argsort(doc_ids, kind="stable")
        doc_ids = doc_ids[order]
        if n > 1 and (doc_ids[1:] == doc_ids[:-1]).any():
            dup = doc_ids[1:][doc_ids[1:] == doc_ids[:-1]][0]
            raise ValueError(f"duplicate doc_id {dup} within segment batch")

        batch = batch.take(pa.array(order))
        texts = batch[cfg.text_field].to_pylist()

        # per-row invariant: sha256(content) must match the carried column
        # (BASELINE.json input_hint) — recomputed, not trusted.
        shas = None
        if cfg.sha_field and cfg.sha_field in batch.column_names:
            shas = batch[cfg.sha_field].to_pylist()
            if cfg.verify_sha:
                for i, (t, s) in enumerate(zip(texts, shas)):
                    h = hashlib.sha256((t or "").encode("utf-8")).hexdigest()
                    if h != s:
                        raise ValueError(
                            f"sha256 invariant violated at row {i}: {h} != {s}"
                        )
        else:
            shas = [
                hashlib.sha256((t or "").encode("utf-8")).hexdigest() for t in texts
            ]

        t_sha = time.perf_counter()

        # tokenize → per-term postings accumulators (term → [ids], [tfs], [pos])
        doclens = np.zeros(n, dtype=np.int32)
        acc: dict[str, tuple[list[int], list[int], list[list[int]]]] = {}
        for local_id, text in enumerate(texts):
            if not text:
                continue
            d, doclen = doc_term_positions(text)
            doclens[local_id] = doclen
            for term, positions in d.items():
                try:
                    e = acc[term]
                except KeyError:
                    e = acc[term] = ([], [], [])
                e[0].append(local_id)
                e[1].append(len(positions))
                e[2].append(positions)
        t_tok = time.perf_counter()

        # encode postings (terms sorted for deterministic output + binary
        # searchable term dictionary)
        terms = sorted(acc.keys())
        n_terms = len(terms)
        col_term: list[str] = []
        col_df = np.empty(n_terms, np.int32)
        col_cf = np.empty(n_terms, np.int64)
        col_maxtf = np.empty(n_terms, np.int32)
        col_ids: list[bytes] = []
        col_tfs: list[bytes] = []
        col_pos: list[bytes] = []
        col_bm_last: list[list[int]] = []
        col_bm_maxtf: list[list[int]] = []
        col_bm_mindl: list[list[int]] = []
        n_postings = 0
        for ti, term in enumerate(terms):
            ids_l, tfs_l, pos_l = acc[term]
            ids = np.asarray(ids_l, dtype=np.uint64)  # ascending (insertion order)
            tfs = np.asarray(tfs_l, dtype=np.int64)
            pos = np.asarray([p for ps in pos_l for p in ps], dtype=np.uint64)
            col_term.append(term)
            col_df[ti] = len(ids)
            col_cf[ti] = int(tfs.sum())
            col_maxtf[ti] = int(tfs.max())
            col_ids.append(varbyte_encode(delta_encode(ids)))
            col_tfs.append(varbyte_encode(tfs.astype(np.uint64)))
            col_pos.append(encode_positions(pos, tfs))
            last, max_tf, min_dl = block_max_meta(
                ids, tfs, doclens[ids.astype(np.int64)], cfg.block_size
            )
            col_bm_last.append([int(x) for x in last])
            col_bm_maxtf.append([int(x) for x in max_tf])
            col_bm_mindl.append([int(x) for x in min_dl])
            n_postings += len(ids)
        t_enc = time.perf_counter()

        postings = pa.table(
            {
                "term": pa.array(col_term, pa.string()),
                "df": pa.array(col_df),
                "cf": pa.array(col_cf),
                "max_tf": pa.array(col_maxtf),
                "ids_vb": pa.array(col_ids, pa.binary()),
                "tfs_vb": pa.array(col_tfs, pa.binary()),
                "pos_vb": pa.array(col_pos, pa.binary()),
                "bm_last": pa.array(col_bm_last, pa.list_(pa.int32())),
                "bm_max_tf": pa.array(col_bm_maxtf, pa.list_(pa.int32())),
                "bm_min_dl": pa.array(col_bm_mindl, pa.list_(pa.int32())),
            }
        )

        docs_cols: dict[str, pa.Array] = {
            "doc_id": pa.array(doc_ids, pa.uint64()),
            "doclen": pa.array(doclens, pa.int32()),
            "sha256": pa.array(shas, pa.string()),
        }
        for f in self.cfg.meta_fields:
            if f in batch.column_names and f not in docs_cols:
                docs_cols[f] = batch[f]
        docs = pa.table(docs_cols)

        # content-addressed segment id → idempotent, resumable writes
        seg_hash = hashlib.blake2b(digest_size=8)
        seg_hash.update(doc_ids.tobytes())
        seg_hash.update(self.cfg.fingerprint().encode())
        seg_id = seg_hash.hexdigest()
        seg_dir = os.path.join(self.seg_root, f"seg-{seg_id}")

        corpus_fingerprint = hashlib.blake2b(
            "".join(sorted(shas)).encode(), digest_size=16
        ).hexdigest()

        skipped = False
        if os.path.exists(os.path.join(seg_dir, MANIFEST_FILE)):
            skipped = True  # checkpoint-resume: segment already complete
        else:
            tmp_dir = f"{seg_dir}.tmp-{os.getpid()}"
            os.makedirs(tmp_dir, exist_ok=True)
            pq.write_table(postings, os.path.join(tmp_dir, POSTINGS_FILE))
            pq.write_table(docs, os.path.join(tmp_dir, DOCS_FILE))
            manifest = {
                "segment_id": seg_id,
                "n_docs": int(n),
                "n_terms": int(n_terms),
                "n_postings": int(n_postings),
                "doclen_sum": int(doclens.sum()),
                "corpus_fingerprint": corpus_fingerprint,
                "config_fingerprint": self.cfg.fingerprint(),
                "files": [POSTINGS_FILE, DOCS_FILE],
                "metrics": {
                    "sha_verify_s": round(t_sha - t0, 4),
                    "tokenize_s": round(t_tok - t_sha, 4),
                    "encode_s": round(t_enc - t_tok, 4),
                },
            }
            with open(os.path.join(tmp_dir, MANIFEST_FILE), "w") as f:
                json.dump(manifest, f)
            try:
                os.rename(tmp_dir, seg_dir)
            except OSError:
                # another (retried) task completed this segment first
                import shutil

                shutil.rmtree(tmp_dir, ignore_errors=True)
                skipped = True

        wall = time.perf_counter() - t0
        return pa.table(
            {
                "segment_id": [seg_id],
                "n_docs": [int(n)],
                "n_terms": [int(n_terms)],
                "n_postings": [int(n_postings)],
                "doclen_sum": [int(doclens.sum())],
                "corpus_fingerprint": [corpus_fingerprint],
                "skipped": [skipped],
                "build_s": [round(wall, 4)],
                "docs_per_s": [round(n / wall, 2)],
            }
        )


def _manifest_schema_empty() -> pa.Table:
    return pa.table(
        {
            "segment_id": pa.array([], pa.string()),
            "n_docs": pa.array([], pa.int64()),
            "n_terms": pa.array([], pa.int64()),
            "n_postings": pa.array([], pa.int64()),
            "doclen_sum": pa.array([], pa.int64()),
            "corpus_fingerprint": pa.array([], pa.string()),
            "skipped": pa.array([], pa.bool_()),
            "build_s": pa.array([], pa.float64()),
            "docs_per_s": pa.array([], pa.float64()),
        }
    )


def build_index(
    source,
    out_dir: str,
    cfg: IndexConfig = IndexConfig(),
    *,
    concurrency: int | None = None,
) -> dict:
    """Build a full index from a corpus Dataset (or parquet path).

    Pipeline: ``read_parquet(columns=pruned)`` → ``map_batches(SegmentWriter,
    batch_format="pyarrow", concurrency=N)`` (streaming, backpressured) →
    manifest rows (small) → global-stats aggregation:
    ``read segment (term, df) → groupby("term").sum`` — the build's only
    shuffle — written to ``global/df.parquet``.

    Returns the index manifest (also written to ``<out_dir>/manifest.json``).
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    t0 = time.perf_counter()
    if isinstance(source, str):
        cols = list(
            dict.fromkeys(
                [cfg.text_field]
                + ([cfg.id_field] if cfg.id_field else list(cfg.id_fields))
                + ([cfg.sha_field] if cfg.sha_field else [])
                + list(cfg.meta_fields)
            )
        )
        ds = rd.read_parquet(source, columns=cols)
    else:
        ds = source

    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 1)

    # In-memory sources (from_arrow/from_pandas) arrive as a single block,
    # which would serialize the SegmentWriter pool; split them. Parquet
    # reads already come in many blocks.
    try:
        nb = ds.num_blocks()
    except Exception:
        nb = None
    if nb is not None and nb < concurrency:
        ds = ds.repartition(concurrency)

    manifests = ds.map_batches(
        SegmentWriter(out_dir, cfg),
        batch_format="pyarrow",
        batch_size=cfg.batch_docs,
        concurrency=concurrency,
        num_cpus=1,
    ).take_all()
    t_seg = time.perf_counter()

    seg_ids = [m["segment_id"] for m in manifests]
    n_docs = int(sum(m["n_docs"] for m in manifests))
    doclen_sum = int(sum(m["doclen_sum"] for m in manifests))

    # global document frequencies — the only wide shuffle; rows are tiny
    # (term, df) pairs, one per term per segment.
    seg_postings = [
        os.path.join(out_dir, "segments", f"seg-{sid}", POSTINGS_FILE)
        for sid in seg_ids
    ]
    df_dir = os.path.join(out_dir, "global", "df")
    import shutil

    shutil.rmtree(df_dir, ignore_errors=True)
    (
        rd.read_parquet(seg_postings, columns=["term", "df"])
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
        .write_parquet(df_dir)
    )
    t_df = time.perf_counter()

    stats = {
        "n_docs": n_docs,
        "doclen_sum": doclen_sum,
        "avgdl": (doclen_sum / n_docs) if n_docs else 0.0,
        "n_segments": len(seg_ids),
        "n_postings": int(sum(m["n_postings"] for m in manifests)),
        "k1": cfg.k1,
        "b": cfg.b,
        "config": asdict(cfg),
        "segments": seg_ids,
        "segments_skipped": int(sum(1 for m in manifests if m["skipped"])),
        "timings": {
            "segments_s": round(t_seg - t0, 3),
            "global_df_s": round(t_df - t_seg, 3),
            "total_s": round(t_df - t0, 3),
        },
        "docs_per_s": round(n_docs / (t_df - t0), 1) if n_docs else 0.0,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(stats, f, indent=1)
    return stats
