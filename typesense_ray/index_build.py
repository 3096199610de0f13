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

from typesense_ray.codec import BLOCK_SIZE, slice_encoded, varbyte_encode_raw
from typesense_ray.tokenizer import doc_term_positions  # noqa: F401 (public re-export)


@dataclass(frozen=True)
class IndexConfig:
    text_field: str = "content"
    id_fields: tuple[str, ...] = ("repo", "path")  # hashed → doc_id
    id_field: str | None = None  # explicit int64 id column (overrides id_fields)
    meta_fields: tuple[str, ...] = ()  # carried into segment docs table
    # additional searchable string / string[] fields. Their postings live in
    # the same per-segment term dictionary under a field-prefixed key
    # ("field\x1fterm"), mirroring the reference's one-ART-per-field
    # search_index (include/index.h:149) without extra files. Each gets its
    # own doclen column (dl__<field>) for per-field BM25.
    indexed_fields: tuple[str, ...] = ()
    sha_field: str | None = "sha256"  # verified per row when present
    verify_sha: bool = True
    batch_docs: int = 4096  # docs per segment
    block_size: int = BLOCK_SIZE
    k1: float = 1.2
    b: float = 0.75
    # CPU slots reserved per segment-writer task. The writer is
    # memory-bandwidth-heavy (string tokenization over large text blocks);
    # >1 prevents oversubscription collapse on hosts whose advertised CPU
    # count exceeds effective parallel throughput (SMT / noisy neighbors).
    writer_num_cpus: float = 2.0
    # global-df aggregation: 'stream' merges the per-segment (term, df)
    # partials into a driver dict (vocab ≪ corpus — the combiner pattern);
    # 'groupby' is the all-to-all path for vocabularies too large for one
    # node; 'auto' picks by estimated row count.
    df_mode: str = "auto"

    def fingerprint(self) -> str:
        blob = json.dumps(
            {**asdict(self), "_format": SEGMENT_FORMAT_VERSION}, sort_keys=True
        ).encode()
        return hashlib.blake2b(blob, digest_size=8).hexdigest()


# bump when the segment file layout changes — gives format-changed segments
# new content addresses so resume never mixes layouts
# (v3: segment id covers doc CONTENT, not just doc ids — see SegmentWriter;
#  v4: content hash is LOGICAL — layout-canonicalized IPC bytes, so a sliced
#  chunk and a fresh array with equal values hash identically)
SEGMENT_FORMAT_VERSION = 4


def update_hash_with_table(h, table: pa.Table) -> None:
    """Feed ``table``'s LOGICAL content into hash object ``h``,
    independent of physical layout (chunking, slice offsets, buffer
    padding). Raw ``.buffers()`` bytes are layout-dependent — a sliced
    chunk hashes differently from an identical fresh array — so we
    canonicalize first: combine chunks, then ``take(arange)`` (which
    rebases offsets and drops out-of-slice bytes), then hash the Arrow
    IPC stream bytes (verified layout-invariant across slice / chunk /
    take variants of equal logical content)."""
    table = table.combine_chunks()
    table = table.take(np.arange(table.num_rows))
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, table.schema) as w:
        w.write_table(table)
    h.update(sink.getvalue())


def doc_id_from_key(*parts: str) -> int:
    """Deterministic 64-bit doc id from the identifying key fields (the
    reference's string-id → seq_id map, src/collection.cpp:1659-1672,
    replaced by a pure function of the key)."""
    h = hashlib.blake2b("\0".join(parts).encode("utf-8"), digest_size=8)
    return int.from_bytes(h.digest(), "big") & 0x7FFFFFFFFFFFFFFF


def compute_doc_ids(batch: pa.Table, cfg: "IndexConfig") -> np.ndarray:
    """Doc ids for a batch under ``cfg`` — either the explicit ``id_field``
    column or :func:`doc_id_from_key` over ``id_fields``. Pure function of
    the data, shared by the segment writer and the upsert path."""
    if cfg.id_field:
        col = batch[cfg.id_field]
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            # string user ids (the reference's `id` is a string,
            # src/collection.cpp:1659-1672) hash like a key tuple
            return np.array(
                [doc_id_from_key(s) for s in col.to_pylist()],
                dtype=np.uint64,
            )
        ids = col.to_numpy()
        if ids.min() < 0:
            raise ValueError("id_field values must be non-negative")
        return ids.astype(np.uint64)
    cols = [batch[f].to_pylist() for f in cfg.id_fields]
    return np.array(
        [doc_id_from_key(*key) for key in zip(*cols)], dtype=np.uint64
    )


def encode_postings_from_occurrences(
    uniq_terms: np.ndarray,
    inv: np.ndarray,
    occ_doc: np.ndarray,
    occ_pos: np.ndarray,
    doclens: np.ndarray,
    block_size: int,
) -> tuple[pa.Table, int, int]:
    """Encode a flat occurrence stream into the segment postings table
    (delta+varbyte streams, per-block block-max skip metadata + byte
    offsets). ``uniq_terms`` must be sorted; ``inv`` holds each
    occurrence's term rank; ``occ_pos`` must be in ascending order within
    each (term, doc). Shared by :class:`SegmentWriter` and
    :func:`typesense_ray.ops.merge_segments`, so merged segments are
    byte-format-identical to freshly built ones. Returns
    ``(postings_table, n_terms, n_postings)``."""
    from typesense_ray.codec import slice_encoded as _slice
    from typesense_ray.codec import varbyte_encode_raw as _vb

    n_occ = len(inv)
    if n_occ:
        # one sort puts occurrences in (term, doc, pos) posting order
        order = np.lexsort((occ_pos, occ_doc, inv))
        inv_s = inv[order]
        odoc_s = occ_doc[order]
        pos_sorted = occ_pos[order].astype(np.uint64)
        entry_bounds = np.r_[
            True, (inv_s[1:] != inv_s[:-1]) | (odoc_s[1:] != odoc_s[:-1])
        ]
        entry_starts_occ = np.flatnonzero(entry_bounds).astype(np.int64)
        n_entries = len(entry_starts_occ)
        tfs_s = np.diff(np.append(entry_starts_occ, n_occ)).astype(np.int64)
        codes_s = inv_s[entry_starts_occ]
        docs_s = odoc_s[entry_starts_occ].astype(np.uint64)
        term_starts = np.flatnonzero(
            np.r_[True, codes_s[1:] != codes_s[:-1]]
        ).astype(np.int64)
        n_terms = len(uniq_terms)

        # per-term stats (vectorized segmented reductions)
        col_df = np.diff(np.append(term_starts, n_entries)).astype(np.int32)
        col_cf = np.add.reduceat(tfs_s, term_starts)
        col_maxtf = np.maximum.reduceat(tfs_s, term_starts).astype(np.int32)

        # doc-id stream: delta with restart at each term boundary
        d_ids = docs_s.copy()
        d_ids[1:] -= docs_s[:-1]
        d_ids[term_starts] = docs_s[term_starts]
        buf_ids, nb_ids = _vb(d_ids)
        col_ids = _slice(buf_ids, nb_ids, term_starts)

        buf_tfs, nb_tfs = _vb(tfs_s.astype(np.uint64))
        col_tfs = _slice(buf_tfs, nb_tfs, term_starts)

        # positions are already in posting order from the lexsort:
        # delta with restart at each (term, doc) entry boundary
        d_pos = pos_sorted.copy()
        d_pos[1:] -= pos_sorted[:-1]
        d_pos[entry_starts_occ] = pos_sorted[entry_starts_occ]
        buf_pos, nb_pos = _vb(d_pos)
        col_pos = _slice(buf_pos, nb_pos, entry_starts_occ[term_starts])

        # block-max metadata: one global reduceat over per-term blocks
        bsz = block_size
        blocks_per_term = (col_df.astype(np.int64) + bsz - 1) // bsz
        bm_term_starts = np.zeros(n_terms, dtype=np.int64)
        np.cumsum(blocks_per_term[:-1], out=bm_term_starts[1:])
        n_blocks = int(blocks_per_term.sum())
        blk_idx = np.arange(n_blocks, dtype=np.int64) - np.repeat(
            bm_term_starts, blocks_per_term
        )
        blk_starts = np.repeat(term_starts, blocks_per_term) + blk_idx * bsz
        term_ends = np.append(term_starts[1:], n_entries)
        blk_ends = np.minimum(
            blk_starts + bsz, np.repeat(term_ends, blocks_per_term)
        )
        dls_s = doclens[docs_s.astype(np.int64)].astype(np.int64)
        bm_maxtf_flat = np.maximum.reduceat(tfs_s, blk_starts)
        bm_mindl_flat = np.minimum.reduceat(dls_s, blk_starts)
        bm_last_flat = docs_s[blk_ends - 1].astype(np.int64)
        bm_offsets = np.append(bm_term_starts, n_blocks)
        col_bm_last = pa.ListArray.from_arrays(
            pa.array(bm_offsets, pa.int32()),
            pa.array(bm_last_flat.astype(np.int32)),
        )
        col_bm_maxtf = pa.ListArray.from_arrays(
            pa.array(bm_offsets, pa.int32()),
            pa.array(bm_maxtf_flat.astype(np.int32)),
        )
        col_bm_mindl = pa.ListArray.from_arrays(
            pa.array(bm_offsets, pa.int32()),
            pa.array(bm_mindl_flat.astype(np.int32)),
        )
        # per-block byte offsets into the term's ids_vb/tfs_vb slices so
        # block-max WAND can decode one block without its predecessors
        # (delta restarts via the previous block's bm_last as base)
        byte_off_ids = np.zeros(n_entries + 1, dtype=np.int64)
        np.cumsum(nb_ids, out=byte_off_ids[1:])
        byte_off_tfs = np.zeros(n_entries + 1, dtype=np.int64)
        np.cumsum(nb_tfs, out=byte_off_tfs[1:])
        term_byte_base_ids = byte_off_ids[
            np.repeat(term_starts, blocks_per_term)
        ]
        term_byte_base_tfs = byte_off_tfs[
            np.repeat(term_starts, blocks_per_term)
        ]
        col_bm_ids_boff = pa.ListArray.from_arrays(
            pa.array(bm_offsets, pa.int32()),
            pa.array(
                (byte_off_ids[blk_starts] - term_byte_base_ids).astype(np.int32)
            ),
        )
        col_bm_tfs_boff = pa.ListArray.from_arrays(
            pa.array(bm_offsets, pa.int32()),
            pa.array(
                (byte_off_tfs[blk_starts] - term_byte_base_tfs).astype(np.int32)
            ),
        )
        col_term = [str(t) for t in uniq_terms]
        n_postings = n_entries
    else:
        n_terms = 0
        n_postings = 0
        col_term = []
        col_df = np.empty(0, np.int32)
        col_cf = np.empty(0, np.int64)
        col_maxtf = np.empty(0, np.int32)
        col_ids = col_tfs = col_pos = []
        empty_list = pa.ListArray.from_arrays(
            pa.array([0], pa.int32()), pa.array([], pa.int32())
        ).slice(0, 0)
        col_bm_last = col_bm_maxtf = col_bm_mindl = empty_list
        col_bm_ids_boff = col_bm_tfs_boff = empty_list

    postings = pa.table(
        {
            "term": pa.array(col_term, pa.string()),
            "df": pa.array(col_df),
            "cf": pa.array(col_cf),
            "max_tf": pa.array(col_maxtf),
            "ids_vb": pa.array(col_ids, pa.binary()),
            "tfs_vb": pa.array(col_tfs, pa.binary()),
            "pos_vb": pa.array(col_pos, pa.binary()),
            "bm_last": col_bm_last,
            "bm_max_tf": col_bm_maxtf,
            "bm_min_dl": col_bm_mindl,
            "bm_ids_boff": col_bm_ids_boff,
            "bm_tfs_boff": col_bm_tfs_boff,
        }
    )
    return postings, n_terms, n_postings


FIELD_SEP = "\x1f"  # joins field name + term in secondary-field keys
ARRAY_POS_STRIDE = 1 << 16  # position offset between string[] elements

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
        return compute_doc_ids(batch, self.cfg)

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

        # tokenize → flat occurrence stream (token, doc, slot-pos) — one
        # translate+split per unit (C calls), then every per-token step is
        # a numpy/pandas kernel: factorize token strings once per field,
        # one lexsort by (term, doc, pos) yields the position stream
        # already in posting order (no per-doc dicts, no per-entry gather).
        # Secondary indexed fields run the SAME kernel — their tokenization
        # unit is the doc (string) or the array element (string[], with
        # positions offset by k*ARRAY_POS_STRIDE, a simplified stand-in for
        # the reference's per-element offset sentinel scheme,
        # src/index.cpp:558-606); field terms enter the shared code space
        # by prefixing only the field's UNIQUE terms, never the stream.
        from typesense_ray.tokenizer import normalized_slot_codes

        def slot_stream(unit_texts, docs_of, base_pos):
            """(codes, uniq, occ_doc, occ_pos) over tokenization units —
            dictionary-encoded by :func:`normalized_slot_codes` (Arrow
            C++ for all-ASCII batches, per-unit translate+split
            otherwise; identical streams either way). ``unit_texts`` may
            be a list or an Arrow string column.

            Within-unit positions wrap to 16 bits: the reference stores
            full offsets but its decode casts every position to uint16
            (src/index.cpp:1995-2013 populate_token_positions), so the
            observable (element, position) sets — and therefore phrase
            adjacency and proximity windows — wrap identically there.
            With the wrap, stride-composed positions are decode-
            equivalent to the reference's repeated-last-offset +
            array-index sentinel encoding for EVERY input, not just
            elements under 2^16 tokens."""
            codes, uniq, unit_ix, pos_in_unit = normalized_slot_codes(
                unit_texts
            )
            return (
                codes,
                uniq,
                docs_of[unit_ix],
                (pos_in_unit & 0xFFFF) + base_pos[unit_ix],
            )

        all_docs = np.arange(n, dtype=np.int64)
        zero_pos = np.zeros(n, dtype=np.int64)
        codes0, uniq0, p_doc, p_pos = slot_stream(
            batch[cfg.text_field], all_docs, zero_pos
        )
        doclens = np.bincount(p_doc, minlength=n).astype(np.int32)

        code_parts, uniq_parts, doc_parts, pos_parts = [], [], [], []
        if codes0.size:
            code_parts.append(codes0)
            uniq_parts.append(uniq0)
            doc_parts.append(p_doc)
            pos_parts.append(p_pos)

        extra_doclens: dict[str, np.ndarray] = {}
        for fld in cfg.indexed_fields:
            if fld == cfg.text_field or fld not in batch.column_names:
                continue
            col = batch[fld]
            is_arr = pa.types.is_list(col.type) or pa.types.is_large_list(col.type)
            vals = col.to_pylist()
            if is_arr:
                elem_texts: list[str] = []
                elem_doc: list[int] = []
                elem_base: list[int] = []
                for local_id, v in enumerate(vals):
                    if v is None:
                        continue
                    for k, el in enumerate(v):
                        elem_texts.append(el or "")
                        elem_doc.append(local_id)
                        elem_base.append(k * ARRAY_POS_STRIDE)
                docs_of = np.asarray(elem_doc, dtype=np.int64)
                base_pos = np.asarray(elem_base, dtype=np.int64)
            else:
                elem_texts = [v or "" for v in vals]
                docs_of = all_docs
                base_pos = zero_pos
            codes_f, uniq_f, f_doc, f_pos = slot_stream(
                elem_texts, docs_of, base_pos
            )
            extra_doclens[fld] = np.bincount(f_doc, minlength=n).astype(np.int32)
            if codes_f.size:
                prefix = fld + FIELD_SEP
                offset = int(sum(len(u) for u in uniq_parts))
                code_parts.append(codes_f + offset)
                uniq_parts.append(
                    np.array([prefix + t for t in uniq_f], dtype=object)
                )
                doc_parts.append(f_doc)
                pos_parts.append(f_pos)

        if code_parts:
            codes = np.concatenate(code_parts)
            uniq_np = np.concatenate(uniq_parts)
            occ_doc = np.concatenate(doc_parts)
            occ_pos = np.concatenate(pos_parts)
        else:
            codes = np.empty(0, np.int64)
            uniq_np = np.empty(0, object)
            occ_doc = np.empty(0, np.int64)
            occ_pos = np.empty(0, np.int64)
        t_tok = time.perf_counter()

        if len(codes):
            # prefixed field terms cannot collide with primary terms (the
            # \x1f separator never survives tokenization), so the
            # concatenated unique list is globally unique; sort it once
            srt = np.argsort(uniq_np)
            rank = np.empty_like(srt)
            rank[srt] = np.arange(len(srt))
            uniq_terms = uniq_np[srt]
            inv = rank[codes]
        else:
            uniq_terms = np.empty(0, object)
            inv = np.empty(0, np.int64)
        postings, n_terms, n_postings = encode_postings_from_occurrences(
            uniq_terms, inv, occ_doc, occ_pos, doclens, cfg.block_size
        )
        t_enc = time.perf_counter()

        docs_cols: dict[str, pa.Array] = {
            "doc_id": pa.array(doc_ids, pa.uint64()),
            "doclen": pa.array(doclens, pa.int32()),
            "sha256": pa.array(shas, pa.string()),
        }
        for fld, fdl in extra_doclens.items():
            docs_cols[f"dl__{fld}"] = pa.array(fdl, pa.int32())
        for f in self.cfg.meta_fields:
            if f in batch.column_names and f not in docs_cols:
                docs_cols[f] = batch[f]
        docs = pa.table(docs_cols)

        corpus_fingerprint = hashlib.blake2b(
            "".join(sorted(shas)).encode(), digest_size=16
        ).hexdigest()

        # content-addressed segment id → idempotent, resumable writes.
        # The hash covers doc ids AND the LOGICAL row content of the docs
        # sidecar (text sha256s, doclens, meta fields): re-upserting an
        # existing id with changed content or metadata must produce a NEW
        # segment address, or the resume check would silently re-register
        # the stale segment.
        seg_hash = hashlib.blake2b(digest_size=8)
        seg_hash.update(doc_ids.tobytes())
        update_hash_with_table(seg_hash, docs)
        seg_hash.update(self.cfg.fingerprint().encode())
        seg_id = seg_hash.hexdigest()
        seg_dir = os.path.join(self.seg_root, f"seg-{seg_id}")

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


def _merge_term_df(seg_postings: list[str]) -> pa.Table:
    """Merge per-segment (term, df) partials into the global df table with
    ONE Arrow C++ groupby-sum + sort — no Python loop over rows (the old
    driver-dict fold was a serial multi-minute bottleneck at ~10^7 partial
    rows, charged to every build regardless of writer count)."""
    import pyarrow.dataset as pads

    t = pads.dataset(seg_postings).to_table(columns=["term", "df"])
    agg = pa.TableGroupBy(t, "term").aggregate([("df", "sum")])
    agg = agg.sort_by("term")
    return pa.table(
        {"term": agg["term"],
         "df": agg["df_sum"].cast(pa.int64())}
    )


def gc_segments(out_dir: str, grace_s: float = 0.0) -> list[str]:
    """Remove segment dirs not referenced by the committed manifest (stale
    pre-compaction originals, orphans from crashed builds, leftover
    ``.tmp-*`` dirs). Safe to call only AFTER a manifest commit: anything
    a concurrent resumable rerun still needs is, by definition, listed in
    the manifest it would re-commit. Returns the removed dir names.

    Concurrent-READER contract: a reader opened from a pre-commit
    manifest with ``preload=False`` (lazy per-query postings reads) can
    hit a deleted dir mid-query. Either (a) open readers with
    ``preload=True`` (the serving pool's default — all reads happen at
    construction, against the manifest's own segment list), or (b) pass
    ``grace_s`` ≥ the max in-flight query latency: if the manifest was
    committed within the last ``grace_s`` seconds the pass is deferred
    entirely (returns ``[]``); stale dirs are collected by the NEXT gc
    pass, so lazy readers of the just-replaced manifest drain safely.
    """
    import shutil

    seg_root = os.path.join(out_dir, "segments")
    manifest_path = os.path.join(out_dir, "manifest.json")
    if not os.path.isdir(seg_root) or not os.path.exists(manifest_path):
        return []
    if grace_s > 0:
        try:
            if time.time() - os.path.getmtime(manifest_path) < grace_s:
                return []
        except OSError:
            return []
    with open(manifest_path) as f:
        keep = {f"seg-{sid}" for sid in json.load(f)["segments"]}
    removed = []
    for name in os.listdir(seg_root):
        if name.startswith("seg-") and name not in keep:
            shutil.rmtree(os.path.join(seg_root, name), ignore_errors=True)
            removed.append(name)
    return removed


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


def _build_segments_from_files(
    source: str, out_dir: str, cfg: IndexConfig, cols: list[str],
    concurrency: int | None,
) -> list[dict]:
    """Segment build over a Parquet path via a pool of FILE-PARTITIONED
    writer actors: the driver assigns whole files to writers ONCE (greedy
    LPT by byte size), then each actor streams its files' row groups,
    re-batches to ``cfg.batch_docs`` and writes segments locally — zero
    per-batch driver dispatch in the hot loop. This is the scale shape
    that matches plain-process scaling (~1.01x/core): the per-task
    dispatch latency of a central streaming executor is exactly what the
    two-cluster-size efficiency bar exposed (see BASELINE.md). On a real
    multi-node cluster the same assignment doubles as locality-friendly
    work placement, and resumability is unchanged — segments stay
    content-addressed, and batch boundaries are deterministic per file
    (re-batching never crosses a file), so a rerun at ANY writer count
    skips completed segments."""
    import ray

    import pyarrow.dataset as pads

    d = pads.dataset(source)
    files = sorted(d.files)
    if not files:
        return []
    if concurrency is None:
        n_writers = max(
            1,
            int(ray.cluster_resources().get("CPU", 4) / cfg.writer_num_cpus),
        )
    else:
        n_writers = concurrency
    n_writers = min(n_writers, len(files))

    # greedy longest-processing-time assignment by file size
    sizes = np.array([os.path.getsize(f) for f in files], dtype=np.int64)
    order = np.argsort(sizes)[::-1]
    load = np.zeros(n_writers, dtype=np.int64)
    assign: list[list[str]] = [[] for _ in range(n_writers)]
    for fi in order:
        w = int(np.argmin(load))
        assign[w].append(files[fi])
        load[w] += sizes[fi]

    @ray.remote(num_cpus=cfg.writer_num_cpus)
    def write_files(paths: list[str]) -> list[dict]:
        import pyarrow.dataset as pads

        # keep each writer inside its CPU reservation: Arrow's default
        # thread pool is sized to the HOST (32), so N writers would spawn
        # N*32 decode/compute threads and thrash each other
        pa.set_cpu_count(max(1, int(cfg.writer_num_cpus)))
        pa.set_io_thread_count(2)

        writer = SegmentWriter(out_dir, cfg)
        out: list[dict] = []
        for path in paths:
            pending: list[pa.RecordBatch] = []
            npend = 0
            scanner = pads.dataset(path).scanner(
                columns=cols, batch_size=cfg.batch_docs
            )
            def flush(batches):
                tbl = pa.Table.from_batches(batches)
                head = tbl.slice(0, cfg.batch_docs)
                m = writer(head.combine_chunks())
                if m.num_rows:
                    out.append(m.to_pylist()[0])
                rest = tbl.slice(cfg.batch_docs)
                return (rest.to_batches(), rest.num_rows) if rest.num_rows else ([], 0)

            for rb in scanner.to_batches():
                if rb.num_rows == 0:
                    continue
                pending.append(rb)
                npend += rb.num_rows
                while npend >= cfg.batch_docs:
                    pending, npend = flush(pending)
            if npend:  # file tail — never crosses into the next file
                tbl = pa.Table.from_batches(pending)
                m = writer(tbl.combine_chunks())
                if m.num_rows:
                    out.append(m.to_pylist()[0])
        return out

    futs = [write_files.remote(chunk) for chunk in assign if chunk]
    return [m for part in ray.get(futs) for m in part]


def build_index(
    source,
    out_dir: str,
    cfg: IndexConfig = IndexConfig(),
    *,
    concurrency: int | None = None,
    schema=None,
    rejects_dir: str | None = None,
    file_parallel: bool | None = None,
) -> dict:
    """Build a full index from a corpus Dataset (or parquet path).

    Parquet-path sources take the file-partitioned actor path
    (:func:`_build_segments_from_files` — per-actor work queues, one
    dispatch per writer); Dataset sources and schema-validated builds run
    ``map_batches(SegmentWriter, batch_format="pyarrow", concurrency=N)``
    (streaming, backpressured). Either way the small manifest rows feed
    the global-stats aggregation: ``read segment (term, df) →
    groupby("term").sum`` — the build's only shuffle — written to
    ``global/df.parquet``. ``file_parallel`` forces the choice.

    Returns the index manifest (also written to ``<out_dir>/manifest.json``).
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    t0 = time.perf_counter()
    cols = list(
        dict.fromkeys(
            [cfg.text_field]
            + ([cfg.id_field] if cfg.id_field else list(cfg.id_fields))
            + ([cfg.sha_field] if cfg.sha_field else [])
            + list(cfg.meta_fields)
            + list(cfg.indexed_fields)
        )
    )
    if isinstance(source, str):
        # prune to columns that exist — configured-but-absent meta/indexed
        # fields are skipped per-field (SegmentWriter guards on presence),
        # not a read error
        try:
            import pyarrow.dataset as pads

            avail = set(pads.dataset(source).schema.names)
            cols = [c for c in cols if c in avail]
        except Exception:
            pass
    if file_parallel is None:
        file_parallel = isinstance(source, str) and schema is None

    if file_parallel:
        manifests = _build_segments_from_files(source, out_dir, cfg, cols,
                                               concurrency)
    else:
        if isinstance(source, str):
            # pass an explicit metadata-free schema: the writer's pandas
            # metadata makes pa.Schema unhashable, which defeats Ray's
            # block-schema deduplication (a per-task "Failed to hash the
            # schemas" unify fallback otherwise)
            read_kw = {}
            try:
                import pyarrow.dataset as pads

                full = pads.dataset(source).schema
                read_kw["schema"] = pa.schema(
                    [full.field(c) for c in cols]
                ).remove_metadata()
            except Exception:
                pass
            ds = rd.read_parquet(source, columns=cols, **read_kw)
        else:
            ds = source

        if schema:
            # per-record validation (error per record, batch proceeds —
            # src/index.cpp:249-352); rejects land beside the segments
            from typesense_ray.validate import Validator

            ds = ds.map_batches(
                Validator(schema, rejects_dir or os.path.join(out_dir, "rejects")),
                batch_format="pyarrow",
            )

        if concurrency is None:
            concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 1)

        # In-memory sources (from_arrow/from_pandas) arrive as a single
        # block, which would serialize the SegmentWriter pool; split them.
        # Parquet reads already come in many blocks.
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
            num_cpus=cfg.writer_num_cpus,
        ).take_all()
    t_seg = time.perf_counter()

    seg_ids = [m["segment_id"] for m in manifests]
    n_docs = int(sum(m["n_docs"] for m in manifests))
    doclen_sum = int(sum(m["doclen_sum"] for m in manifests))

    # global document frequencies. The per-segment term dicts are already
    # combiner-style partials (one row per term per segment), so the merge
    # is either streamed into a driver dict (vocab ≪ corpus) or, for
    # vocabularies too large for one node, the build's only all-to-all
    # shuffle: groupby(term).sum.
    seg_postings = [
        os.path.join(out_dir, "segments", f"seg-{sid}", POSTINGS_FILE)
        for sid in seg_ids
    ]
    df_dir = os.path.join(out_dir, "global", "df")
    import shutil

    shutil.rmtree(df_dir, ignore_errors=True)
    total_term_rows = int(sum(m["n_terms"] for m in manifests))
    mode = cfg.df_mode
    if mode == "auto":
        mode = "stream" if total_term_rows <= 20_000_000 else "groupby"
    if seg_postings and mode == "stream":
        os.makedirs(df_dir, exist_ok=True)
        pq.write_table(
            _merge_term_df(seg_postings), os.path.join(df_dir, "df.parquet")
        )
    elif seg_postings:
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
    gc_segments(out_dir)
    return stats
