"""Collection lifecycle operators: import, export, bulk delete.

Mirrors the reference's document-lifecycle surface (SURVEY.md §2.1):

- JSONL import (``src/core_api.cpp:636-775`` → ``Collection::add_many``)
  → :func:`import_documents`: ``read_json`` → the standard segment build.
- Export streaming scan (``src/core_api.cpp:588-634``) →
  :func:`export_documents`: a Dataset over the segment docs sidecars
  (consume with ``write_parquet`` / ``write_json`` / ``iter_batches``).
- Filter-based bulk delete (``src/core_api.cpp:880-985``) →
  :func:`delete_by_filter`: resolve the filter per segment, rewrite only
  affected segments (postings decoded → surviving local ids remapped →
  re-encoded, block-max rebuilt), refresh global stats. Untouched
  segments are carried over as-is, so deletes cost O(affected docs).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from typesense_ray.codec import (
    block_max_meta,
    decode_posting_ids,
    decode_positions,
    encode_positions,
    varbyte_decode,
    varbyte_encode_raw,
    delta_encode,
)
from typesense_ray.filtering import StringTokenCache, eval_filters, parse_filter
from typesense_ray.index_build import (
    DOCS_FILE,
    MANIFEST_FILE,
    POSTINGS_FILE,
    IndexConfig,
    build_index,
)


def import_documents(source, out_dir: str, cfg: IndexConfig, **kw) -> dict:
    """Index documents from JSONL / parquet path(s) or a Dataset. JSONL
    lines become Arrow rows exactly like the reference's line-batched
    import, but schema-checked by Arrow instead of per-line JSON probing."""
    import ray.data as rd

    if isinstance(source, str) and (
        source.endswith(".jsonl") or source.endswith(".json")
    ):
        source = rd.read_json(source)
    return build_index(source, out_dir, cfg, **kw)


def export_documents(index_dir: str, columns: list[str] | None = None):
    """All stored docs as a streaming Dataset (one block per segment
    sidecar) — the export scan. ``ds.write_parquet/write_json`` to sink."""
    import ray.data as rd

    from typesense_ray.query import segment_dirs

    paths = [os.path.join(d, DOCS_FILE) for d in segment_dirs(index_dir)]
    return rd.read_parquet(paths, columns=columns)


def _compact_segment(seg_dir: str, keep: np.ndarray, seg_root: str,
                     config_fingerprint: str, block_size: int) -> dict:
    """Rewrite one segment keeping only ``keep``-masked local docs.
    Pure postings surgery — no access to the original text needed."""
    docs = pq.read_table(os.path.join(seg_dir, DOCS_FILE))
    post = pq.read_table(os.path.join(seg_dir, POSTINGS_FILE))
    n_old = docs.num_rows
    remap = np.cumsum(keep) - 1  # old local id → new local id
    new_docs = docs.filter(pa.array(keep))
    doclens = new_docs["doclen"].to_numpy().astype(np.int64)

    cols = {c: [] for c in ["term", "df", "cf", "max_tf", "ids_vb", "tfs_vb",
                            "pos_vb", "bm_last", "bm_max_tf", "bm_min_dl",
                            "bm_ids_boff", "bm_tfs_boff"]}
    n_postings = 0
    for i in range(post.num_rows):
        df = post["df"][i].as_py()
        ids = decode_posting_ids(post["ids_vb"][i].as_py(), df).astype(np.int64)
        tfs = varbyte_decode(post["tfs_vb"][i].as_py(), df).astype(np.int64)
        m = keep[ids]
        if not m.any():
            continue
        pos = decode_positions(post["pos_vb"][i].as_py(), tfs)
        starts = np.zeros(df, dtype=np.int64)
        np.cumsum(tfs[:-1], out=starts[1:])
        kept_idx = np.flatnonzero(m)
        new_ids = remap[ids[kept_idx]].astype(np.uint64)
        new_tfs = tfs[kept_idx]
        pos_parts = [pos[starts[j] : starts[j] + tfs[j]] for j in kept_idx]
        new_pos = np.concatenate(pos_parts) if pos_parts else np.empty(0, np.uint64)
        cols["term"].append(post["term"][i].as_py())
        cols["df"].append(len(new_ids))
        cols["cf"].append(int(new_tfs.sum()))
        cols["max_tf"].append(int(new_tfs.max()))
        ids_buf, ids_nb = varbyte_encode_raw(delta_encode(new_ids))
        tfs_buf, tfs_nb = varbyte_encode_raw(new_tfs.astype(np.uint64))
        cols["ids_vb"].append(ids_buf.tobytes())
        cols["tfs_vb"].append(tfs_buf.tobytes())
        cols["pos_vb"].append(encode_positions(new_pos, new_tfs))
        last, max_tf, min_dl = block_max_meta(
            new_ids, new_tfs, doclens[new_ids.astype(np.int64)], block_size
        )
        cols["bm_last"].append([int(x) for x in last])
        cols["bm_max_tf"].append([int(x) for x in max_tf])
        cols["bm_min_dl"].append([int(x) for x in min_dl])
        # per-block byte offsets so compacted segments keep block-max WAND
        # eligibility (the format guard falls back to dense scoring when
        # these columns are missing)
        blk_starts = np.arange(0, len(new_ids), block_size, dtype=np.int64)
        ids_boff = np.zeros(len(new_ids) + 1, dtype=np.int64)
        np.cumsum(ids_nb, out=ids_boff[1:])
        tfs_boff = np.zeros(len(new_ids) + 1, dtype=np.int64)
        np.cumsum(tfs_nb, out=tfs_boff[1:])
        cols["bm_ids_boff"].append([int(x) for x in ids_boff[blk_starts]])
        cols["bm_tfs_boff"].append([int(x) for x in tfs_boff[blk_starts]])
        n_postings += len(new_ids)

    new_postings = pa.table(
        {
            "term": pa.array(cols["term"], pa.string()),
            "df": pa.array(cols["df"], pa.int32()),
            "cf": pa.array(cols["cf"], pa.int64()),
            "max_tf": pa.array(cols["max_tf"], pa.int32()),
            "ids_vb": pa.array(cols["ids_vb"], pa.binary()),
            "tfs_vb": pa.array(cols["tfs_vb"], pa.binary()),
            "pos_vb": pa.array(cols["pos_vb"], pa.binary()),
            "bm_last": pa.array(cols["bm_last"], pa.list_(pa.int32())),
            "bm_max_tf": pa.array(cols["bm_max_tf"], pa.list_(pa.int32())),
            "bm_min_dl": pa.array(cols["bm_min_dl"], pa.list_(pa.int32())),
            "bm_ids_boff": pa.array(cols["bm_ids_boff"], pa.list_(pa.int32())),
            "bm_tfs_boff": pa.array(cols["bm_tfs_boff"], pa.list_(pa.int32())),
        }
    )

    import hashlib

    seg_hash = hashlib.blake2b(digest_size=8)
    seg_hash.update(new_docs["doc_id"].to_numpy().tobytes())
    seg_hash.update(config_fingerprint.encode())
    seg_id = seg_hash.hexdigest()
    new_dir = os.path.join(seg_root, f"seg-{seg_id}")
    if not os.path.exists(os.path.join(new_dir, MANIFEST_FILE)):
        tmp = f"{new_dir}.tmp-{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(new_postings, os.path.join(tmp, POSTINGS_FILE))
        pq.write_table(new_docs, os.path.join(tmp, DOCS_FILE))
        manifest = {
            "segment_id": seg_id,
            "n_docs": int(new_docs.num_rows),
            "n_terms": int(new_postings.num_rows),
            "n_postings": int(n_postings),
            "doclen_sum": int(doclens.sum()),
            "compacted_from": os.path.basename(seg_dir),
            "files": [POSTINGS_FILE, DOCS_FILE],
            "metrics": {},
        }
        with open(os.path.join(tmp, MANIFEST_FILE), "w") as f:
            json.dump(manifest, f)
        try:
            os.rename(tmp, new_dir)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return {
        "segment_id": seg_id,
        "n_docs": int(new_docs.num_rows),
        "doclen_sum": int(doclens.sum()),
        "n_postings": int(n_postings),
    }


def _segment_delete_work(seg_dir: str, filter_by: str, want_ids: np.ndarray,
                         seg_root: str, cfg_fp: str, block_size: int) -> dict:
    """Per-segment delete: evaluate the mask and compact if any doc dies.
    Runs as a Ray task — deletes over many segments fan out instead of
    looping on the driver. ``segment_id=None`` means the whole segment
    was deleted."""
    from typesense_ray.filtering import arrow_field_kind

    m = json.load(open(os.path.join(seg_dir, MANIFEST_FILE)))
    if filter_by:
        docs = pq.read_table(os.path.join(seg_dir, DOCS_FILE))
        seg_ids = docs["doc_id"].to_numpy()
    else:
        # id-only deletes need just the id column to decide overlap
        docs = None
        seg_ids = pq.read_table(
            os.path.join(seg_dir, DOCS_FILE), columns=["doc_id"]
        )["doc_id"].to_numpy()
    delete_mask = np.zeros(len(seg_ids), dtype=bool)
    if want_ids.size:
        delete_mask |= np.isin(seg_ids, want_ids)
    if filter_by:
        field_types = {
            name: arrow_field_kind(docs.schema.field(name).type)
            for name in docs.column_names
        }
        clauses = parse_filter(filter_by, field_types)
        delete_mask |= eval_filters(docs, clauses, field_types, StringTokenCache())
    if not delete_mask.any():
        return {
            "segment_id": m["segment_id"],
            "n_docs": m["n_docs"],
            "doclen_sum": m["doclen_sum"],
            "n_postings": m.get("n_postings", 0),
            "n_deleted": 0,
        }
    n_del = int(delete_mask.sum())
    keep = ~delete_mask
    if not keep.any():  # whole segment deleted
        return {"segment_id": None, "n_docs": 0, "doclen_sum": 0,
                "n_postings": 0, "n_deleted": n_del}
    res = _compact_segment(seg_dir, keep, seg_root, cfg_fp, block_size)
    res["n_deleted"] = n_del
    return res


def refresh_typo_artifacts(index_dir: str) -> None:
    """Rebuild whichever fuzzy-search sidecars exist after an index
    mutation, replaying the recorded build parameters: the
    deletion-neighborhood table (``global/typo``) from the refreshed
    ``global/df``, and the per-term max-static table
    (``global/term_stats``) from the surviving segments. The reference
    never goes stale here because its ART trie IS the index
    (``src/art.cpp:411-427`` maintains fuzzy structures on insert);
    the rebuild is vocab-sized — ≪ corpus — so every commit path can
    afford it."""
    from typesense_ray.typo import (
        TERM_STATS_META,
        TYPO_DIR,
        TYPO_META,
        build_term_max_static,
        build_typo_table,
        read_meta,
    )

    if os.path.exists(os.path.join(index_dir, TYPO_DIR)):
        meta = read_meta(index_dir, TYPO_META) or {}
        build_typo_table(index_dir, **meta)
    stats_meta = read_meta(index_dir, TERM_STATS_META)
    if stats_meta:
        build_term_max_static(index_dir, stats_meta["static_field"])


def _refresh_global_df(index_dir: str, seg_ids: list[str]) -> None:
    """Rewrite ``global/df`` by re-merging the per-segment ``(term, df)``
    partials (one Arrow groupby-sum — vocab ≪ corpus), then refresh the
    fuzzy-search sidecars that derive from it (typo/prefix search must
    see vocabulary added by an upsert and must stop resolving deleted
    terms)."""
    import shutil

    from typesense_ray.index_build import _merge_term_df

    seg_root = os.path.join(index_dir, "segments")
    df_dir = os.path.join(index_dir, "global", "df")
    shutil.rmtree(df_dir, ignore_errors=True)
    os.makedirs(df_dir, exist_ok=True)
    paths = [
        os.path.join(seg_root, f"seg-{sid}", POSTINGS_FILE) for sid in seg_ids
    ]
    tbl = (
        _merge_term_df(paths)
        if paths
        else pa.table(
            {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
        )
    )
    pq.write_table(tbl, os.path.join(df_dir, "df.parquet"))
    refresh_typo_artifacts(index_dir)


def _merge_group(seg_dirs: list[str], seg_root: str, cfg_fp: str,
                 block_size: int) -> dict:
    """Merge several segments into one via direct postings surgery — no
    re-tokenization, no access to the original text: decode each term's
    postings, remap local ids into the merged doc order, rebuild the
    occurrence stream and re-encode with the exact builder kernel
    (:func:`encode_postings_from_occurrences`), so a merged segment is
    byte-format-identical to a freshly built one."""
    import hashlib

    from typesense_ray.index_build import encode_postings_from_occurrences

    docs_tables = [pq.read_table(os.path.join(d, DOCS_FILE)) for d in seg_dirs]
    posts = [pq.read_table(os.path.join(d, POSTINGS_FILE)) for d in seg_dirs]
    all_ids = np.concatenate([t["doc_id"].to_numpy() for t in docs_tables])
    order = np.argsort(all_ids)
    sorted_ids = all_ids[order]
    if (sorted_ids[1:] == sorted_ids[:-1]).any():
        raise ValueError("duplicate doc_id across segments being merged")
    merged_docs = pa.concat_tables(docs_tables).take(pa.array(order))
    doclens = merged_docs["doclen"].to_numpy().astype(np.int64)

    union_terms = np.unique(
        np.concatenate(
            [np.asarray(p["term"].to_pylist(), dtype=object) for p in posts]
        )
    )
    inv_parts, doc_parts, pos_parts = [], [], []
    for docs_t, post_t in zip(docs_tables, posts):
        newmap = np.searchsorted(sorted_ids, docs_t["doc_id"].to_numpy())
        dfs = post_t["df"].to_numpy().astype(np.int64)
        if not dfs.size:
            continue
        # whole-column decode: one varbyte pass per stream (the per-term
        # loop paid numpy call overhead per vocabulary row — ~60x slower)
        term_starts = np.zeros(dfs.size, np.int64)
        np.cumsum(dfs[:-1], out=term_starts[1:])
        d_ids = varbyte_decode(b"".join(post_t["ids_vb"].to_pylist()))
        # delta restart at each term's first posting → segmented cumsum
        ids_abs = np.cumsum(d_ids, dtype=np.uint64)
        if term_starts.size > 1:
            bases = np.concatenate(
                ([np.uint64(0)], ids_abs[term_starts[1:] - 1])
            )
            ids_abs = ids_abs - np.repeat(bases, dfs)
        tfs_all = varbyte_decode(
            b"".join(post_t["tfs_vb"].to_pylist())
        ).astype(np.int64)
        pos_all = decode_positions(
            b"".join(post_t["pos_vb"].to_pylist()), tfs_all
        )
        term_rank = np.searchsorted(union_terms, post_t["term"].to_pylist())
        entry_rank = np.repeat(term_rank, dfs)
        inv_parts.append(np.repeat(entry_rank, tfs_all))
        entry_doc = newmap[ids_abs.astype(np.int64)]
        doc_parts.append(np.repeat(entry_doc, tfs_all))
        pos_parts.append(pos_all.astype(np.int64))
    inv = np.concatenate(inv_parts) if inv_parts else np.empty(0, np.int64)
    occ_doc = np.concatenate(doc_parts) if doc_parts else np.empty(0, np.int64)
    occ_pos = np.concatenate(pos_parts) if pos_parts else np.empty(0, np.int64)
    postings, n_terms, n_postings = encode_postings_from_occurrences(
        np.asarray(union_terms, dtype=object), inv, occ_doc, occ_pos,
        doclens, block_size,
    )

    # same content-addressing scheme as SegmentWriter: doc ids + the
    # docs sidecar's LOGICAL content + config fingerprint
    from typesense_ray.index_build import update_hash_with_table

    seg_hash = hashlib.blake2b(digest_size=8)
    seg_hash.update(sorted_ids.astype(np.uint64).tobytes())
    update_hash_with_table(seg_hash, merged_docs)
    seg_hash.update(cfg_fp.encode())
    seg_id = seg_hash.hexdigest()
    new_dir = os.path.join(seg_root, f"seg-{seg_id}")
    if not os.path.exists(os.path.join(new_dir, MANIFEST_FILE)):
        tmp = f"{new_dir}.tmp-{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(postings, os.path.join(tmp, POSTINGS_FILE))
        pq.write_table(merged_docs, os.path.join(tmp, DOCS_FILE))
        manifest = {
            "segment_id": seg_id,
            "n_docs": int(merged_docs.num_rows),
            "n_terms": int(n_terms),
            "n_postings": int(n_postings),
            "doclen_sum": int(doclens.sum()),
            "merged_from": [os.path.basename(d) for d in seg_dirs],
            "files": [POSTINGS_FILE, DOCS_FILE],
            "metrics": {},
        }
        with open(os.path.join(tmp, MANIFEST_FILE), "w") as f:
            json.dump(manifest, f)
        try:
            os.rename(tmp, new_dir)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return {
        "segment_id": seg_id,
        "n_docs": int(merged_docs.num_rows),
        "doclen_sum": int(doclens.sum()),
        "n_postings": int(n_postings),
    }


def merge_segments(index_dir: str, target_docs: int = 65536) -> dict:
    """Compact small segments into ~``target_docs``-doc merged segments —
    the Lucene merge-policy role the always-in-RAM reference doesn't
    need. Per-query cost is linear in segment count (every query probes
    every segment), so builds that produced many small segments (fine
    write grain, per-file tails, upsert deltas) pay until merged.

    Groups are packed greedily in manifest order; each multi-segment
    group merges in a parallel Ray task (postings surgery, no original
    text needed). Global stats (n_docs, df sums, avgdl) are invariant
    under merging, so only the segment list and the manifest change;
    stale inputs are GC'd after commit. The fuzzy-search sidecars
    (``global/typo``, ``global/term_stats``) derive from global df /
    per-term maxima — both invariant under merge — so unlike
    upsert/delete (which refresh them via ``_refresh_global_df``) no
    rebuild is needed here."""
    import ray

    from typesense_ray.index_build import gc_segments
    from typesense_ray.query import load_stats, segment_dirs

    stats = load_stats(index_dir)
    cfg_fp = IndexConfig(
        **{k: (tuple(v) if isinstance(v, list) else v)
           for k, v in stats["config"].items()}
    ).fingerprint()
    block_size = stats["config"].get("block_size", 128)
    seg_root = os.path.join(index_dir, "segments")
    dirs = segment_dirs(index_dir)
    n_docs_per = []
    for d in dirs:
        with open(os.path.join(d, MANIFEST_FILE)) as f:
            n_docs_per.append(json.load(f)["n_docs"])

    groups: list[list[str]] = []
    cur: list[str] = []
    cur_docs = 0
    for d, nd in zip(dirs, n_docs_per):
        if cur and cur_docs + nd > target_docs:
            groups.append(cur)
            cur, cur_docs = [], 0
        cur.append(d)
        cur_docs += nd
    if cur:
        groups.append(cur)

    task = ray.remote(num_cpus=1)(_merge_group)
    futs, new_ids = {}, []
    for gi, g in enumerate(groups):
        if len(g) == 1:  # nothing to merge
            new_ids.append((gi, os.path.basename(g[0])[len("seg-"):]))
        else:
            futs[gi] = task.remote(g, seg_root, cfg_fp, block_size)
    for gi, fut in futs.items():
        new_ids.append((gi, ray.get(fut)["segment_id"]))
    stats["segments"] = [sid for _, sid in sorted(new_ids)]
    stats["n_segments"] = len(stats["segments"])
    stats["merges"] = stats.get("merges", 0) + len(futs)
    with open(os.path.join(index_dir, "manifest.json"), "w") as f:
        json.dump(stats, f, indent=1)
    gc_segments(index_dir)
    return stats


def delete_by_filter(index_dir: str, filter_by: str = "",
                     doc_ids=None, *, _commit: bool = True) -> dict:
    """Delete docs matching a ``filter_by`` expression (and/or an explicit
    id list); affected segments are compacted in parallel Ray tasks (new
    content-addressed dirs), global stats refreshed. ``_commit=False``
    defers the manifest + global-df write (used by :func:`upsert_documents`
    so a crash between its delete and append phases leaves the old
    manifest — and thus the old index view — intact)."""
    import ray

    from typesense_ray.query import load_stats, segment_dirs

    stats = load_stats(index_dir)
    cfg_fp = stats["config"].get("config_fingerprint") or IndexConfig(
        **{k: (tuple(v) if isinstance(v, list) else v)
           for k, v in stats["config"].items()}
    ).fingerprint()
    block_size = stats["config"].get("block_size", 128)
    seg_root = os.path.join(index_dir, "segments")

    want_ids = (
        np.unique(np.asarray(list(doc_ids), dtype=np.uint64))
        if doc_ids is not None and len(doc_ids)
        else np.empty(0, np.uint64)
    )
    dirs = segment_dirs(index_dir)
    ids_ref = ray.put(want_ids)  # broadcast once, not per task
    task = ray.remote(num_cpus=1)(_segment_delete_work)
    results = ray.get(
        [task.remote(d, filter_by, ids_ref, seg_root, cfg_fp, block_size)
         for d in dirs]
    )

    new_segments = [r["segment_id"] for r in results if r["segment_id"]]
    stats["segments"] = new_segments
    stats["n_docs"] = int(sum(r["n_docs"] for r in results))
    stats["doclen_sum"] = int(sum(r["doclen_sum"] for r in results))
    stats["n_postings"] = int(sum(r["n_postings"] for r in results))
    stats["avgdl"] = (
        stats["doclen_sum"] / stats["n_docs"] if stats["n_docs"] else 0.0
    )
    stats["n_segments"] = len(new_segments)
    stats["deleted_docs"] = stats.get("deleted_docs", 0) + int(
        sum(r["n_deleted"] for r in results)
    )
    if _commit:
        _refresh_global_df(index_dir, new_segments)
        with open(os.path.join(index_dir, "manifest.json"), "w") as f:
            json.dump(stats, f, indent=1)
        from typesense_ray.index_build import gc_segments

        gc_segments(index_dir)
    return stats


def scrub_reindex_doc(update_doc: dict, del_doc: dict, old_doc: dict,
                      schema) -> None:
    """Field-level update scrub — ``Index::scrub_reindex_doc``
    (``src/index.cpp:354-427``, tested by
    ``test/index_test.cpp`` IndexTest.ScrubReindexDoc): for every key in
    ``del_doc`` that names a declared schema field, compare the update
    value with the old value — string/string[] fields on their TOKENIZED
    forms (``Index::tokenize_doc_field``, ``src/index.cpp:2193-2206``),
    scalars/arrays element-wise — and erase matching fields from BOTH
    ``del_doc`` and ``update_doc`` so an upsert neither un-indexes nor
    reindexes unchanged fields. Keys outside the schema (``id``, ad-hoc
    keys) always survive. Mutates both dicts in place, like the
    reference.

    The segment-based :func:`upsert_documents` path makes this decision
    per whole DOC (immutable segments can't drop a single field), so this
    helper is the reference-parity primitive for callers that maintain
    their own field-level stores.
    """
    from typesense_ray.tokenizer import tokenize

    by_name = {f.name: f for f in schema}
    _MISS = object()

    def _vals(doc: dict, spec) -> object:
        v = doc.get(spec.name, _MISS)
        if v is _MISS:
            return _MISS
        if spec.type == "string":
            return tokenize(v, keep_empty=True)
        if spec.type == "string[]":
            out: list[str] = []
            for el in v:
                out.extend(tokenize(el, keep_empty=True))
            return out
        return v if isinstance(v, list) else [v]

    def _json_eq(a: list, b: list) -> bool:
        # nlohmann::json equality: bool vs number is UNEQUAL (True != 1),
        # while cross-numeric-type compares by value (1 == 1.0)
        return len(a) == len(b) and all(
            isinstance(x, bool) == isinstance(y, bool) and x == y
            for x, y in zip(a, b)
        )

    del_keys = []
    for name in del_doc:
        spec = by_name.get(name)
        if spec is None:
            continue
        new_v = _vals(update_doc, spec)
        if new_v is not _MISS:
            old_v = _vals(old_doc, spec)
            if old_v is not _MISS and _json_eq(new_v, old_v):
                del_keys.append(name)
    for k in del_keys:
        del_doc.pop(k, None)
        update_doc.pop(k, None)


def upsert_documents(source, index_dir: str, *,
                     concurrency: int | None = None) -> dict:
    """Upsert a delta of documents into an existing index: docs whose
    (data-derived) ``doc_id`` already exists replace the old version; new
    ids append. The reference mutates postings in place on update
    (``src/index.cpp:2086-2191`` remove + re-add) and scrubs unchanged
    fields to skip reindexing (``src/collection.cpp:219-238``,
    ``src/index.cpp:354-427``); with immutable segments this becomes:
    diff the delta against the stored per-row sha256s and DROP unchanged
    docs from the upsert entirely (no segment is touched for them), then
    compact old versions of the changed docs out of affected segments
    (parallel Ray tasks), write the changed delta as fresh
    content-addressed segments, and commit one manifest. Assumes the
    delta is small relative to the index (its id set is broadcast via
    ``ray.put``); for bulk rewrites, rebuild instead."""
    import ray
    import ray.data as rd

    from typesense_ray.index_build import SegmentWriter, compute_doc_ids
    from typesense_ray.query import load_stats, segment_dirs

    stats = load_stats(index_dir)
    cfg = IndexConfig(
        **{k: (tuple(v) if isinstance(v, list) else v)
           for k, v in stats["config"].items()}
    )
    if isinstance(source, str):
        source = (
            rd.read_json(source)
            if source.endswith((".jsonl", ".json"))
            else rd.read_parquet(source)
        )
    # the delta is consumed twice (id scan, then segment build): pin it
    source = source.materialize()

    import hashlib

    meta_cols = list(cfg.meta_fields)
    id_parts, sha_parts, meta_rows = [], [], []
    for b in source.iter_batches(
        batch_format="pyarrow", batch_size=cfg.batch_docs
    ):
        id_parts.append(compute_doc_ids(b, cfg))
        if cfg.sha_field and cfg.sha_field in b.column_names:
            sha_parts.extend(b[cfg.sha_field].to_pylist())
        else:
            sha_parts.extend(
                hashlib.sha256((t or "").encode("utf-8")).hexdigest()
                for t in b[cfg.text_field].to_pylist()
            )
        if meta_cols:
            cols = [
                b[f].to_pylist()
                if f in b.column_names
                else [None] * b.num_rows
                for f in meta_cols
            ]
            meta_rows.extend(zip(*cols))
    incoming = (
        np.concatenate(id_parts) if id_parts else np.empty(0, np.uint64)
    )
    uniq, counts = np.unique(incoming, return_counts=True)
    if (counts > 1).any():
        raise ValueError(
            "duplicate doc keys within one upsert delta (last-write-wins "
            "is ambiguous under parallel segment builds) — dedup first"
        )

    # phase 0: update diffing — a doc is "unchanged" only when its ENTIRE
    # stored sidecar row matches the incoming one: text sha256 AND every
    # cfg.meta_fields value (meta fields drive filter_by/facet_by, so a
    # metadata-only update must still reindex). The reference skips only
    # unchanged FIELDS per doc, never a doc any of whose fields changed
    # (src/collection.cpp:219-238, src/index.cpp:354-427). Secondary
    # cfg.indexed_fields content is NOT stored in the sidecar (only its
    # doclens), so the skip is disabled entirely for such configs.
    unchanged: set[int] = set()
    if not cfg.indexed_fields:
        incoming_row = dict(
            zip(
                incoming.tolist(),
                zip(sha_parts, meta_rows)
                if meta_cols
                else ((s, ()) for s in sha_parts),
            )
        )
        for d in segment_dirs(index_dir):
            seg_names = pq.read_schema(os.path.join(d, DOCS_FILE)).names
            read_cols = ["doc_id", "sha256"] + [
                f for f in meta_cols if f in seg_names
            ]
            t = pq.read_table(os.path.join(d, DOCS_FILE), columns=read_cols)
            seg_ids = t["doc_id"].to_numpy()
            hit = np.isin(seg_ids, uniq)
            if not hit.any():
                continue
            stored_sha = t["sha256"].to_numpy(zero_copy_only=False)
            stored_meta = {
                f: t[f].to_pylist() for f in meta_cols if f in t.column_names
            }
            for i in np.flatnonzero(hit).tolist():
                inc = incoming_row.get(int(seg_ids[i]))
                if inc is None or inc[0] != stored_sha[i]:
                    continue
                if all(
                    f in stored_meta and stored_meta[f][i] == inc[1][j]
                    for j, f in enumerate(meta_cols)
                ):
                    unchanged.add(int(seg_ids[i]))
    if unchanged:
        changed = np.array(
            sorted(set(uniq.tolist()) - unchanged), dtype=np.uint64
        )
    else:
        changed = uniq
    if changed.size == 0:
        stats["upserted_docs"] = stats.get("upserted_docs", 0)
        stats["upsert_skipped_unchanged"] = (
            stats.get("upsert_skipped_unchanged", 0) + int(len(unchanged))
        )
        with open(os.path.join(index_dir, "manifest.json"), "w") as f:
            json.dump(stats, f, indent=1)
        return stats
    if unchanged:
        changed_ref = ray.put(changed)

        def only_changed(b: pa.Table) -> pa.Table:
            keep = np.isin(compute_doc_ids(b, cfg), ray.get(changed_ref))
            return b.filter(pa.array(keep))

        source = source.map_batches(
            only_changed, batch_format="pyarrow"
        ).materialize()

    # phase 1: drop old versions (uncommitted — old manifest stays valid)
    stats = delete_by_filter(index_dir, doc_ids=changed, _commit=False)

    # phase 2: append the delta as new segments
    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 1)
    ds = source
    if ds.num_blocks() < concurrency and len(changed) > cfg.batch_docs:
        ds = ds.repartition(concurrency)
    manifests = ds.map_batches(
        SegmentWriter(index_dir, cfg),
        batch_format="pyarrow",
        batch_size=cfg.batch_docs,
        concurrency=concurrency,
        num_cpus=cfg.writer_num_cpus,
    ).take_all()

    stats["segments"] = stats["segments"] + [m["segment_id"] for m in manifests]
    stats["n_docs"] += int(sum(m["n_docs"] for m in manifests))
    stats["doclen_sum"] += int(sum(m["doclen_sum"] for m in manifests))
    stats["n_postings"] += int(sum(m["n_postings"] for m in manifests))
    stats["avgdl"] = (
        stats["doclen_sum"] / stats["n_docs"] if stats["n_docs"] else 0.0
    )
    stats["n_segments"] = len(stats["segments"])
    stats["upserted_docs"] = stats.get("upserted_docs", 0) + int(len(changed))
    stats["upsert_skipped_unchanged"] = (
        stats.get("upsert_skipped_unchanged", 0) + int(len(unchanged))
    )

    # phase 3: commit — global df over surviving + new segments, one manifest
    _refresh_global_df(index_dir, stats["segments"])
    with open(os.path.join(index_dir, "manifest.json"), "w") as f:
        json.dump(stats, f, indent=1)
    from typesense_ray.index_build import gc_segments

    gc_segments(index_dir)
    return stats
