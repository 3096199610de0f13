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
    varbyte_encode,
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
                            "pos_vb", "bm_last", "bm_max_tf", "bm_min_dl"]}
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
        cols["ids_vb"].append(varbyte_encode(delta_encode(new_ids)))
        cols["tfs_vb"].append(varbyte_encode(new_tfs.astype(np.uint64)))
        cols["pos_vb"].append(encode_positions(new_pos, new_tfs))
        last, max_tf, min_dl = block_max_meta(
            new_ids, new_tfs, doclens[new_ids.astype(np.int64)], block_size
        )
        cols["bm_last"].append([int(x) for x in last])
        cols["bm_max_tf"].append([int(x) for x in max_tf])
        cols["bm_min_dl"].append([int(x) for x in min_dl])
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


def delete_by_filter(index_dir: str, filter_by: str = "",
                     doc_ids: list[int] | None = None) -> dict:
    """Delete docs matching a ``filter_by`` expression (and/or an explicit
    id list); affected segments are compacted in place (new content-
    addressed dirs), global stats refreshed. Returns updated stats."""
    from typesense_ray.filtering import arrow_field_kind
    from typesense_ray.query import SegmentSearcher, load_stats, segment_dirs

    stats = load_stats(index_dir)
    cfg_fp = stats["config"].get("config_fingerprint") or IndexConfig(
        **{k: (tuple(v) if isinstance(v, list) else v)
           for k, v in stats["config"].items()}
    ).fingerprint()
    block_size = stats["config"].get("block_size", 128)
    seg_root = os.path.join(index_dir, "segments")

    want_ids = (
        np.array(sorted(set(doc_ids)), dtype=np.uint64)
        if doc_ids else np.empty(0, np.uint64)
    )
    new_segments = []
    n_docs = 0
    doclen_sum = 0
    n_deleted = 0
    for d in segment_dirs(index_dir):
        seg = SegmentSearcher(d)
        field_types = {
            name: arrow_field_kind(seg.docs.schema.field(name).type)
            for name in seg.docs.column_names
        }
        delete_mask = np.zeros(seg.n_docs, dtype=bool)
        if filter_by:
            clauses = parse_filter(filter_by, field_types)
            delete_mask |= eval_filters(
                seg.docs, clauses, field_types, StringTokenCache()
            )
        if want_ids.size:
            delete_mask |= np.isin(seg.doc_ids, want_ids)
        if not delete_mask.any():
            sid = os.path.basename(d)[len("seg-"):]
            m = json.load(open(os.path.join(d, MANIFEST_FILE)))
            new_segments.append(sid)
            n_docs += m["n_docs"]
            doclen_sum += m["doclen_sum"]
            continue
        n_deleted += int(delete_mask.sum())
        keep = ~delete_mask
        if not keep.any():
            continue  # whole segment deleted
        res = _compact_segment(d, keep, seg_root, cfg_fp, block_size)
        new_segments.append(res["segment_id"])
        n_docs += res["n_docs"]
        doclen_sum += res["doclen_sum"]

    stats["segments"] = new_segments
    stats["n_docs"] = n_docs
    stats["doclen_sum"] = doclen_sum
    stats["avgdl"] = (doclen_sum / n_docs) if n_docs else 0.0
    stats["n_segments"] = len(new_segments)
    stats["deleted_docs"] = stats.get("deleted_docs", 0) + n_deleted

    # refresh global df (streamed combiner merge over surviving segments)
    import pyarrow.dataset as pads
    import shutil

    df_dir = os.path.join(index_dir, "global", "df")
    shutil.rmtree(df_dir, ignore_errors=True)
    os.makedirs(df_dir, exist_ok=True)
    dfs: dict[str, int] = {}
    paths = [
        os.path.join(seg_root, f"seg-{sid}", POSTINGS_FILE) for sid in new_segments
    ]
    if paths:
        for rb in pads.dataset(paths).scanner(columns=["term", "df"]).to_batches():
            for t, v in zip(rb["term"].to_pylist(), rb["df"].to_pylist()):
                dfs[t] = dfs.get(t, 0) + v
    terms_sorted = sorted(dfs)
    pq.write_table(
        pa.table(
            {"term": pa.array(terms_sorted, pa.string()),
             "df": pa.array([dfs[t] for t in terms_sorted], pa.int64())}
        ),
        os.path.join(df_dir, "df.parquet"),
    )
    with open(os.path.join(index_dir, "manifest.json"), "w") as f:
        json.dump(stats, f, indent=1)
    return stats
