"""Document-level collection management: the reference's
``Collection::add / add_many / remove / get`` surface
(``src/collection.cpp:102-373``) and ``CollectionManager::
create_collection`` validation (``src/collection_manager.cpp:270-330``),
rebuilt over the scalable segment machinery.

Semantics ported exactly:

- actions ``create | upsert | update`` with per-record JSON results
  (``{"success": bool}`` / ``{"success": false, "error", "code",
  "document"}``) and a batch summary ``{"success", "num_imported"}``
- UPSERT/UPDATE of an existing id merges the partial document into the
  stored one (``Collection::get_doc_changes``, src/collection.cpp:219-238)
  and validates the MERGED doc — a failed update leaves the old doc
  intact
- auto ids are stringified sequence numbers; every NEW doc consumes a
  sequence slot exactly like ``get_next_seq_id`` (src/collection.cpp:133)
- validation order and error strings follow
  ``Index::validate_index_in_memory`` (src/index.cpp:249-352): default
  sorting field presence → dsf numeric type → per-declared-field
  presence/type

Ray shape: mutations are STAGED per ``add_many`` call and committed as
ONE batch through :func:`~typesense_ray.index_build.build_index` (first
commit) or :func:`~typesense_ray.ops.upsert_documents` (delta replace +
append, parallel segment surgery); existence probes for a batch are one
vectorized ``is_in`` scan over the segment sidecars, never a per-record
lookup. Driver state is bounded by the delta size, not the corpus.

Divergence (documented): extra keys not declared in the schema are
accepted but not persisted (the stored row is the declared schema); the
reference stores the raw JSON blob in RocksDB.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from typesense_ray.validate import (
    VALID_FIELD_TYPES,
    FieldSpec,
    _check,
    type_error,
)

_ARROW_TYPES = {
    "string": pa.string(),
    "int32": pa.int64(),  # validated to int32 range, stored wide
    "int64": pa.int64(),
    "float": pa.float64(),
    "bool": pa.bool_(),
}


def _arrow_type(ftype: str) -> pa.DataType:
    if ftype.endswith("[]"):
        return pa.list_(_ARROW_TYPES[ftype[:-2]])
    return _ARROW_TYPES[ftype]


# re-exported for compatibility; defined dependency-free in errors.py so
# the stdlib-only auth/config layers need not import this module's
# numpy/pyarrow stack
from typesense_ray.errors import DocumentError  # noqa: E402,F401


def prune_document(doc: dict, include=(), exclude=()) -> dict:
    """``Collection::prune_document`` (src/collection.cpp:1716-1730):
    keep keys in ``include`` (all keys when empty), then drop keys in
    ``exclude`` — exclusion wins."""
    include = set(include)
    exclude = set(exclude)
    return {
        k: v for k, v in doc.items()
        if (not include or k in include) and k not in exclude
    }


class ManagedCollection:
    """A named, mutable collection over one index directory."""

    def __init__(self, name: str, index_dir: str, fields: list[FieldSpec],
                 default_sorting_field: str | None = None, *,
                 created_at: int = 0):
        for f in fields:
            if f.type not in VALID_FIELD_TYPES:
                raise DocumentError(
                    400,
                    f"Field `{f.name}` has an invalid data type `{f.type}`,"
                    f" see docs for supported data types.",
                )
        by_name = {f.name: f for f in fields}
        if default_sorting_field:
            spec = by_name.get(default_sorting_field)
            if spec is None:
                raise DocumentError(
                    400,
                    f"Default sorting field is defined as "
                    f"`{default_sorting_field}` but is not found in the "
                    f"schema.",
                )
            if spec.optional:
                raise DocumentError(
                    400,
                    f"Default sorting field `{default_sorting_field}` "
                    f"cannot be an optional field.",
                )
            if spec.type not in ("int32", "int64", "float"):
                raise DocumentError(
                    400,
                    f"Default sorting field `{default_sorting_field}` "
                    f"must be a single valued numerical field.",
                )
        self.name = name
        self.index_dir = index_dir
        self.fields = list(fields)
        self._by_name = by_name
        self.default_sorting_field = default_sorting_field
        self.created_at = int(created_at)
        self.collection_id: int | None = None  # set by the registry
        # the next auto-id sequence slot. Persisted alongside the INDEX
        # on every commit (next_seq.json) — the registry snapshot alone
        # is only written on explicit save(), so restarting from a stale
        # snapshot must not rewind the sequence and silently overwrite
        # docs whose auto ids were consumed after the snapshot (the
        # reference derives next_seq from the durable store itself,
        # src/collection.cpp:133)
        self._next_seq = 0
        seq_fp = os.path.join(index_dir, "next_seq.json")
        if os.path.exists(seq_fp):
            with open(seq_fp) as f:
                self._next_seq = int(json.load(f)["next_seq"])
        self._searcher = None
        from typesense_ray.collection import SynonymIndex

        self.synonyms = SynonymIndex()
        self.overrides: list = []

        string_scalars = [f.name for f in fields if f.type == "string"]
        text_field = string_scalars[0] if string_scalars else "__primary"
        indexed = tuple(
            f.name for f in fields
            if f.type in ("string", "string[]") and f.name != text_field
        )
        from typesense_ray.index_build import IndexConfig

        self.cfg = IndexConfig(
            text_field=text_field,
            id_field="id",
            sha_field=None,
            batch_docs=256,
            meta_fields=("id",) + tuple(f.name for f in fields),
            indexed_fields=indexed,
        )

    # -- views ---------------------------------------------------------

    @property
    def _has_index(self) -> bool:
        return os.path.exists(os.path.join(self.index_dir, "manifest.json"))

    @property
    def searcher(self):
        """The read view over the committed index (rebuilt after each
        commit — segments are immutable, so reopening is metadata-only)."""
        from typesense_ray.collection import RayCollection

        if self._searcher is None:
            if not self._has_index:
                return None
            self._searcher = RayCollection(
                self.index_dir,
                default_sorting_field=self.default_sorting_field,
                synonyms=self.synonyms,
                overrides=self.overrides,
            )
        return self._searcher

    # registry save() duck-types on `_local` for the index_dir
    @property
    def _local(self):
        return self.searcher._local

    @property
    def num_documents(self) -> int:
        s = self.searcher
        return int(s.stats["n_docs"]) if s is not None else 0

    def get_summary_json(self) -> dict:
        return {
            "name": self.name,
            "num_documents": self.num_documents,
            "created_at": self.created_at,
            "fields": [
                {"name": f.name, "type": f.type, "facet": f.facet,
                 "optional": f.optional}
                for f in self.fields
            ],
            "default_sorting_field": self.default_sorting_field or "",
        }

    # -- lookups -------------------------------------------------------

    def _lookup_docs(self, ids: list[str]) -> dict[str, dict]:
        """Batch id → stored-doc probe: ONE vectorized ``isin`` scan over
        the segment doc sidecars (already resident Arrow tables) — the
        delta-sized analogue of the reference's per-id RocksDB gets."""
        s = self.searcher
        if s is None or not ids:
            return {}
        from typesense_ray.index_build import doc_id_from_key

        want = np.unique(
            np.array([doc_id_from_key(i) for i in ids], dtype=np.uint64)
        )
        out: dict[str, dict] = {}
        for seg in s.segments:
            seg_ids = seg.docs["doc_id"].to_numpy()
            hit = np.isin(seg_ids, want)
            if not hit.any():
                continue
            rows = seg.docs.filter(pa.array(hit))
            for row in rows.to_pylist():
                out[row["id"]] = {
                    k: v for k, v in row.items()
                    if v is not None and (k == "id" or k in self._by_name)
                }
        return out

    def get(self, doc_id: str) -> dict:
        found = self._lookup_docs([doc_id]).get(doc_id)
        if found is None:
            raise DocumentError(
                404, f"Could not find a document with id: {doc_id}"
            )
        return found

    # -- validation (Index::validate_index_in_memory order) -------------

    def _validate_doc(self, doc: dict) -> None:
        dsf = self.default_sorting_field
        if dsf:
            if dsf not in doc:
                raise DocumentError(
                    400,
                    f"Field `{dsf}` has been declared as a default sorting"
                    f" field, but is not found in the document.",
                )
            v = doc[dsf]
            if isinstance(v, bool) or not isinstance(v, (int, float)):
                raise DocumentError(
                    400,
                    f"Default sorting field `{dsf}` must be a single "
                    f"valued numerical field.",
                )
        for f in self.fields:
            if f.name not in doc:
                if not f.optional:
                    raise DocumentError(
                        400,
                        f"Field `{f.name}` has been declared in the "
                        f"schema, but is not found in the document.",
                    )
                continue
            if not _check(doc[f.name], f.type):
                raise DocumentError(400, type_error(f.name, f.type))

    # -- mutation ------------------------------------------------------

    def _to_doc(self, record, action: str, id_param: str,
                stored: dict[str, dict], staged: dict[str, dict]):
        """``Collection::to_doc`` (src/collection.cpp:102-171): parse,
        id resolution/assignment, action-vs-existence checks. Returns
        (doc, doc_id, is_new)."""
        if isinstance(record, str):
            try:
                doc = json.loads(record)
            except Exception as e:
                raise DocumentError(400, f"Bad JSON: {e}") from None
        else:
            doc = dict(record)
        if not isinstance(doc, dict):
            raise DocumentError(400, "Bad JSON: not a properly formed document.")
        if "id" in doc and id_param and doc["id"] != id_param:
            raise DocumentError(
                400,
                "The `id` of the resource does not match the `id` in the"
                " JSON body.",
            )
        if "id" not in doc and id_param:
            doc["id"] = id_param
        if "id" in doc and doc["id"] == "":
            raise DocumentError(400, "The `id` should not be empty.")
        if "id" not in doc:
            if action == "update":
                raise DocumentError(
                    400, "For update, the `id` key must be provided."
                )
            seq = self._next_seq
            self._next_seq += 1
            doc["id"] = str(seq)
            return doc, doc["id"], True
        if not isinstance(doc["id"], str):
            raise DocumentError(
                400, "Document's `id` field should be a string."
            )
        doc_id = doc["id"]
        exists = doc_id in staged or doc_id in stored
        if exists:
            if action == "create":
                raise DocumentError(
                    409, f"A document with id {doc_id} already exists."
                )
            return doc, doc_id, False
        if action == "update":
            raise DocumentError(
                404, f"Could not find a document with id: {doc_id}"
            )
        self._next_seq += 1
        return doc, doc_id, True

    def add_many(self, records, action: str = "create",
                 id_param: str = "", docs_out: list | None = None
                 ) -> tuple[dict, list[dict]]:
        """Batch import. Returns (summary, per-record results) — the
        reference's ``add_many`` response plus its overwritten
        ``json_lines`` result stream."""
        records = list(records)
        # one batched existence probe for every explicit string id
        probe_ids = []
        for r in records:
            try:
                d = json.loads(r) if isinstance(r, str) else r
            except Exception:
                continue
            if isinstance(d, dict) and isinstance(d.get("id"), str):
                probe_ids.append(d["id"])
        if id_param:
            probe_ids.append(id_param)
        stored = self._lookup_docs(probe_ids)

        results: list[dict] = []
        staged: dict[str, dict] = {}
        num_ok = 0
        for r in records:
            # default=repr: one non-JSON-serializable dict must yield a
            # per-record error, not a TypeError aborting the whole batch
            raw = r if isinstance(r, str) else json.dumps(r, default=repr)
            try:
                doc, doc_id, is_new = self._to_doc(
                    r, action, id_param, stored, staged
                )
                if not is_new:
                    old = staged.get(doc_id) or stored[doc_id]
                    doc = {**old, **doc}
                self._validate_doc(doc)
            except DocumentError as e:
                results.append(
                    {"success": False, "error": str(e), "code": e.code,
                     "document": raw}
                )
                continue
            staged[doc_id] = doc
            results.append({"success": True})
            if docs_out is not None:
                docs_out.append(doc)
            num_ok += 1
        if staged:
            self._commit(list(staged.values()))
        return (
            {"success": num_ok == len(records), "num_imported": num_ok},
            results,
        )

    def add(self, record, action: str = "create", id_param: str = "") -> dict:
        """Returns the committed document (id assigned / merged) — the
        reference's ``Collection::add`` contract."""
        docs: list[dict] = []
        summary, results = self.add_many([record], action, id_param,
                                         docs_out=docs)
        if not summary["success"]:
            raise DocumentError(results[0]["code"], results[0]["error"])
        return docs[0]

    def remove(self, doc_id: str) -> dict:
        doc = self.get(doc_id)  # 404 when missing
        self._delete_ids([doc_id])
        return doc

    def remove_if_found(self, doc_id) -> bool:
        doc_id = str(doc_id)
        if not self._lookup_docs([doc_id]):
            return False
        self._delete_ids([doc_id])
        return True

    def remove_by_filter(self, filter_by: str) -> int:
        """Delete every doc matching ``filter_by``; returns the number
        removed. The reference's ``stateful_remove_docs``
        (``src/core_api.cpp``, test/core_api_utils_test.cpp:36-118)
        drains the matched id list in small batches to keep its
        single-threaded event loop responsive; here the whole delete is
        ONE parallel pass over the affected segments
        (:func:`~typesense_ray.ops.delete_by_filter`), so no resumable
        offset state is needed — the observable result (matched docs
        gone, count reported, malformed filter rejected with the
        reference's message) is identical."""
        from typesense_ray.filtering import parse_filter
        from typesense_ray.ops import delete_by_filter

        s = self.searcher
        if s is None:
            return 0
        # validate up front — the reference's get_filter_ids fails fast
        parse_filter(filter_by, s.field_types)
        before = int(s.stats["n_docs"])
        stats = delete_by_filter(self.index_dir, filter_by=filter_by)
        self._searcher = None
        return before - int(stats["n_docs"])

    def _delete_ids(self, ids: list[str]) -> None:
        from typesense_ray.index_build import doc_id_from_key
        from typesense_ray.ops import delete_by_filter

        delete_by_filter(
            self.index_dir,
            doc_ids=[doc_id_from_key(i) for i in ids],
        )
        self._searcher = None

    def _to_table(self, docs: list[dict]) -> pa.Table:
        cols = {"id": pa.array([d["id"] for d in docs], pa.string())}
        if self.cfg.text_field == "__primary":
            cols["__primary"] = pa.array([""] * len(docs), pa.string())
        for f in self.fields:
            vals = [d.get(f.name) for d in docs]
            if f.type == "float":
                vals = [float(v) if v is not None else None for v in vals]
            elif f.type == "float[]":
                vals = [
                    [float(x) for x in v] if v is not None else None
                    for v in vals
                ]
            cols[f.name] = pa.array(vals, _arrow_type(f.type))
        return pa.table(cols)

    def _commit(self, docs: list[dict]) -> None:
        import ray.data as rd

        from typesense_ray.index_build import build_index
        from typesense_ray.ops import upsert_documents

        tbl = self._to_table(docs)
        if not self._has_index:
            build_index(rd.from_arrow(tbl), self.index_dir, self.cfg,
                        concurrency=2)
        else:
            upsert_documents(rd.from_arrow(tbl), self.index_dir)
        with open(os.path.join(self.index_dir, "next_seq.json"), "w") as f:
            json.dump({"next_seq": self._next_seq}, f)
        self._searcher = None

    # -- search (declared-schema-aware validation, then delegate) -------

    _EMPTY = {"found": 0, "hits": [], "page": 1, "out_of": 0,
              "facet_counts": []}

    def search(self, q: str, **kw) -> dict:
        from typesense_ray.collection import parse_sort_by

        for sf in parse_sort_by(kw.get("sort_by")):
            spec = self._by_name.get(sf.name)
            if spec is not None and spec.optional:
                raise ValueError(
                    f"Cannot sort by `{sf.name}` as it is defined as an "
                    f"optional field."
                )
        # ':=' on a string field requires the facet flag — the reference
        # 400s at filter parse (src/collection.cpp:1863-1869,
        # test/collection_faceting_test.cpp:161-164). This propagates as
        # an error (unlike malformed filter values, which the search path
        # swallows into zero hits)
        for block in (kw.get("filter_by") or "").split("&&"):
            if ":" not in block:
                continue
            fname, raw = block.split(":", 1)
            spec = self._by_name.get(fname.strip())
            if (spec is not None and spec.type in ("string", "string[]")
                    and raw.strip().startswith("=") and not spec.facet):
                raise ValueError(
                    f"To perform exact filtering, filter field "
                    f"`{spec.name}` must be a facet field."
                )
        # the reference resolves facet_by against facet_schema — declared
        # fields that are not facet-flagged give the same 404 as unknown
        # names (CollectionTest.SearchingWithMissingFields)
        for f in (kw.get("facet_by") or "").split(","):
            f = f.strip()
            if f and not getattr(self._by_name.get(f), "facet", False):
                raise ValueError(
                    f"Could not find a facet field named `{f}` in the "
                    f"schema."
                )
        s = self.searcher
        if s is None:
            return dict(self._EMPTY)
        return s.search(q, **kw)

    def get_document(self, *a, **kw):
        s = self.searcher
        return None if s is None else s.get_document(*a, **kw)

    # -- curation (same upsert-by-rule_id semantics as the read view,
    # src/collection.cpp:2120-2156; the cached searcher is dropped so
    # the next search sees the current override set) ------------------

    def add_synonym_json(self, obj: dict) -> str:
        """Upsert a synonym definition and invalidate the read view in
        one step — library callers mutating ``self.synonyms`` directly
        would keep serving a stale searcher with the old synonym set."""
        sid = self.synonyms.add_json(obj)
        self._searcher = None
        return sid

    def remove_synonym(self, syn_id: str) -> None:
        self.synonyms.remove_synonym(syn_id)
        self._searcher = None

    def add_override(self, ov) -> None:
        if ov.rule_id is not None:
            self.overrides[:] = [
                o for o in self.overrides if o.rule_id != ov.rule_id
            ]
        self.overrides.append(ov)
        self._searcher = None

    def remove_override(self, rule_id: str) -> None:
        self.overrides[:] = [
            o for o in self.overrides if o.rule_id != rule_id
        ]
        self._searcher = None
