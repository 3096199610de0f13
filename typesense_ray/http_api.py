"""HTTP/REST facade: the reference's route table + request dispatch
(``src/main/typesense_server.cpp:15-66``, ``src/http_server.cpp:330-380``)
and every ``core_api.cpp`` handler, rebuilt over
:class:`~typesense_ray.collection.CollectionRegistry` /
:class:`~typesense_ray.manager.ManagedCollection` /
:class:`~typesense_ray.auth.AuthManager`.

Semantics ported exactly:

- the full route table in registration order (order decides matching,
  ``include/http_server.h:63-64``), ``:param`` capture with the C++
  ``map::emplace`` quirk — a query-string param of the same name WINS
  over the path segment (``src/http_server.cpp:367-372``)
- ``resource:operation`` action derivation (``route_path::_get_action``,
  ``include/http_data.h:271-320``; AuthManagerTest.GenerationOfAPIAction)
- authentication order (``CollectionManager::auth_key_matches``,
  ``src/collection_manager.cpp:259-274``): bootstrap key first, then the
  managed/scoped key matrix; ``/health`` needs no auth
  (``core_api.cpp:23-26``); the key is read from the
  ``x-typesense-api-key`` header, falling back to the GET parameter
  (``src/http_server.cpp:348-356``); failures are
  ``401 {"message": "Forbidden - a valid ..."}``
- per-handler status codes and bodies: 201 on create, ``{"message"}``
  error envelopes (``http_res::set_*``, include/http_data.h:98-141),
  search-time default/validation matrix (``get_search``,
  core_api.cpp:252-571) including `max_hits=all`, the facet-query
  per_page=0 default, JSONP ``callback`` wrapping, and
  ``search_time_ms`` / ``page`` injection
- import/export as JSONL bodies (one result object per input line for
  import, one stored doc per line for export)

Ray shape: this layer is driver-side METADATA only — route parsing,
auth and JSON envelopes. Every data-touching call delegates to the same
distributed machinery the library callers use (`ManagedCollection`
commits via ``build_index``/``upsert_documents`` actor pools; search
runs the segment-parallel query path), so the facade adds no new scale
surface. Single-shot request/response (no h2o streaming): export
builds its body from the streaming export Dataset's batches; a
multi-node deployment would put this facade on each head/serving node
behind a load balancer, which is out of scope here.

``serve()`` runs it on stdlib ``ThreadingHTTPServer`` — no third-party
HTTP dependency.
"""

from __future__ import annotations

import json
import re
import secrets
import time
from urllib.parse import parse_qsl, urlsplit

from typesense_ray.auth import FAR_FUTURE_TIMESTAMP, ApiKey, AuthManager
from typesense_ray.errors import DocumentError

AUTH_HEADER = "x-typesense-api-key"  # include/http_server.h:163
VERSION = "0.15.0"  # the reference snapshot's version string

# The reference's route table in registration order
# (src/main/typesense_server.cpp:15-66). Method, path pattern, handler
# attribute on ApiServer. Order matters: `documents/search` and
# `documents/export` are registered before `documents/:id`.
ROUTES: list[tuple[str, str, str]] = [
    ("GET", "/collections/:collection/documents/search", "get_search"),
    ("POST", "/collections/:collection/documents", "post_add_document"),
    ("DELETE", "/collections/:collection/documents", "del_remove_documents"),
    ("POST", "/collections/:collection/documents/import",
     "post_import_documents"),
    ("GET", "/collections/:collection/documents/export",
     "get_export_documents"),
    ("GET", "/collections/:collection/documents/:id", "get_fetch_document"),
    ("PATCH", "/collections/:collection/documents/:id",
     "patch_update_document"),
    ("DELETE", "/collections/:collection/documents/:id",
     "del_remove_document"),
    ("GET", "/collections/:collection/overrides", "get_overrides"),
    ("GET", "/collections/:collection/overrides/:id", "get_override"),
    ("PUT", "/collections/:collection/overrides/:id", "put_override"),
    ("DELETE", "/collections/:collection/overrides/:id", "del_override"),
    ("GET", "/collections/:collection/synonyms", "get_synonyms"),
    ("GET", "/collections/:collection/synonyms/:id", "get_synonym"),
    ("PUT", "/collections/:collection/synonyms/:id", "put_synonym"),
    ("DELETE", "/collections/:collection/synonyms/:id", "del_synonym"),
    ("POST", "/collections", "post_create_collection"),
    ("GET", "/collections", "get_collections"),
    ("DELETE", "/collections/:collection", "del_drop_collection"),
    ("GET", "/collections/:collection", "get_collection_summary"),
    ("GET", "/aliases", "get_aliases"),
    ("GET", "/aliases/:alias", "get_alias"),
    ("PUT", "/aliases/:alias", "put_upsert_alias"),
    ("DELETE", "/aliases/:alias", "del_alias"),
    ("GET", "/keys", "get_keys"),
    ("GET", "/keys/:id", "get_key"),
    ("POST", "/keys", "post_create_key"),
    ("DELETE", "/keys/:id", "del_key"),
    ("GET", "/metrics.json", "get_metrics_json"),
    ("GET", "/debug", "get_debug"),
    ("GET", "/health", "get_health"),
    ("POST", "/health", "post_health"),
    ("GET", "/sequence", "get_log_sequence"),
    ("POST", "/operations/snapshot", "post_snapshot"),
]


def route_action(http_method: str, path_parts: list[str]) -> str:
    """``route_path::_get_action`` (include/http_data.h:271-320):
    derive the ``resource:operation`` auth action from a route pattern.
    Verified against AuthManagerTest.GenerationOfAPIAction
    (test/auth_manager_test.cpp:192-216)."""
    identifier_index = 0
    for i, part in enumerate(path_parts):
        if part.startswith(":"):
            identifier_index = i
    if identifier_index == 0:
        resource_index = len(path_parts) - 1
    elif identifier_index == len(path_parts) - 1:
        resource_index = identifier_index - 1
    else:
        resource_index = identifier_index + 1

    resource = path_parts[resource_index]
    if (resource_index != len(path_parts) - 1
            and not path_parts[resource_index + 1].startswith(":")):
        # e.g. /collections/:collection/documents/search
        operation = path_parts[resource_index + 1]
    elif http_method == "GET":
        operation = "list" if resource_index == len(path_parts) - 1 else "get"
    elif http_method == "POST":
        operation = "create"
    elif http_method == "PUT":
        operation = "upsert"
    elif http_method == "DELETE":
        operation = "delete"
    else:
        operation = "unknown"
    return f"{resource}:{operation}"


def _is_uint(s: str) -> bool:
    """``StringUtils::is_uint32_t`` (include/string_utils.h:182-190,
    StringUtilsTest.UInt32Validation): ASCII digits only, no sign
    (strtoul never consumes non-ASCII digits like '４２'), and the
    value must fit in uint32 (strtoul overflow → ULONG_MAX → reject)."""
    return bool(s) and s.isascii() and s.isdigit() and int(s) <= 0xFFFFFFFF


def _message(status: int, text: str) -> tuple[int, str]:
    return status, json.dumps({"message": text})


def _json_ok(status: int, obj) -> tuple[int, str]:
    return status, json.dumps(obj)


class _HandlerError(Exception):
    """Short-circuit a handler with (status, body)."""

    def __init__(self, status: int, body: str):
        super().__init__(body)
        self.status = status
        self.body = body


def _bad_request(text: str):
    raise _HandlerError(*_message(400, text))


def _not_found():
    raise _HandlerError(*_message(404, "Not Found"))


class ApiServer:
    """Framework-free request handler: ``handle()`` takes (method,
    path-with-query, body, headers) and returns ``(status, body,
    content_type)`` — directly testable without sockets, served by
    :func:`serve`."""

    def __init__(self, registry, auth: AuthManager | None = None,
                 bootstrap_key: str | None = None):
        self.registry = registry
        self.auth = auth if auth is not None else AuthManager()
        self.bootstrap_key = bootstrap_key
        self.started_at = time.time()
        # monotonically increasing mutation sequence (GET /sequence — the
        # reference reports the store's latest seq number)
        self.seq_num = 0
        # the reference serializes every handler on one h2o event loop;
        # ThreadingHTTPServer is multi-threaded, so mutating handlers
        # take this lock (key ids, seq_num, registry dicts, keys.json
        # writes would otherwise race). GETs stay lock-free — searches
        # snapshot their searcher reference up front.
        import threading

        self._write_lock = threading.RLock()

    # ------------------------------------------------------------------
    # dispatch
    # ------------------------------------------------------------------

    def handle(self, method: str, path: str, body: str = "",
               headers: dict[str, str] | None = None
               ) -> tuple[int, str, str]:
        split = urlsplit(path)
        path_parts = [p for p in split.path.split("/") if p]
        params = {k: v for k, v in
                  parse_qsl(split.query, keep_blank_values=True)}

        match = self._find_route(method, path_parts)
        if match is None:
            # src/http_server.cpp:361-364 (space after '{' kept verbatim)
            return 404, '{ "message": "Not Found"}', "application/json"
        pattern_parts, handler_name = match

        # path params: map::emplace — query-string value wins on clash
        for pat, part in zip(pattern_parts, path_parts):
            if pat.startswith(":"):
                params.setdefault(pat[1:], part)

        headers = {k.lower(): v for k, v in (headers or {}).items()}
        api_key = headers.get(AUTH_HEADER, params.get(AUTH_HEADER, ""))

        if not self._authenticate(handler_name, method, pattern_parts,
                                  params, api_key):
            return (401,
                    json.dumps({"message": f"Forbidden - a valid "
                                f"`{AUTH_HEADER}` header must be sent."}),
                    "application/json")

        handler = getattr(self, handler_name)
        content_type = "application/json; charset=utf-8"
        try:
            if method == "GET":
                result = handler(params, body)
            else:
                with self._write_lock:
                    result = handler(params, body)
        except _HandlerError as e:
            return e.status, e.body, content_type
        except DocumentError as e:
            status, body_out = _message(e.code, str(e))
            return status, body_out, content_type
        except ValueError as e:
            status, body_out = _message(_status_for(str(e)), str(e))
            return status, body_out, content_type
        if len(result) == 3:
            return result
        status, body_out = result
        return status, body_out, content_type

    def _find_route(self, method: str, path_parts: list[str]):
        for r_method, pattern, handler_name in ROUTES:
            if r_method != method:
                continue
            pattern_parts = [p for p in pattern.split("/") if p]
            if len(pattern_parts) != len(path_parts):
                continue
            if all(pat.startswith(":") or pat == part
                   for pat, part in zip(pattern_parts, path_parts)):
                return pattern_parts, handler_name
        return None

    def _authenticate(self, handler_name: str, method: str,
                      pattern_parts: list[str], params: dict,
                      api_key: str) -> bool:
        """``handle_authentication`` (core_api.cpp:13-29) +
        ``auth_key_matches`` (collection_manager.cpp:259-274)."""
        if handler_name == "get_health":
            return True
        if self.bootstrap_key is None and not self.auth.has_keys():
            # no keys configured at all: open mode (test/dev), like
            # running the reference without --api-key enforcement
            return True
        if not api_key:
            return False
        if self.bootstrap_key is not None and api_key == self.bootstrap_key:
            return True
        action = route_action(method, pattern_parts)
        collection = params.get("collection", "*")
        return self.auth.authenticate(api_key, action, collection, params)

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------

    def _collection(self, params: dict):
        coll = self.registry.get_collection(params.get("collection", ""))
        if coll is None:
            _not_found()
        return coll

    def _parse_json(self, body: str):
        try:
            return json.loads(body)
        except Exception:
            _bad_request("Bad JSON.")

    # ------------------------------------------------------------------
    # collections (core_api.cpp:43-189, 573-586)
    # ------------------------------------------------------------------

    def get_collections(self, params, body):
        return _json_ok(200, [c.get_summary_json()
                              for c in self.registry.get_collections()])

    def post_create_collection(self, params, body):
        from typesense_ray.validate import FieldSpec

        req = self._parse_json(body)
        if not isinstance(req, dict):
            _bad_request("Bad JSON.")
        if "name" not in req:
            _bad_request("Parameter `name` is required.")
        if not isinstance(req["name"], str):
            # the reference's .get<std::string>() would throw here; an
            # unhashable name must not crash the registry lookup and a
            # non-string hashable one would create an unroutable entry
            _bad_request("Bad JSON.")
        if "fields" not in req:
            _bad_request("Parameter `fields` is required.")
        if "default_sorting_field" not in req:
            _bad_request("Parameter `default_sorting_field` is required.")
        if not isinstance(req["default_sorting_field"], str):
            _bad_request("`default_sorting_field` should be a string. It "
                         "should be the name of an int32/float field.")
        if self.registry.get_collection(req["name"]) is not None:
            raise _HandlerError(*_message(
                409, f"Collection with name `{req['name']}` already "
                     f"exists."))
        fields_json = req["fields"]
        if not isinstance(fields_json, list) or not fields_json:
            _bad_request('Wrong format for `fields`. It should be an array '
                         'like: [{"name": "<field_name>", "type": '
                         '"<field_type>"}]')
        specs = []
        for fj in fields_json:
            if (not isinstance(fj, dict) or "name" not in fj
                    or "type" not in fj
                    or not isinstance(fj["name"], str)
                    or not isinstance(fj["type"], str)):
                _bad_request("Wrong format for `fields`. It should be an "
                             "array of objects containing `name`, `type` "
                             "and optionally, `facet` properties.")
            if "facet" in fj and not isinstance(fj["facet"], bool):
                _bad_request(f"The `facet` property of the field "
                             f"`{fj['name']}` should be a boolean.")
            specs.append(FieldSpec(fj["name"], fj["type"],
                                   facet=bool(fj.get("facet", False)),
                                   optional=bool(fj.get("optional", False))))
        coll = self.registry.create_collection(
            req["name"], specs, req["default_sorting_field"] or None,
            created_at=int(time.time()))
        self.seq_num += 1
        return _json_ok(201, coll.get_summary_json())

    def del_drop_collection(self, params, body):
        coll = self._collection(params)
        summary = coll.get_summary_json()
        # registry.drop resolves aliases like get_collection does, so a
        # DELETE via an alias drops the target, never a silent no-op
        self.registry.drop_collection(params["collection"])
        self.seq_num += 1
        return _json_ok(200, summary)

    def get_collection_summary(self, params, body):
        return _json_ok(200, self._collection(params).get_summary_json())

    # ------------------------------------------------------------------
    # search (core_api.cpp:252-571)
    # ------------------------------------------------------------------

    _UINT_PARAMS = (
        "drop_tokens_threshold", "typo_tokens_threshold", "num_typos",
        "per_page", "page", "max_hits", "max_facet_values",
        "snippet_threshold", "highlight_affix_num_tokens", "group_limit",
    )

    def get_search(self, params, body):
        began = time.time()
        p = dict(params)
        p.setdefault("num_typos", "2")
        p.setdefault("prefix", "true")
        p.setdefault("drop_tokens_threshold", "10")   # Index constants
        p.setdefault("typo_tokens_threshold", "100")
        if "q" not in p:
            _bad_request("Parameter `q` is required.")
        p.setdefault("max_facet_values", "10")
        p.setdefault("facet_query", "")
        if p.get("max_hits") == "all":
            p["max_hits"] = "100000000"
        p.setdefault("max_hits", "250")
        p.setdefault("snippet_threshold", "30")
        p.setdefault("highlight_affix_num_tokens", "4")
        p.setdefault("highlight_full_fields", "")
        p.setdefault("highlight_start_tag", "<mark>")
        p.setdefault("highlight_end_tag", "</mark>")
        # facet-query default: hits suppressed unless overridden
        p.setdefault("per_page", "10" if not p["facet_query"] else "0")
        p.setdefault("page", "1")
        p.setdefault("group_by", "")
        p.setdefault("group_limit", "3" if p["group_by"] else "0")

        weights = []
        if p.get("query_by_weights"):
            for w in p["query_by_weights"].split(","):
                if not _is_uint(w):
                    _bad_request("Parameter `query_by_weights` must be a "
                                 "comma separated string of unsigned "
                                 "integers.")
                weights.append(int(w))
        for name in self._UINT_PARAMS:
            if not _is_uint(p[name]):
                _bad_request(f"Parameter `{name}` must be an unsigned "
                             f"integer.")

        sort_parts = []
        if p.get("sort_by"):
            sort_parts = p["sort_by"].split(",")
            if len(sort_parts) > 2:
                _bad_request("Only upto 2 sort fields are allowed.")
            for piece in sort_parts:
                if len(piece.split(":")) != 2:
                    _bad_request("Parameter `sort_by` is malformed.")

        coll = self._collection(params)
        query_by = [f for f in p.get("query_by", "").split(",") if f]
        include_fields = [f for f in p.get("include_fields", "").split(",")
                          if f]
        exclude_fields = [f for f in p.get("exclude_fields", "").split(",")
                          if f]
        rank = p.get("rank_tokens_by", "DEFAULT_SORTING_FIELD").upper()
        token_order = ("max_score" if rank == "DEFAULT_SORTING_FIELD"
                       else "frequency")

        kw = dict(
            filter_by=p.get("filter_by", ""),
            facet_by=p.get("facet_by", ""),
            facet_query=p["facet_query"],
            max_facet_values=int(p["max_facet_values"]),
            page=int(p["page"]),
            per_page=int(p["per_page"]),
            group_by=p["group_by"],
            include_fields=include_fields or None,
            exclude_fields=exclude_fields or None,
            drop_tokens_threshold=int(p["drop_tokens_threshold"]),
            typo_tokens_threshold=int(p["typo_tokens_threshold"]),
            num_typos=int(p["num_typos"]),
            prefix=p["prefix"] == "true",
            token_order=token_order,
            max_hits=int(p["max_hits"]),
            snippet_threshold=int(p["snippet_threshold"]),
            highlight_affix_num_tokens=int(p["highlight_affix_num_tokens"]),
            highlight_full_fields=p["highlight_full_fields"],
            highlight_start_tag=p["highlight_start_tag"],
            highlight_end_tag=p["highlight_end_tag"],
            pinned_hits=p.get("pinned_hits", ""),
            hidden_hits=p.get("hidden_hits", ""),
            mode=p.get("mode", "reference"),
        )
        if p["group_by"]:
            kw["group_limit"] = int(p["group_limit"])
        if p.get("sort_by"):
            kw["sort_by"] = p["sort_by"]
        if query_by:
            kw["query_by"] = query_by
        if weights:
            kw["query_by_weights"] = weights

        try:
            result = coll.search(p["q"], **kw)
        except (ValueError, DocumentError) as e:
            status = (e.code if isinstance(e, DocumentError)
                      else _status_for(str(e)))
            err = json.dumps({"message": str(e)})
            if "callback" in p:
                err = f"{p['callback']}({err});"
            raise _HandlerError(status, err) from None
        result["search_time_ms"] = int((time.time() - began) * 1000)
        result["page"] = int(p["page"])
        out = json.dumps(result)
        if "callback" in p:
            out = f"{p['callback']}({out});"
        return 200, out

    # ------------------------------------------------------------------
    # documents (core_api.cpp:588-985)
    # ------------------------------------------------------------------

    def post_add_document(self, params, body):
        action = params.get("action", "create")
        if action not in ("create", "update", "upsert"):
            _bad_request("Parameter `action` must be a "
                         "create|update|upsert.")
        coll = self._collection(params)
        self._parse_json(body)  # Bad JSON → 400 before touching the index
        doc = coll.add(body, action=action)
        self.seq_num += 1
        return _json_ok(201, doc)

    def patch_update_document(self, params, body):
        """``patch_update_document`` (core_api.cpp:808-828): partial
        update of one document by id; 201 with the merged doc."""
        coll = self._collection(params)
        self._parse_json(body)
        doc = coll.add(body, action="update", id_param=params["id"])
        self.seq_num += 1
        return _json_ok(201, doc)

    def get_fetch_document(self, params, body):
        coll = self._collection(params)
        return _json_ok(200, coll.get(params["id"]))

    def del_remove_document(self, params, body):
        coll = self._collection(params)
        doc = coll.remove(params["id"])
        self.seq_num += 1
        return _json_ok(200, doc)

    def del_remove_documents(self, params, body):
        coll = self._collection(params)
        batch_size = params.get("batch_size", "40")
        if "filter_by" not in params:
            _bad_request("Parameter `filter_by` must be provided.")
        if not _is_uint(batch_size) or int(batch_size) == 0:
            _bad_request("Parameter `batch_size` must be a positive "
                         "integer.")
        removed = coll.remove_by_filter(params["filter_by"])
        self.seq_num += 1
        return _json_ok(200, {"num_deleted": removed})

    def post_import_documents(self, params, body):
        action = params.get("action", "create")
        batch_size = params.get("batch_size", "40")
        if not _is_uint(batch_size) or int(batch_size) == 0:
            _bad_request("Parameter `batch_size` must be a positive "
                         "integer.")
        if action not in ("create", "update", "upsert"):
            _bad_request("Parameter `action` must be a "
                         "create|update|upsert.")
        coll = self._collection(params)
        lines = [ln for ln in body.split("\n") if ln.strip()]
        _, results = coll.add_many(lines, action=action)
        self.seq_num += 1
        out = "\n".join(json.dumps(r) for r in results)
        return 200, out, "text/plain; charset=utf8"

    def get_export_documents(self, params, body):
        coll = self._collection(params)
        s = coll.searcher
        rows: list[str] = []
        if s is not None:
            from typesense_ray.ops import export_documents

            declared = {f.name for f in coll.fields} | {"id"}
            ds = export_documents(coll.index_dir,
                                  columns=sorted(declared))
            for batch in ds.iter_batches(batch_format="pyarrow"):
                for row in batch.to_pylist():
                    rows.append(json.dumps(
                        {k: v for k, v in row.items() if v is not None}))
        return 200, "\n".join(rows), "application/octet-stream"

    # ------------------------------------------------------------------
    # aliases (core_api.cpp:987-1076)
    # ------------------------------------------------------------------

    def get_aliases(self, params, body):
        return _json_ok(200, {"aliases": [
            {"name": a, "collection_name": t}
            for a, t in sorted(self.registry.get_symlinks().items())
        ]})

    def get_alias(self, params, body):
        try:
            target = self.registry.resolve_symlink(params["alias"])
        except KeyError:
            _not_found()
        return _json_ok(200, {"name": params["alias"],
                              "collection_name": target})

    def put_upsert_alias(self, params, body):
        req = self._parse_json(body)
        if not isinstance(req, dict) or "collection_name" not in req:
            if isinstance(req, dict):
                _bad_request("Parameter `collection_name` is required.")
            _bad_request("Bad JSON.")
        try:
            self.registry.upsert_symlink(params["alias"],
                                         req["collection_name"])
        except ValueError as e:
            raise _HandlerError(*_message(500, str(e))) from None
        req["name"] = params["alias"]
        return _json_ok(200, req)

    def del_alias(self, params, body):
        try:
            target = self.registry.resolve_symlink(params["alias"])
        except KeyError:
            _not_found()
        self.registry.drop_alias(params["alias"])
        return _json_ok(200, {"name": params["alias"],
                              "collection_name": target})

    # ------------------------------------------------------------------
    # overrides (core_api.cpp:1078-1188)
    # ------------------------------------------------------------------

    def get_overrides(self, params, body):
        # read straight off the collection's override store (which the
        # registry persists, so the view survives a save/load round-trip)
        coll = self._collection(params)
        by_id = {o.rule_id: o for o in coll.overrides
                 if o.rule_id is not None}
        return _json_ok(200, {
            "overrides": [by_id[k].to_view_json() for k in sorted(by_id)]})

    def get_override(self, params, body):
        coll = self._collection(params)
        for o in coll.overrides:
            if o.rule_id == params["id"]:
                return _json_ok(200, o.to_view_json())
        _not_found()

    def put_override(self, params, body):
        from typesense_ray.collection import Override
        from typesense_ray.index_build import doc_id_from_key

        coll = self._collection(params)
        req = self._parse_json(body)
        # query/match must be STRINGS, not merely present — a non-string
        # rule would 200 here and then poison every subsequent search on
        # the collection (Override.matches tokenizes the query)
        if (not isinstance(req, dict) or "rule" not in req
                or not isinstance(req["rule"], dict)
                or not isinstance(req["rule"].get("query"), str)
                or not isinstance(req["rule"].get("match"), str)
                or ("includes" not in req and "excludes" not in req)):
            _bad_request("Bad JSON.")
        req["id"] = params["id"]
        # the reference validates only the OUTER shape (core_api.cpp:
        # 1144-1152) and lets override_t's json .get<>() throw on a
        # malformed include/exclude entry; here that maps to the same
        # "Bad JSON." 400 instead of an unhandled exception
        try:
            includes = [(doc_id_from_key(str(inc["id"])),
                         int(inc["position"]))
                        for inc in req.get("includes", [])]
            excludes = [doc_id_from_key(str(exc["id"]))
                        for exc in req.get("excludes", [])]
        except (KeyError, TypeError, ValueError):
            _bad_request("Bad JSON.")
        coll.add_override(Override(
            rule_id=params["id"], rule_query=req["rule"]["query"],
            match=req["rule"]["match"], includes=includes,
            excludes=excludes, raw=req))
        self.seq_num += 1
        return _json_ok(200, req)

    def del_override(self, params, body):
        coll = self._collection(params)
        if not any(o.rule_id == params["id"] for o in coll.overrides):
            _not_found()
        coll.remove_override(params["id"])
        self.seq_num += 1
        return _json_ok(200, {"id": params["id"]})

    # ------------------------------------------------------------------
    # synonyms (core_api.cpp:1368-1476)
    # ------------------------------------------------------------------

    def get_synonyms(self, params, body):
        coll = self._collection(params)
        out = [{"id": sid, "root": d["root"] or "",
                "synonyms": d["synonyms"]}
               for sid, d in sorted(coll.synonyms.get_synonyms().items())]
        return _json_ok(200, {"synonyms": out})

    def get_synonym(self, params, body):
        coll = self._collection(params)
        d = coll.synonyms.get_synonym(params["id"])
        if d is None:
            _not_found()
        return _json_ok(200, {"id": params["id"], "root": d["root"] or "",
                              "synonyms": d["synonyms"]})

    def put_synonym(self, params, body):
        coll = self._collection(params)
        req = self._parse_json(body)
        if not isinstance(req, dict):
            _bad_request("Bad JSON.")
        req["id"] = params["id"]
        try:
            if hasattr(coll, "add_synonym_json"):
                coll.add_synonym_json(req)  # mutate + invalidate together
            else:
                coll.synonyms.add_json(req)
                coll._searcher = None
        except ValueError as e:
            _bad_request(str(e))
        self.seq_num += 1
        return _json_ok(200, req)

    def del_synonym(self, params, body):
        coll = self._collection(params)
        if coll.synonyms.get_synonym(params["id"]) is None:
            _not_found()
        if hasattr(coll, "remove_synonym"):
            coll.remove_synonym(params["id"])
        else:
            coll.synonyms.remove_synonym(params["id"])
            coll._searcher = None
        self.seq_num += 1
        return _json_ok(200, {"id": params["id"]})

    # ------------------------------------------------------------------
    # keys (core_api.cpp:1190-1303)
    # ------------------------------------------------------------------

    @staticmethod
    def _key_view(key: ApiKey) -> dict:
        obj = key.to_json()
        obj["value_prefix"] = obj.pop("value")
        return obj

    def get_keys(self, params, body):
        return _json_ok(200, {
            "keys": [self._key_view(k) for k in self.auth.list_keys()]})

    def post_create_key(self, params, body):
        req = self._parse_json(body)
        if not isinstance(req, dict):
            _bad_request("Bad JSON.")
        ApiKey.validate(req)
        value = req.get("value") or secrets.token_urlsafe(24)[:32]
        key = self.auth.create_key(ApiKey(
            value, req["description"], req["actions"], req["collections"],
            req.get("expires_at", FAR_FUTURE_TIMESTAMP)))
        return _json_ok(201, key.to_json())

    def get_key(self, params, body):
        if not _is_uint(params["id"]):
            _bad_request("Parameter `id` must be an unsigned integer.")
        key = self.auth.get_key(int(params["id"]))
        return _json_ok(200, self._key_view(key))

    def del_key(self, params, body):
        if not _is_uint(params["id"]):
            _bad_request("Parameter `id` must be an unsigned integer.")
        key = self.auth.remove_key(int(params["id"]))
        return _json_ok(200, {"id": key.id})

    # ------------------------------------------------------------------
    # ops / introspection (core_api.cpp:191-250, 1338-1366)
    # ------------------------------------------------------------------

    def get_health(self, params, body):
        return _json_ok(200, {"ok": True})

    post_health = get_health

    def get_debug(self, params, body):
        return _json_ok(200, {"version": VERSION, "state": 1})

    def get_metrics_json(self, params, body):
        import resource
        import sys

        usage = resource.getrusage(resource.RUSAGE_SELF)
        # ru_maxrss is KiB on Linux but BYTES on macOS
        rss_scale = 1 if sys.platform == "darwin" else 1024
        return _json_ok(200, {
            "system_memory_used_bytes": usage.ru_maxrss * rss_scale,
            "uptime_seconds": int(time.time() - self.started_at),
        })

    def get_log_sequence(self, params, body):
        return 200, str(self.seq_num), "text/plain; charset=utf8"

    def post_snapshot(self, params, body):
        if "snapshot_path" not in params:
            _bad_request("Parameter `snapshot_path` is required.")
        import os

        # an empty or unwritable path must be a clean 400, not an OSError
        # escaping into the socket thread (the reference's Raft snapshot
        # op likewise surfaces a failure response, src/raft_server.cpp)
        try:
            os.makedirs(params["snapshot_path"], exist_ok=True)
            self.registry.save(params["snapshot_path"])
        except OSError:
            _bad_request("Parameter `snapshot_path` is not a writable "
                         "directory path.")
        return _json_ok(201, {"success": True})


def _status_for(message: str) -> int:
    """Map collection-layer error strings onto the reference's Option
    codes: window/group-bound violations are 422
    (src/collection.cpp:532-543), unknown fields are 404, the rest 400."""
    if re.search(r"Only upto \d+ hits|Page must be|must be between 1 and|"
                 r"does not match number", message):
        return 422
    if message.startswith("Could not find"):
        return 404
    return 400


def serve(api: ApiServer, host: str = "127.0.0.1", port: int = 8108,
          enable_cors: bool = False):
    """Run the facade on stdlib ``ThreadingHTTPServer``. Returns the
    server object (call ``.serve_forever()``, or use it from a thread in
    tests; ``.server_address[1]`` carries the bound port when 0).

    ``enable_cors`` mirrors the reference server's ``--enable-cors``
    (src/http_server.cpp:293-327): every response carries
    ``Access-Control-Allow-Origin: *``, and an OPTIONS request that
    sends ``Access-Control-Request-Headers`` is answered as a preflight
    (allow-methods list, the request's headers echoed back, 86400s
    max-age, empty body) without touching the route table."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):  # silence per-request stderr noise
            pass

        def _send(self, status: int, payload: bytes, ctype: str,
                  extra: list[tuple[str, str]] = ()):
            self.send_response(status)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(payload)))
            if enable_cors:
                self.send_header("Access-Control-Allow-Origin", "*")
            for k, v in extra:
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(payload)

        def _dispatch(self, method: str):
            # crafted requests must get an HTTP response, not a dropped
            # connection: malformed/negative Content-Length → 400 (a
            # negative read would block on the socket), invalid UTF-8 →
            # 400, anything escaping handle() → a 500 envelope
            try:
                length = int(self.headers.get("Content-Length") or 0)
            except ValueError:
                length = -1
            if length < 0:
                self._send(400, b'{"message": "Bad Content-Length."}',
                           "application/json; charset=utf-8")
                return
            try:
                body = self.rfile.read(length).decode() if length else ""
            except UnicodeDecodeError:
                self._send(400, b'{"message": "Bad UTF-8."}',
                           "application/json; charset=utf-8")
                return
            try:
                status, out, ctype = api.handle(
                    method, self.path, body, dict(self.headers.items()))
            except Exception:
                self._send(500, b'{"message": "Server error."}',
                           "application/json; charset=utf-8")
                return
            self._send(status, out.encode(), ctype)

        def do_GET(self):
            self._dispatch("GET")

        def do_POST(self):
            self._dispatch("POST")

        def do_PUT(self):
            self._dispatch("PUT")

        def do_PATCH(self):
            self._dispatch("PATCH")

        def do_DELETE(self):
            self._dispatch("DELETE")

        def do_OPTIONS(self):
            acl_req = self.headers.get("Access-Control-Request-Headers")
            if enable_cors and acl_req is not None:
                self._send(200, b"", "application/json; charset=utf-8", [
                    ("Access-Control-Allow-Methods",
                     "POST, GET, DELETE, PUT, PATCH, OPTIONS"),
                    ("Access-Control-Allow-Headers", acl_req),
                    ("Access-Control-Max-Age", "86400"),
                ])
            else:
                # no preflight headers → normal routing (no OPTIONS
                # routes exist, so a 404 like the reference's h2o
                # fall-through)
                self._dispatch("OPTIONS")

    return ThreadingHTTPServer((host, port), Handler)
