"""HTTP/REST facade conformance: route table + dispatch
(``src/main/typesense_server.cpp:15-66``, ``src/http_server.cpp``),
action derivation (AuthManagerTest.GenerationOfAPIAction,
``test/auth_manager_test.cpp:192-216``) and the ``core_api.cpp`` handler
contracts (status codes, ``{"message"}`` envelopes, JSONL import/export,
JSONP callback, auth failure bodies)."""

from __future__ import annotations

import json
import threading
import urllib.request

import pytest

from typesense_ray.auth import generate_scoped_key
from typesense_ray.collection import CollectionRegistry
from typesense_ray.http_api import ApiServer, route_action, serve

BOOT = "bootstrap-key-0123456789abcdef"  # <= 32 chars (plain key)
SEARCH_KEY = "searchonlysearchonlysearchonly12"  # exactly 32 chars

SCHEMA = {
    "name": "movies",
    "fields": [
        {"name": "title", "type": "string"},
        {"name": "tags", "type": "string[]", "facet": True,
         "optional": True},
        {"name": "points", "type": "int32"},
    ],
    "default_sorting_field": "points",
}

DOCS = [
    {"title": "shadow of the wind", "tags": ["drama"], "points": 50},
    {"title": "wind of winter", "tags": ["fantasy"], "points": 90},
    {"title": "sleeping in the shadow", "tags": ["drama"], "points": 70},
    {"title": "silent night", "tags": ["quiet"], "points": 10},
]


def req(api, method, path, body="", headers=None, expect=200):
    status, out, ctype = api.handle(method, path, body, headers)
    assert status == expect, f"{method} {path}: {status} {out}"
    return out, ctype


def jreq(api, method, path, body="", headers=None, expect=200):
    out, _ = req(api, method, path, body, headers, expect)
    return json.loads(out) if out else None


@pytest.fixture()
def api(ray_session, tmp_path):
    """Open-mode server (no keys configured) with one populated
    collection."""
    srv = ApiServer(CollectionRegistry(root=str(tmp_path)))
    jreq(srv, "POST", "/collections", json.dumps(SCHEMA), expect=201)
    body = "\n".join(json.dumps(d) for d in DOCS)
    req(srv, "POST", "/collections/movies/documents/import", body)
    return srv


def test_route_action_derivation():
    # AuthManagerTest.GenerationOfAPIAction (test/auth_manager_test.cpp)
    cases = [
        ("GET", ["collections", ":collection", "documents", "search"],
         "documents:search"),
        ("POST", ["collections"], "collections:create"),
        ("GET", ["collections", ":collection"], "collections:get"),
        ("GET", ["collections"], "collections:list"),
        ("POST", ["keys"], "keys:create"),
        ("DELETE", ["collections", ":collection", "documents", ":id"],
         "documents:delete"),
        ("PUT", ["collections", ":collection", "overrides", ":id"],
         "overrides:upsert"),
    ]
    for method, parts, want in cases:
        assert route_action(method, parts) == want


def test_unknown_route_404(api):
    status, out, _ = api.handle("GET", "/nope/nothing")
    assert status == 404 and json.loads(out) == {"message": "Not Found"}


def test_collection_crud(api):
    # list: most recently created first; summary matches schema
    colls = jreq(api, "GET", "/collections")
    assert [c["name"] for c in colls] == ["movies"]
    summary = jreq(api, "GET", "/collections/movies")
    assert summary["num_documents"] == 4
    assert summary["default_sorting_field"] == "points"
    # duplicate name → 409 with the reference's message
    out, _ = req(api, "POST", "/collections", json.dumps(SCHEMA),
                 expect=409)
    assert json.loads(out)["message"] == (
        "Collection with name `movies` already exists.")
    # validation messages
    out, _ = req(api, "POST", "/collections", "{not json", expect=400)
    assert json.loads(out)["message"] == "Bad JSON."
    out, _ = req(api, "POST", "/collections", json.dumps({"fields": []}),
                 expect=400)
    assert json.loads(out)["message"] == "Parameter `name` is required."
    # drop echoes the summary; collection gone afterwards
    dropped = jreq(api, "DELETE", "/collections/movies")
    assert dropped["name"] == "movies"
    req(api, "GET", "/collections/movies", expect=404)


def test_document_lifecycle(api):
    # auto-id create returns the committed doc (id = next sequence slot)
    doc = jreq(api, "POST", "/collections/movies/documents",
               json.dumps({"title": "new doc", "points": 5}), expect=201)
    assert doc["id"] == "4" and doc["title"] == "new doc"
    fetched = jreq(api, "GET", "/collections/movies/documents/4")
    assert fetched["title"] == "new doc"
    # PATCH partial update merges into the stored doc (201)
    merged = jreq(api, "PATCH", "/collections/movies/documents/4",
                  json.dumps({"points": 6}), expect=201)
    assert merged["points"] == 6 and merged["title"] == "new doc"
    # create on an existing id → 409
    out, _ = req(api, "POST", "/collections/movies/documents",
                 json.dumps({"id": "4", "title": "x", "points": 1}),
                 expect=409)
    assert "already exists" in json.loads(out)["message"]
    # delete returns the doc; a second delete 404s
    gone = jreq(api, "DELETE", "/collections/movies/documents/4")
    assert gone["id"] == "4"
    req(api, "DELETE", "/collections/movies/documents/4", expect=404)


def test_delete_by_filter_and_export(api):
    # filter_by is mandatory (core_api.cpp:904-910)
    out, _ = req(api, "DELETE", "/collections/movies/documents",
                 expect=400)
    assert json.loads(out)["message"] == (
        "Parameter `filter_by` must be provided.")
    res = jreq(api, "DELETE",
               "/collections/movies/documents?filter_by=points:>60")
    assert res == {"num_deleted": 2}
    # export: one stored doc per line, declared fields only
    out, ctype = req(api, "GET",
                     "/collections/movies/documents/export")
    assert ctype == "application/octet-stream"
    rows = [json.loads(ln) for ln in out.split("\n") if ln]
    assert {r["title"] for r in rows} == {"shadow of the wind",
                                          "silent night"}


def test_import_per_line_results(api):
    lines = [
        json.dumps({"title": "ok doc", "points": 1}),
        json.dumps({"title": "missing points"}),
    ]
    out, ctype = req(api, "POST",
                     "/collections/movies/documents/import",
                     "\n".join(lines))
    assert ctype.startswith("text/plain")
    results = [json.loads(ln) for ln in out.split("\n")]
    assert results[0] == {"success": True}
    assert results[1]["success"] is False and results[1]["code"] == 400
    # bad action rejected up front
    out, _ = req(api, "POST",
                 "/collections/movies/documents/import?action=replace",
                 lines[0], expect=400)
    assert json.loads(out)["message"] == (
        "Parameter `action` must be a create|update|upsert.")


def test_search_endpoint(api):
    r = jreq(api, "GET", "/collections/movies/documents/search"
                         "?q=shadow&query_by=title")
    assert r["found"] == 2 and "search_time_ms" in r and r["page"] == 1
    titles = [h["document"]["title"] for h in r["hits"]]
    assert set(titles) == {"shadow of the wind", "sleeping in the shadow"}
    # missing q → 400 (core_api.cpp:311-314)
    out, _ = req(api, "GET", "/collections/movies/documents/search",
                 expect=400)
    assert json.loads(out)["message"] == "Parameter `q` is required."
    # per_page window → 422 like the reference's Option code
    req(api, "GET", "/collections/movies/documents/search"
                    "?q=shadow&query_by=title&per_page=500", expect=422)
    # non-numeric num_typos → 400 with the exact message
    out, _ = req(api, "GET", "/collections/movies/documents/search"
                             "?q=shadow&query_by=title&num_typos=x",
                 expect=400)
    assert json.loads(out)["message"] == (
        "Parameter `num_typos` must be an unsigned integer.")
    # uint32 overflow is NOT a valid uint (StringUtils::is_uint32_t,
    # StringUtilsTest.UInt32Validation: 32-digit number → false)
    out, _ = req(api, "GET", "/collections/movies/documents/search"
                             "?q=shadow&query_by=title"
                             "&per_page=99999999999999999999999999999999",
                 expect=400)
    assert json.loads(out)["message"] == (
        "Parameter `per_page` must be an unsigned integer.")
    # non-ASCII digits are rejected like strtoul would (isdigit() alone
    # accepts '４２' and int() raises on '²' — both must be the clean
    # parameter message, not a leaked Python error)
    for nonascii in ("４２", "²"):
        out, _ = req(api, "GET", "/collections/movies/documents/search"
                                 f"?q=shadow&query_by=title"
                                 f"&per_page={nonascii}", expect=400)
        assert json.loads(out)["message"] == (
            "Parameter `per_page` must be an unsigned integer.")
    # >2 sort fields rejected at the HTTP layer (core_api.cpp:475-478)
    out, _ = req(api, "GET", "/collections/movies/documents/search"
                             "?q=shadow&query_by=title"
                             "&sort_by=points:desc,points:asc,points:desc",
                 expect=400)
    assert json.loads(out)["message"] == (
        "Only upto 2 sort fields are allowed.")
    # JSONP callback wrapping (core_api.cpp:563-567)
    out, _ = req(api, "GET", "/collections/movies/documents/search"
                             "?q=shadow&query_by=title&callback=cb")
    assert out.startswith("cb(") and out.endswith(");")
    # facet_query default per_page=0: facet counts, no hits
    r = jreq(api, "GET", "/collections/movies/documents/search"
                         "?q=*&query_by=title&facet_by=tags"
                         "&facet_query=tags:dra")
    assert r["hits"] == [] and r["facet_counts"]


def test_search_through_alias(api):
    jreq(api, "PUT", "/aliases/films",
         json.dumps({"collection_name": "movies"}))
    r = jreq(api, "GET",
             "/collections/films/documents/search?q=wind&query_by=title")
    assert r["found"] == 2
    aliases = jreq(api, "GET", "/aliases")["aliases"]
    assert aliases == [{"name": "films", "collection_name": "movies"}]
    one = jreq(api, "GET", "/aliases/films")
    assert one == {"name": "films", "collection_name": "movies"}
    gone = jreq(api, "DELETE", "/aliases/films")
    assert gone["collection_name"] == "movies"
    req(api, "GET", "/aliases/films", expect=404)


def test_override_routes(api):
    rule = {
        "rule": {"query": "wind", "match": "exact"},
        "includes": [{"id": "3", "position": 1}],
        "excludes": [{"id": "1"}],
    }
    jreq(api, "PUT", "/collections/movies/overrides/wind-rule",
         json.dumps(rule))
    # echoed with the id injected (core_api.cpp:1154-1165)
    got = jreq(api, "GET", "/collections/movies/overrides/wind-rule")
    assert got["id"] == "wind-rule"
    listed = jreq(api, "GET", "/collections/movies/overrides")
    assert len(listed["overrides"]) == 1
    # search: doc 3 pinned first, doc 1 (the best wind match) hidden
    r = jreq(api, "GET", "/collections/movies/documents/search"
                         "?q=wind&query_by=title")
    ids = [h["document"]["id"] for h in r["hits"]]
    assert ids[0] == "3" and "1" not in ids
    # malformed rule → Bad JSON.
    out, _ = req(api, "PUT", "/collections/movies/overrides/bad",
                 json.dumps({"includes": []}), expect=400)
    assert json.loads(out)["message"] == "Bad JSON."
    # outer shape valid but an include entry is malformed (missing id /
    # non-integer position): a 400, never an unhandled exception
    for bad_inc in ([{"position": 1}], [{"id": "3"}],
                    [{"id": "3", "position": "x"}], ["3"]):
        out, _ = req(
            api, "PUT", "/collections/movies/overrides/bad",
            json.dumps({"rule": {"query": "wind", "match": "exact"},
                        "includes": bad_inc}), expect=400)
        assert json.loads(out)["message"] == "Bad JSON."
    jreq(api, "DELETE", "/collections/movies/overrides/wind-rule")
    req(api, "GET", "/collections/movies/overrides/wind-rule", expect=404)
    r = jreq(api, "GET", "/collections/movies/documents/search"
                         "?q=wind&query_by=title")
    assert r["found"] == 2


def test_overrides_survive_registry_reload(api, tmp_path):
    """The reference persists override rules in the store and a restarted
    server still lists them (test/collection_manager_test.cpp:138-271);
    here: PUT → registry.save → CollectionRegistry.load → a fresh facade
    echoes the identical user-facing JSON and still applies the rule."""
    rule = {
        "rule": {"query": "wind", "match": "exact"},
        "includes": [{"id": "3", "position": 1}],
        "excludes": [{"id": "1"}],
    }
    jreq(api, "PUT", "/collections/movies/overrides/wind-rule",
         json.dumps(rule))
    api.registry.save()
    reloaded = ApiServer(CollectionRegistry.load(str(tmp_path)))
    listed = jreq(reloaded, "GET", "/collections/movies/overrides")
    assert listed["overrides"] == [dict(rule, id="wind-rule")]
    got = jreq(reloaded, "GET",
               "/collections/movies/overrides/wind-rule")
    assert got["includes"] == [{"id": "3", "position": 1}]
    r = jreq(reloaded, "GET", "/collections/movies/documents/search"
                              "?q=wind&query_by=title")
    ids = [h["document"]["id"] for h in r["hits"]]
    assert ids[0] == "3" and "1" not in ids
    # and DELETE through the fresh facade still works
    jreq(reloaded, "DELETE", "/collections/movies/overrides/wind-rule")
    req(reloaded, "GET", "/collections/movies/overrides/wind-rule",
        expect=404)


def test_synonym_routes(api):
    jreq(api, "PUT", "/collections/movies/synonyms/syn-1",
         json.dumps({"root": "quiet", "synonyms": ["silent"]}))
    got = jreq(api, "GET", "/collections/movies/synonyms/syn-1")
    assert got["synonyms"] == ["silent"]
    listed = jreq(api, "GET", "/collections/movies/synonyms")
    assert [s["id"] for s in listed["synonyms"]] == ["syn-1"]
    r = jreq(api, "GET", "/collections/movies/documents/search"
                         "?q=quiet&query_by=title")
    assert [h["document"]["title"] for h in r["hits"]] == ["silent night"]
    # invalid synonym JSON → the reference's parse error string
    out, _ = req(api, "PUT", "/collections/movies/synonyms/bad",
                 json.dumps({"synonyms": []}), expect=400)
    assert json.loads(out)["message"] == (
        "Could not find an array of `synonyms`")
    jreq(api, "DELETE", "/collections/movies/synonyms/syn-1")
    req(api, "GET", "/collections/movies/synonyms/syn-1", expect=404)
    r = jreq(api, "GET", "/collections/movies/documents/search"
                         "?q=quiet&query_by=title")
    assert r["found"] == 0


def test_ops_endpoints(api, tmp_path):
    assert jreq(api, "GET", "/health") == {"ok": True}
    assert jreq(api, "POST", "/health") == {"ok": True}
    debug = jreq(api, "GET", "/debug")
    assert debug["state"] == 1 and "version" in debug
    metrics = jreq(api, "GET", "/metrics.json")
    assert metrics["system_memory_used_bytes"] > 0
    # sequence is text/plain and advances on mutations
    out, ctype = req(api, "GET", "/sequence")
    assert ctype.startswith("text/plain")
    before = int(out)
    jreq(api, "POST", "/collections/movies/documents",
         json.dumps({"title": "bump", "points": 1}), expect=201)
    assert int(req(api, "GET", "/sequence")[0]) == before + 1
    # snapshot persists the registry manifest
    snap = tmp_path / "snap"
    out, _ = req(api, "POST",
                 f"/operations/snapshot?snapshot_path={snap}", expect=201)
    assert json.loads(out) == {"success": True}
    assert (snap / "registry.json").exists()
    out, _ = req(api, "POST", "/operations/snapshot", expect=400)
    assert json.loads(out)["message"] == (
        "Parameter `snapshot_path` is required.")
    # empty / unwritable paths are a clean 400, never an OSError into
    # the socket thread
    for bad in ("", "/proc/nope/snap"):
        out, _ = req(api, "POST",
                     f"/operations/snapshot?snapshot_path={bad}",
                     expect=400)
        assert json.loads(out)["message"] == (
            "Parameter `snapshot_path` is not a writable directory path.")
    # a non-string key `value` is rejected at validation — it must not
    # poison the key store (listing and scoped-key walks would TypeError)
    out, _ = req(api, "POST", "/keys",
                 json.dumps({"value": 123, "description": "x",
                             "actions": ["*"], "collections": ["*"]}),
                 expect=400)
    assert json.loads(out)["message"] == (
        "Wrong format for `value`. It should be a string.")


def test_auth_matrix(ray_session, tmp_path):
    srv = ApiServer(CollectionRegistry(root=str(tmp_path)),
                    bootstrap_key=BOOT)
    boot = {"x-typesense-api-key": BOOT}
    # no key → 401 with the reference's exact message; health is open
    status, out, _ = srv.handle("GET", "/collections")
    assert status == 401
    assert json.loads(out)["message"] == (
        "Forbidden - a valid `x-typesense-api-key` header must be sent.")
    assert srv.handle("GET", "/health")[0] == 200
    # bootstrap key via header and via GET param (http_server.cpp:348-356)
    jreq(srv, "GET", "/collections", headers=boot)
    jreq(srv, "GET", f"/collections?x-typesense-api-key={BOOT}")
    # bootstrap the collection + a search-only managed key
    jreq(srv, "POST", "/collections", json.dumps(SCHEMA), headers=boot,
         expect=201)
    req(srv, "POST", "/collections/movies/documents/import",
        "\n".join(json.dumps(d) for d in DOCS), headers=boot)
    created = jreq(srv, "POST", "/keys", json.dumps({
        "value": SEARCH_KEY, "description": "search only",
        "actions": ["documents:search"], "collections": ["movies"],
    }), headers=boot, expect=201)
    assert created["id"] == 0 and created["value"] == SEARCH_KEY
    # key listing exposes only the 4-char prefix
    keys = jreq(srv, "GET", "/keys", headers=boot)["keys"]
    assert keys[0]["value_prefix"] == SEARCH_KEY[:4]
    assert "value" not in keys[0]
    skey = {"x-typesense-api-key": SEARCH_KEY}
    r = jreq(srv, "GET", "/collections/movies/documents/search"
                         "?q=wind&query_by=title", headers=skey)
    assert r["found"] == 2
    # the search key cannot mutate or read other resources
    assert srv.handle("POST", "/collections", json.dumps(SCHEMA),
                      skey)[0] == 401
    assert srv.handle("GET", "/keys", "", skey)[0] == 401
    # scoped key embeds filter_by (AuthManagerTest.ScopedAPIKeys role)
    scoped = generate_scoped_key(SEARCH_KEY, {"filter_by": "points:<60"})
    r = jreq(srv, "GET", "/collections/movies/documents/search"
                         "?q=wind&query_by=title",
             headers={"x-typesense-api-key": scoped})
    assert [h["document"]["title"] for h in r["hits"]] == [
        "shadow of the wind"]
    # key fetch + delete round-trip
    one = jreq(srv, "GET", "/keys/0", headers=boot)
    assert one["value_prefix"] == SEARCH_KEY[:4]
    assert jreq(srv, "DELETE", "/keys/0", headers=boot) == {"id": 0}
    assert srv.handle("GET", "/collections/movies/documents/search"
                             "?q=wind&query_by=title", "", skey)[0] == 401


def test_stdlib_server_round_trip(api):
    httpd = serve(api, port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health") as resp:
            assert resp.status == 200
            assert json.loads(resp.read()) == {"ok": True}
        url = (f"http://127.0.0.1:{port}/collections/movies/documents/"
               f"search?q=wind&query_by=title")
        with urllib.request.urlopen(url) as resp:
            assert json.loads(resp.read())["found"] == 2
        body = json.dumps({"title": "over http", "points": 3}).encode()
        post = urllib.request.Request(
            f"http://127.0.0.1:{port}/collections/movies/documents",
            data=body, method="POST")
        with urllib.request.urlopen(post) as resp:
            assert resp.status == 201
            assert json.loads(resp.read())["title"] == "over http"
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_stdlib_server_cors(api):
    """--enable-cors parity (src/http_server.cpp:293-327): every
    response carries Access-Control-Allow-Origin: *, and an OPTIONS
    preflight with Access-Control-Request-Headers is answered with the
    allow-methods list, the echoed headers and the 86400 max-age,
    without hitting the route table."""
    httpd = serve(api, port=0, enable_cors=True)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health") as resp:
            assert resp.headers["Access-Control-Allow-Origin"] == "*"
        pre = urllib.request.Request(
            f"http://127.0.0.1:{port}/collections", method="OPTIONS",
            headers={"Access-Control-Request-Headers":
                     "x-typesense-api-key, content-type"})
        with urllib.request.urlopen(pre) as resp:
            assert resp.status == 200
            assert resp.read() == b""
            assert resp.headers["Access-Control-Allow-Methods"] == \
                "POST, GET, DELETE, PUT, PATCH, OPTIONS"
            assert resp.headers["Access-Control-Allow-Headers"] == \
                "x-typesense-api-key, content-type"
            assert resp.headers["Access-Control-Max-Age"] == "86400"
            assert resp.headers["Access-Control-Allow-Origin"] == "*"
        # OPTIONS without the preflight header falls through to routing
        plain = urllib.request.Request(
            f"http://127.0.0.1:{port}/collections", method="OPTIONS")
        try:
            urllib.request.urlopen(plain)
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_stdlib_server_no_cors_by_default(api):
    httpd = serve(api, port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health") as resp:
            assert "Access-Control-Allow-Origin" not in resp.headers
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_fuzz_handle_never_raises(api, tmp_path, monkeypatch):
    """Robustness fuzz over the whole route surface: for ANY request —
    malformed JSON bodies, wrong-shaped params, overflow numbers, odd
    paths — ``handle()`` must return a well-formed (status, body, ctype)
    triple, never raise into the socket thread (the axis that caught the
    malformed-override KeyError and the post_snapshot OSError). Seeded
    via GRAFT_HTTP_FUZZ_SEED. Runs chdir'd into tmp_path so relative
    snapshot_path values never litter the checkout."""
    import os
    import random

    monkeypatch.chdir(tmp_path)

    rng = random.Random(int(os.environ.get("GRAFT_HTTP_FUZZ_SEED", "4242")))
    from typesense_ray.http_api import ROUTES

    bodies = [
        "", "null", "[]", "42", '"str"', "{", "{}",
        '{"id": 7}', '{"rule": {}}', '{"rule": {"query": 1, "match": 2}}',
        '{"includes": [42]}', '{"synonyms": "nope"}',
        '{"collection_name": 9}', '{"actions": "x"}',
        '{"name": 1, "fields": {}, "default_sorting_field": 3}',
        '{"fields": [{"name": 1}], "name": "x", '
        '"default_sorting_field": ""}',
        json.dumps({"title": 3, "points": "x"}),
    ]
    segments = ["movies", "nope", "bad%20name", "..", "42",
                "99999999999999999999999999999999", "-1", ""]
    qvals = ["", "*", "x", "true", "all", "-5", "1e9", ",", ":", "a:b:c",
             "99999999999999999999999999999999", "points:desc,x",
             "title,points", "[\"x\"]", "points: >abc", "tags: [a,"]
    qkeys = ["q", "query_by", "filter_by", "sort_by", "facet_by",
             "facet_query", "per_page", "page", "max_hits", "num_typos",
             "prefix", "group_by", "group_limit", "pinned_hits",
             "hidden_hits", "include_fields", "callback", "action",
             "batch_size", "query_by_weights", "snapshot_path"]
    for _ in range(400):
        method, pattern, _h = rng.choice(ROUTES)
        path = "/".join(
            rng.choice(segments) if p.startswith(":") else p
            for p in pattern.strip("/").split("/")
        )
        qs = "&".join(
            f"{rng.choice(qkeys)}={rng.choice(qvals)}"
            for _ in range(rng.randrange(4))
        )
        url = "/" + path + ("?" + qs if qs else "")
        status, out, ctype = api.handle(method, url, rng.choice(bodies))
        assert isinstance(status, int) and 200 <= status < 600, (method, url)
        assert isinstance(out, str) and isinstance(ctype, str)


def test_override_non_string_rule_is_rejected(api):
    # a non-string rule.query would 200 and then poison every
    # subsequent search (Override.matches tokenizes the query)
    out, _ = req(api, "PUT", "/collections/movies/overrides/bad",
                 json.dumps({"rule": {"query": 123, "match": "exact"},
                             "excludes": [{"id": "1"}]}), expect=400)
    assert json.loads(out)["message"] == "Bad JSON."
    r = jreq(api, "GET", "/collections/movies/documents/search"
                         "?q=shadow&query_by=title")
    assert r["found"] == 2  # searches unaffected


def test_drop_collection_via_alias_drops_target(api):
    jreq(api, "PUT", "/aliases/films",
         json.dumps({"collection_name": "movies"}))
    dropped = jreq(api, "DELETE", "/collections/films")
    assert dropped["name"] == "movies"
    req(api, "GET", "/collections/movies", expect=404)


def test_create_collection_non_string_name(api):
    out, _ = req(api, "POST", "/collections",
                 json.dumps({"name": {}, "fields": [
                     {"name": "t", "type": "string"}],
                     "default_sorting_field": ""}), expect=400)
    assert json.loads(out)["message"] == "Bad JSON."


def test_key_value_longer_than_key_len_rejected(api):
    out, _ = req(api, "POST", "/keys",
                 json.dumps({"value": "k" * 40, "description": "x",
                             "actions": ["*"], "collections": ["*"]}),
                 expect=400)
    assert json.loads(out)["message"] == (
        "Wrong format for `value`. It should be a string of at most "
        "32 characters.")


def test_managed_synonym_mutators_invalidate_read_view(api):
    coll = api.registry.get_collection("movies")
    r = coll.search("breeze", mode="reference", query_by=["title"])
    assert r["found"] == 0
    coll.add_synonym_json({"id": "s1", "synonyms": ["breeze", "wind"]})
    r = coll.search("breeze", mode="reference", query_by=["title"])
    assert r["found"] == 2  # the two wind docs via the synonym
    coll.remove_synonym("s1")
    r = coll.search("breeze", mode="reference", query_by=["title"])
    assert r["found"] == 0


def test_socket_guards_and_concurrent_key_creation(api):
    """serve()-level robustness: bad Content-Length and invalid UTF-8
    get a 400 response (not a dropped connection), and concurrent
    mutating requests are serialized (distinct key ids, intact store)."""
    import http.client
    import threading

    srv = serve(api, port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        # invalid UTF-8 body
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        c.putrequest("POST", "/collections/movies/documents")
        c.putheader("Content-Length", "4")
        c.endheaders()
        c.send(b"\xff\xfe\xfd\xfc")
        resp = c.getresponse()
        assert resp.status == 400
        assert json.loads(resp.read()) == {"message": "Bad UTF-8."}
        c.close()
        # malformed Content-Length
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        c.putrequest("POST", "/health")
        c.putheader("Content-Length", "abc")
        c.endheaders()
        resp = c.getresponse()
        assert resp.status == 400
        assert json.loads(resp.read()) == {"message": "Bad Content-Length."}
        c.close()
        # concurrent key creation: every id unique
        import urllib.request

        def make_key(i, out):
            body = json.dumps({"description": f"k{i}", "actions": ["*"],
                               "collections": ["*"]}).encode()
            r = urllib.request.Request(
                f"http://127.0.0.1:{port}/keys", data=body, method="POST")
            with urllib.request.urlopen(r, timeout=10) as resp:
                out.append(json.loads(resp.read())["id"])

        ids: list = []
        threads = [threading.Thread(target=make_key, args=(i, ids))
                   for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert sorted(ids) == list(range(len(ids)))
    finally:
        srv.shutdown()
