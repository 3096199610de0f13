"""``ray job submit -- python -m typesense_ray <cmd> ...`` entrypoint.

The production path of the rebuild (BASELINE.md "production path runs via
``ray job submit``"; the reference's equivalent surface is the server
binary ``src/main/typesense_server.cpp:15-66``). Subcommands:

- ``build``   — corpus parquet → inverted index (resumable segments)
- ``search``  — distributed BM25 top-k over a built index
- ``export``  — stream stored docs back out as parquet
- ``delete``  — filter-DSL bulk delete with segment compaction
- ``upsert``  — upsert a delta corpus into an existing index
- ``merge``   — compact small segments (Lucene merge-policy role)

Ray session ownership: a job-submit driver owns its session, so this
module calls ``ray.init(address="auto" | local)`` only when no session
exists (never from library code).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="python -m typesense_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build an index from a parquet corpus")
    b.add_argument("--source", required=True, help="parquet file/dir")
    b.add_argument("--out", required=True, help="index output dir")
    b.add_argument("--text-field", default="content")
    b.add_argument("--id-field", default=None,
                   help="explicit int64 id column (default: hash of id-fields)")
    b.add_argument("--id-fields", default="repo,path",
                   help="comma-separated key columns hashed into doc_id")
    b.add_argument("--meta-fields", default="",
                   help="comma-separated stored columns")
    b.add_argument("--sha-field", default=None,
                   help="sha256 column to verify per row (optional)")
    b.add_argument("--batch-docs", type=int, default=4096)
    b.add_argument("--concurrency", type=int, default=None)

    s = sub.add_parser("search", help="distributed BM25 top-k")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("-k", type=int, default=10)

    e = sub.add_parser("export", help="stream stored docs to parquet/jsonl")
    e.add_argument("--index", required=True)
    e.add_argument("--out", required=True, help="output dir")
    e.add_argument("--columns", default=None, help="comma-separated subset")
    e.add_argument("--format", choices=["parquet", "jsonl"], default="parquet",
                   help="jsonl mirrors the reference's export (JSON lines)")

    d = sub.add_parser("delete", help="bulk delete by filter DSL")
    d.add_argument("--index", required=True)
    d.add_argument("--filter", required=True,
                   help='filter DSL, e.g. "lang:[en,de] && n_chars:>=300"')

    u = sub.add_parser("upsert", help="upsert a delta corpus")
    u.add_argument("--index", required=True)
    u.add_argument("--source", required=True, help="delta parquet file/dir")

    m = sub.add_parser("merge", help="compact small segments")
    m.add_argument("--index", required=True)
    m.add_argument("--target-docs", type=int, default=65536)

    v = sub.add_parser(
        "serve",
        help="run the reference-parity HTTP API "
             "(src/main/typesense_server.cpp role)")
    # the reference server's option set (src/typesense_server_utils.cpp:
    # 74-106), resolved env → --config file → explicit flags
    # (typesense_ray.config.resolve_server_config). Defaults are None so
    # only EXPLICIT flags reach the cmdline layer (cmdline::parser::exist
    # semantics); the ServerConfig owns the real defaults.
    v.add_argument("--data-dir", default=None,
                   help="registry root (collections + registry.json; "
                        "reloaded when a manifest exists); also via "
                        "TYPESENSE_DATA_DIR or the config file")
    v.add_argument("--api-key", default=None,
                   help="bootstrap admin key (open mode when no key is "
                        "configured anywhere)")
    v.add_argument("--config", default=None,
                   help="ini configuration file ([server] section, "
                        "reference option names)")
    v.add_argument("--api-address", default=None)
    v.add_argument("--api-port", type=int, default=None)
    v.add_argument("--log-dir", default=None)
    v.add_argument("--enable-cors", action="store_true", default=False)
    # deprecated aliases kept for reference parity; --host/--port are
    # this CLI's historical spellings of the same two options
    v.add_argument("--listen-address", "--host", dest="listen_address",
                   default=None)
    v.add_argument("--listen-port", "--port", dest="listen_port",
                   type=int, default=None)

    args = p.parse_args(argv)
    # serve validates its config BEFORE paying Ray's multi-second local
    # startup — a bad --config must fail instantly; the data commands
    # all need Ray up front
    if args.cmd != "serve":
        _ensure_ray()

    if args.cmd == "build":
        from typesense_ray.index_build import IndexConfig, build_index

        cfg = IndexConfig(
            text_field=args.text_field,
            id_field=args.id_field,
            id_fields=tuple(
                f for f in args.id_fields.split(",") if f
            ),
            meta_fields=tuple(f for f in args.meta_fields.split(",") if f),
            sha_field=args.sha_field,
            verify_sha=bool(args.sha_field),
            batch_docs=args.batch_docs,
        )
        manifest = build_index(
            args.source, args.out, cfg, concurrency=args.concurrency
        )
        print(json.dumps(
            {k: manifest[k] for k in
             ("n_docs", "n_segments", "n_postings", "docs_per_s", "timings")}
        ))
    elif args.cmd == "search":
        from typesense_ray.query import search_index

        tbl = search_index(args.index, args.query, k=args.k)
        for row in tbl.to_pylist():
            print(json.dumps(row))
    elif args.cmd == "export":
        from typesense_ray.ops import export_documents

        cols = args.columns.split(",") if args.columns else None
        ds = export_documents(args.index, columns=cols)
        if args.format == "jsonl":
            ds.write_json(args.out)
        else:
            ds.write_parquet(args.out)
        print(json.dumps({"exported_to": args.out, "format": args.format}))
    elif args.cmd == "delete":
        from typesense_ray.ops import delete_by_filter

        res = delete_by_filter(args.index, args.filter)
        print(json.dumps(res))
    elif args.cmd == "upsert":
        from typesense_ray.ops import upsert_documents

        res = upsert_documents(args.source, args.index)
        print(json.dumps(res))
    elif args.cmd == "merge":
        from typesense_ray.ops import merge_segments

        res = merge_segments(args.index, target_docs=args.target_docs)
        print(json.dumps(
            {k: res[k] for k in ("n_docs", "n_segments", "merges")}
        ))
    elif args.cmd == "serve":
        import os

        from typesense_ray.auth import AuthManager
        from typesense_ray.collection import CollectionRegistry
        from typesense_ray.config import resolve_server_config
        from typesense_ray.http_api import ApiServer, serve

        explicit = {
            ref_name: val
            for ref_name, val in [
                ("data-dir", args.data_dir), ("api-key", args.api_key),
                ("config", args.config), ("api-address", args.api_address),
                ("api-port", args.api_port), ("log-dir", args.log_dir),
                ("listen-address", args.listen_address),
                ("listen-port", args.listen_port),
            ] if val is not None
        }
        if args.enable_cors:
            explicit["enable-cors"] = True
        cfg = resolve_server_config(explicit)
        ok, err = cfg.is_valid()
        if not ok and err != "API key is not specified.":
            # missing api-key is OPEN MODE here (documented divergence:
            # no Raft/production hardening in the rebuild); the other
            # validation errors are the reference's, verbatim
            print(err, file=sys.stderr)
            return 1
        _ensure_ray()
        data_dir = cfg.data_dir
        manifest = os.path.join(data_dir, "registry.json")
        if os.path.exists(manifest):
            registry = CollectionRegistry.load(data_dir)
        else:
            os.makedirs(data_dir, exist_ok=True)
            registry = CollectionRegistry(root=data_dir)
        api = ApiServer(registry, auth=AuthManager(data_dir),
                        bootstrap_key=cfg.api_key or None)
        httpd = serve(api, host=cfg.api_address, port=cfg.api_port,
                      enable_cors=cfg.enable_cors)
        print(json.dumps({"listening": list(httpd.server_address)}),
              flush=True)
        try:
            httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            httpd.server_close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
