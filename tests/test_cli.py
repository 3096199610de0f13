"""``python -m typesense_ray`` job-submit entrypoint (build → search →
export round-trip through main())."""

import json

import pyarrow as pa
import pyarrow.parquet as pq

from typesense_ray.__main__ import main


def test_cli_build_search_export(ray_session, tmp_path, capsys):
    src = tmp_path / "corpus.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    ["alpha beta gamma", "beta gamma delta", "unrelated words"]
                ),
            }
        ),
        src,
    )
    idx = str(tmp_path / "idx")
    assert (
        main(
            [
                "build",
                "--source", str(src),
                "--out", idx,
                "--text-field", "text",
                "--id-field", "doc_id",
                "--meta-fields", "doc_id,text",
            ]
        )
        == 0
    )
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["n_docs"] == 3

    assert main(["search", "--index", idx, "--query", "beta gamma", "-k", "5"]) == 0
    hits = [
        json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
        if line.startswith("{")
    ]
    assert sorted(h["doc_id"] for h in hits) == [1, 2]

    out = str(tmp_path / "export")
    assert main(["export", "--index", idx, "--out", out]) == 0
    assert pq.read_table(out).num_rows == 3


def _clean_ts_env(monkeypatch):
    import os

    for k in list(os.environ):
        if k.startswith("TYPESENSE_"):
            monkeypatch.delenv(k)


def test_cli_serve_requires_data_dir(ray_session, monkeypatch, capsys):
    """serve with no data dir anywhere fails with the reference's
    validation message (include/config.h:408-410)."""
    _clean_ts_env(monkeypatch)
    assert main(["serve"]) == 1
    assert "Data directory is not specified." in capsys.readouterr().err


def test_cli_serve_rejects_bad_config_file(
    ray_session, monkeypatch, tmp_path, capsys
):
    _clean_ts_env(monkeypatch)
    bad = tmp_path / "bad.ini"
    bad.write_text("[broken\n")
    assert main(["serve", "--config", str(bad)]) == 1
    assert "Error parsing the configuration file." in capsys.readouterr().err


def test_cli_serve_resolves_env_file_and_flags(
    ray_session, monkeypatch, tmp_path, capsys
):
    """The startup layering end-to-end through main(): env supplies the
    data dir, the --config file supplies the key and a port, and an
    explicit flag overrides the port — the resolved values reach
    http_api.serve and the bootstrap key (test/config_test.cpp:130-170
    through the CLI)."""
    import typesense_ray.http_api as http_api

    _clean_ts_env(monkeypatch)
    data_dir = tmp_path / "data"
    monkeypatch.setenv("TYPESENSE_DATA_DIR", str(data_dir))
    ini = tmp_path / "server.ini"
    ini.write_text("[server]\napi-key = k-from-file\nlisten-port = 9999\n")

    seen = {}

    class _FakeHTTPD:
        server_address = ("stub", 0)

        def serve_forever(self):
            pass

        def server_close(self):
            pass

    def fake_serve(api, host, port, enable_cors=False):
        seen["api"], seen["host"], seen["port"] = api, host, port
        seen["cors"] = enable_cors
        return _FakeHTTPD()

    monkeypatch.setattr(http_api, "serve", fake_serve)
    assert main([
        "serve", "--config", str(ini), "--listen-port", "8222",
    ]) == 0
    assert seen["port"] == 8222            # explicit flag beats the file
    assert seen["host"] == "0.0.0.0"       # reference default
    assert seen["api"].bootstrap_key == "k-from-file"
    assert data_dir.exists()               # registry root came from env
