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
