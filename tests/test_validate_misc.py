"""Schema validation, facet_query, registry/aliases, user-key lookup."""

import pyarrow as pa
import pytest

from typesense_ray.validate import FieldSpec, Validator, validate_batch


SCHEMA = [
    FieldSpec("title", "string"),
    FieldSpec("points", "int32"),
    FieldSpec("tags", "string[]", optional=True),
    FieldSpec("rating", "float", optional=True),
    FieldSpec("active", "bool", optional=True),
]


def test_validate_batch_split():
    batch = pa.table(
        {
            "title": pa.array(["ok", None, "also ok", "bad points"], pa.string()),
            "points": pa.array([1, 2, None, 2**40], pa.int64()),
            "tags": pa.array([["a"], None, ["b"], ["c"]], pa.list_(pa.string())),
        }
    )
    valid, rejects = validate_batch(batch, SCHEMA)
    assert valid.num_rows == 1 and valid["title"][0].as_py() == "ok"
    errs = rejects["error"].to_pylist()
    assert "title" in errs[0]
    assert "points" in errs[1]  # missing non-optional
    assert "int32" in errs[2]  # out of range


def test_validator_stage_writes_rejects(ray_session, tmp_path):
    import ray.data as rd
    import pyarrow.dataset as pads

    rows = [
        {"title": "good", "points": 5},
        {"title": "bad", "points": 2**40},
    ]
    rejects_dir = str(tmp_path / "rejects")
    out = (
        rd.from_items(rows)
        .map_batches(
            Validator(SCHEMA[:2], rejects_dir), batch_format="pyarrow",
            concurrency=1,
        )
        .take_all()
    )
    assert [r["title"] for r in out] == ["good"]
    rej = pads.dataset(rejects_dir).to_table()
    assert rej.num_rows == 1 and "int32" in rej["error"][0].as_py()


@pytest.fixture(scope="module")
def coll(ray_session, tmp_path_factory):
    import ray.data as rd

    from typesense_ray.collection import RayCollection
    from typesense_ray.index_build import IndexConfig, build_index

    tbl = pa.table(
        {
            "repo": pa.array(["org/a", "org/a", "org/b", "org/b"]),
            "path": pa.array(["x.py", "y.py", "x.py", "z.rs"]),
            "content": pa.array(
                ["red apple pie", "green apple tart", "red cherry pie", "blue berry"]
            ),
            "brand": pa.array(["Acme Corp", "Acme Corp", "Zeta Labs", "Beta Inc"]),
        }
    )
    out = str(tmp_path_factory.mktemp("fqidx"))
    cfg = IndexConfig(
        text_field="content", id_fields=("repo", "path"), sha_field=None,
        batch_docs=2, meta_fields=("repo", "path", "content", "brand"),
    )
    build_index(rd.from_arrow(tbl), out, cfg, concurrency=2)
    return RayCollection(out)


def test_facet_query_prefix(coll):
    r = coll.search("*", facet_by="brand", facet_query="brand:ac")
    counts = {c["value"]: c["count"] for c in r["facet_counts"][0]["counts"]}
    assert counts == {"Acme Corp": 2}


def test_facet_query_fuzzy(coll):
    # 'zeta' with one substitution → 'zeta' matches; 'zita' should too (cost 1)
    r = coll.search("*", facet_by="brand", facet_query="brand:zita labs")
    counts = {c["value"]: c["count"] for c in r["facet_counts"][0]["counts"]}
    assert counts == {"Zeta Labs": 1}


def test_facet_query_other_fields_unfiltered(coll):
    r = coll.search("*", facet_by="brand", facet_query="nosuch:ac")
    assert len(r["facet_counts"][0]["counts"]) == 3


def test_get_document_by_key(coll):
    doc = coll.get_document("org/a", "y.py", columns=["repo", "path", "content"])
    assert doc["content"] == "green apple tart"
    assert coll.get_document("org/zz", "nope.py") is None


def test_registry_aliases(coll):
    from typesense_ray.collection import CollectionRegistry

    reg = CollectionRegistry()
    reg.register("products", coll)
    reg.upsert_alias("live", "products")
    assert reg.get("live") is coll
    reg.drop_alias("live")
    with pytest.raises(KeyError):
        reg.get("live")
    with pytest.raises(KeyError):
        reg.upsert_alias("x", "missing")
