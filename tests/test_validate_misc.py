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


def test_facet_query_field_must_be_in_facet_by(coll):
    # reference parity (test/collection_faceting_test.cpp:461-472): a
    # facet_query naming a field outside facet_by is a request error
    import pytest as _pytest

    with _pytest.raises(ValueError):
        coll.search("*", facet_by="brand", facet_query="nosuch:ac")
    with _pytest.raises(ValueError):
        coll.search("*", facet_query="brand:ac")  # no facet_by
    with _pytest.raises(ValueError):
        coll.search("*", facet_by="brand", facet_query="foobar")  # no colon
    with _pytest.raises(ValueError):
        coll.search("*", facet_by="nosuchfield")  # unknown facet field


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
    # reference symlink semantics (collection_manager_test.cpp:306-391):
    # dangling targets are fine; lookup through one raises until the
    # target appears; the alias NAME must not shadow a collection
    reg.upsert_alias("x", "missing")
    assert reg.resolve_symlink("x") == "missing"
    with pytest.raises(KeyError):
        reg.get("x")
    with pytest.raises(ValueError):
        reg.upsert_alias("products", "anything")


def test_numeric_sorted_index_matches_compare_path():
    """The num_tree-style sorted sidecar must produce the exact mask of
    the vectorized full-column compare for every comparator, including
    null (NaN) entries and OR-lists."""
    import numpy as np
    import pyarrow as pa

    from typesense_ray.filtering import (
        NumericIndexCache,
        StringTokenCache,
        eval_filters,
        parse_filter,
    )

    rng = np.random.default_rng(5)
    ints = rng.integers(-50, 50, 500)
    floats = np.where(rng.random(500) < 0.1, np.nan, rng.normal(0, 10, 500))
    docs = pa.table(
        {
            "points": pa.array(ints, pa.int64()),
            "score": pa.array([None if np.isnan(x) else float(x) for x in floats],
                              pa.float64()),
        }
    )
    ftypes = {"points": "int", "score": "float"}
    for expr in (
        "points:>=10", "points:<0", "points:>49", "points:<=-50",
        "points:7", "points:[3,>=40,<-45]",
        "score:>=0.5", "score:<-3.25", "score:[>=5,<=-5]",
        "points:>=10 && score:<0",
    ):
        clauses = parse_filter(expr, ftypes)
        plain = eval_filters(docs, clauses, ftypes, StringTokenCache())
        cache = NumericIndexCache()
        fast = eval_filters(docs, clauses, ftypes, StringTokenCache(), cache)
        fast2 = eval_filters(docs, clauses, ftypes, StringTokenCache(), cache)
        assert (plain == fast).all(), expr
        assert (fast == fast2).all(), expr  # cached rebuild identical
