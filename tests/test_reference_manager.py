"""Conformance port of the reference's manager suite
(``test/collection_manager_test.cpp``, RestoreRecordsOnRestart
:138-271): a registry reloaded from its persisted manifest restores the
collection, its overrides (minus deleted), its synonyms (minus
removed), the default sorting field — and serves IDENTICAL results."""

import json
import os

import pyarrow as pa
import pytest

from typesense_ray.collection import (
    CollectionRegistry,
    Override,
    RayCollection,
    SynonymIndex,
)
from typesense_ray.index_build import IndexConfig, build_index

MUL_JSONL = "/root/reference/test/multi_field_documents.jsonl"

pytestmark = pytest.mark.skipif(
    not os.path.exists(MUL_JSONL),
    reason="reference corpus not available",
)


def ids(r):
    return [h["document"]["ref_id"] for h in r["hits"]]


def test_restore_records_on_restart(ray_session, tmp_path):
    import ray.data as rd

    docs = [json.loads(line) for line in open(MUL_JSONL)]
    tbl = pa.table(
        {
            "ref_id": pa.array(range(len(docs)), pa.int64()),
            "title": pa.array([d["title"] for d in docs]),
            "starring": pa.array([d["starring"] for d in docs]),
            "points": pa.array([int(d["points"]) for d in docs],
                               pa.int64()),
            "cast": pa.array([d["cast"] for d in docs],
                             pa.list_(pa.string())),
        }
    )
    out = str(tmp_path / "mgr_idx")
    cfg = IndexConfig(
        text_field="title", id_field="ref_id", sha_field=None, batch_docs=8,
        meta_fields=("ref_id", "title", "starring", "points", "cast"),
        indexed_fields=("starring",),
    )
    build_index(rd.from_arrow(tbl), out, cfg, concurrency=1)

    syn = SynonymIndex()
    syn.add_json({"id": "id1", "root": "smart phone",
                  "synonyms": ["iphone"]})
    syn.add_json({"id": "id2", "root": "mobile phone",
                  "synonyms": ["samsung phone"]})
    syn.add_json({"id": "id3", "synonyms": ["football", "foot ball"]})
    syn.remove_synonym("id2")

    coll = RayCollection(out, default_sorting_field="points",
                         synonyms=syn)
    coll.add_override(Override(rule_id="include-rule", rule_query="in",
                               match="exact", includes=[(0, 1), (3, 2)]))
    coll.add_override(Override(rule_id="exclude-rule", rule_query="of",
                               match="exact", excludes=[4, 11]))
    coll.add_override(Override(rule_id="deleted-rule", rule_query="of",
                               match="exact"))
    coll.remove_override("deleted-rule")

    reg = CollectionRegistry()
    reg.register("collection1", coll)
    reg.upsert_alias("c1", "collection1")

    r = coll.search("thomas", mode="reference",
                    query_by=["starring", "title"])
    assert len(r["hits"]) == 4
    before = ids(r)
    before_in = ids(coll.search("in", mode="reference"))
    before_of = ids(coll.search("of", mode="reference"))

    manifest = str(tmp_path / "registry.json")
    reg.save(manifest)

    # fresh registry — restores from the manifest + parquet alone
    reg2 = CollectionRegistry.load(manifest)
    coll2 = reg2.get("collection1")
    assert reg2.get("c1") is coll2  # alias restored

    assert coll2.default_sorting_field == "points"
    assert coll2.stats["n_docs"] == len(docs)
    assert set(coll2.get_overrides()) == {"include-rule", "exclude-rule"}

    syns = coll2.synonyms.get_synonyms()
    assert set(syns) == {"id1", "id3"}
    assert syns["id1"]["root"] == "smart phone"
    assert syns["id1"]["synonyms"] == ["iphone"]
    assert syns["id3"]["root"] is None
    assert len(syns["id3"]["synonyms"]) == 2

    # identical results after restore, curation rules intact
    r2 = coll2.search("thomas", mode="reference",
                      query_by=["starring", "title"])
    assert ids(r2) == before
    assert ids(coll2.search("in", mode="reference")) == before_in
    assert before_in[:2] == [0, 3]  # include rule applied
    of2 = ids(coll2.search("of", mode="reference"))
    assert of2 == before_of
    assert 4 not in of2 and 11 not in of2  # exclude rule applied

    # drop removes the collection and its aliases
    reg2.drop("collection1")
    with pytest.raises(KeyError):
        reg2.get("collection1")
    with pytest.raises(KeyError):
        reg2.get("c1")


# -- registry lifecycle ports (collection_manager_test.cpp) ----------------


def test_collection_creation(ray_session, tmp_path):
    # CollectionManagerTest.CollectionCreation (:48-92): id assignment,
    # facet-field extraction, meta round-trip through the manifest
    from typesense_ray.validate import FieldSpec

    reg = CollectionRegistry(root=str(tmp_path))
    fields = [
        FieldSpec("title", "string"),
        FieldSpec("starring", "string"),
        FieldSpec("cast", "string[]", facet=True, optional=True),
        FieldSpec("points", "int32"),
    ]
    c1 = reg.create_collection("collection1", fields, "points",
                               created_at=12345)
    assert reg.get_collection("collection1") is c1
    assert c1.collection_id == 0
    assert [f.name for f in c1.fields if f.facet] == ["cast"]
    assert c1.default_sorting_field == "points"
    assert reg.get_next_collection_id() == 1

    summary = c1.get_summary_json()
    assert summary["created_at"] == 12345
    assert summary["default_sorting_field"] == "points"
    assert summary["fields"] == [
        {"name": "title", "type": "string", "facet": False,
         "optional": False},
        {"name": "starring", "type": "string", "facet": False,
         "optional": False},
        {"name": "cast", "type": "string[]", "facet": True,
         "optional": True},
        {"name": "points", "type": "int32", "facet": False,
         "optional": False},
    ]
    assert reg.collection_meta("collection1") == {
        "id": 0, "created_at": 12345
    }


def test_should_init_collection(ray_session, tmp_path):
    # CollectionManagerTest.ShouldInitCollection (:94-119): rebuild a
    # collection object from persisted meta; created_at defaults to 0
    reg = CollectionRegistry(root=str(tmp_path))
    meta = {
        "name": "foobar", "id": 100,
        "fields": [{"name": "org", "type": "string", "facet": False}],
        "default_sorting_field": "",
    }
    coll = reg.init_collection(meta)
    assert coll.name == "foobar"
    assert coll.collection_id == 100
    assert len(coll.fields) == 1
    assert coll.created_at == 0

    coll = reg.init_collection({**meta, "created_at": 12345})
    assert coll.created_at == 12345


def test_get_all_collections(ray_session, tmp_path):
    # CollectionManagerTest.GetAllCollections (:121-136): most recently
    # created first
    from typesense_ray.validate import FieldSpec

    reg = CollectionRegistry(root=str(tmp_path))
    fields = [FieldSpec("title", "string"), FieldSpec("points", "int32")]
    reg.create_collection("collection1", fields, "points")
    assert [c.name for c in reg.get_collections()] == ["collection1"]

    reg.create_collection("collection2", fields, "points")
    assert [c.name for c in reg.get_collections()] == [
        "collection2", "collection1"
    ]
    reg.drop_collection("collection2")


def test_drop_collection_cleanly(ray_session, tmp_path):
    # CollectionManagerTest.DropCollectionCleanly (:273-304): after the
    # drop the name resolves to nothing and the next collection id is
    # NOT reused
    import json as _json

    from typesense_ray.validate import FieldSpec

    reg = CollectionRegistry(root=str(tmp_path))
    fields = [
        FieldSpec("title", "string"),
        FieldSpec("starring", "string"),
        FieldSpec("cast", "string[]", facet=True, optional=True),
        FieldSpec("points", "int32"),
    ]
    coll = reg.create_collection("collection1", fields, "points")
    coll.add_many([_json.loads(line) for line in open(MUL_JSONL)])

    assert reg.get_collection_with_id(0) is not None
    assert reg.get_collection("collection1") is not None

    reg.drop_collection("collection1")
    assert reg.get_collection("collection1") is None
    assert reg.get_collection_with_id(0) is None
    assert reg.get_next_collection_id() == 1


def test_symlinking(ray_session, tmp_path):
    # CollectionManagerTest.Symlinking (:306-391)
    from typesense_ray.validate import FieldSpec

    reg = CollectionRegistry(root=str(tmp_path))
    fields = [FieldSpec("title", "string"), FieldSpec("points", "int32")]
    reg.create_collection("collection1", fields, "points")

    # resolving on a blank slate → not found
    with pytest.raises(KeyError):
        reg.resolve_symlink("collection")
    assert reg.get_symlinks() == {}

    # symlink name cannot shadow an existing collection
    with pytest.raises(ValueError) as ei:
        reg.upsert_symlink("collection1", "collection_2018")
    assert str(ei.value) == (
        "Name `collection1` conflicts with an existing collection name."
    )

    # insert (dangling target is fine)
    reg.upsert_symlink("collection_link", "collection_2018")
    assert reg.resolve_symlink("collection_link") == "collection_2018"

    reg.upsert_symlink("company", "company_2018")
    assert reg.resolve_symlink("company") == "company_2018"
    assert len(reg.get_symlinks()) == 2

    # update existing symlink
    reg.upsert_symlink("company", "company_2019")
    assert reg.resolve_symlink("company") == "company_2019"

    # add and re-point a symlink against an existing collection
    reg.upsert_symlink("collection1_link", "collection1")
    assert reg.resolve_symlink("collection1_link") == "collection1"
    assert reg.get("collection1_link") is reg.get_collection("collection1")
    reg.upsert_symlink("collection1_link", "collection2")
    assert reg.resolve_symlink("collection1_link") == "collection2"

    # remove a link
    reg.delete_symlink("collection_link")
    with pytest.raises(KeyError):
        reg.resolve_symlink("collection_link")

    # restore state via save/load
    reg.upsert_symlink("company_1", "company_2018")
    reg.upsert_symlink("company_2", "company_2019")
    reg.upsert_symlink("company_3", "company_2020")
    # drop the collection so the manifest holds only symlink state
    reg.drop_collection("collection1")
    manifest = str(tmp_path / "registry.json")
    reg.save(manifest)

    reg2 = CollectionRegistry.load(manifest)
    assert reg2.resolve_symlink("company") == "company_2019"
    assert reg2.resolve_symlink("company_1") == "company_2018"
    assert reg2.resolve_symlink("company_3") == "company_2020"
    assert reg2.get_next_collection_id() == 1


def test_restore_typed_collection_on_restart(ray_session, tmp_path):
    # extends CollectionManagerTest.RestoreRecordsOnRestart (:138-271) to
    # the typed document surface: a reloaded registry restores a MUTABLE
    # collection — declared schema, auto-id sequence, synonyms/overrides
    # — not just a read view, and mutation + validation keep working
    import json as _json

    from typesense_ray.validate import FieldSpec

    root = str(tmp_path)
    reg = CollectionRegistry(root=root)
    coll = reg.create_collection(
        "companies",
        [FieldSpec("company_name", "string"),
         FieldSpec("country", "string", facet=True),
         FieldSpec("num_employees", "int32")],
        "num_employees",
    )
    coll.add_many(
        [_json.dumps({"id": f"c{i}", "company_name": f"Comp {i}",
                      "country": "US" if i % 2 else "DE",
                      "num_employees": 10 * i})
         for i in range(1, 6)]
    )
    coll.add({"company_name": "Auto", "country": "US",
              "num_employees": 1})  # auto-id doc 0 consumes a slot
    reg.upsert_symlink("companies_latest", "companies")
    reg.save()  # defaults to {root}/registry.json

    reg2 = CollectionRegistry.load(root)  # directory form
    c2 = reg2.get("companies_latest")
    assert c2.collection_id == 0
    assert [f.name for f in c2.fields if f.facet] == ["country"]
    assert c2.num_documents == 6

    # schema validation survives the reload
    with pytest.raises(Exception) as ei:
        c2.add({"company_name": "Bad"})
    assert "num_employees" in str(ei.value)

    # mutation works, and the auto-id sequence continues (no collision
    # with the pre-restart auto id)
    c2.add({"company_name": "Wayne", "country": "US",
            "num_employees": 900})  # auto id from the restored sequence
    assert c2.num_documents == 7
    # auto ids are stringified sequence slots; explicit-id docs consume
    # slots too, and a FAILED add burns its slot (the reference's
    # get_next_seq_id is called in to_doc before validation) — so the
    # pre-restart auto doc got "5", the rejected "Bad" doc burned "6",
    # and Wayne got "7". No reuse after reload.
    assert c2.get("5")["company_name"] == "Auto"
    assert c2.get("7")["company_name"] == "Wayne"
