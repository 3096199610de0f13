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
