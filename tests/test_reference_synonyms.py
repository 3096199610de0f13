"""Conformance ports of the reference's synonyms suite
(``test/collection_synonyms_test.cpp``) not already covered by
``test_reference_corpus.py`` (SynonymReductionOneWay/MultiWay and
ExactMatchRankedSameAsSynonymMatch live there): JSON parsing errors,
multi-set membership, one-way/multi-way search behavior, field
ordering, and the id-keyed store (upsert/delete)."""

import json
import os

import pyarrow as pa
import pytest

from typesense_ray.collection import RayCollection, SynonymIndex
from typesense_ray.index_build import IndexConfig, build_index

MUL_JSONL = "/root/reference/test/multi_field_documents.jsonl"

pytestmark = pytest.mark.skipif(
    not os.path.exists(MUL_JSONL),
    reason="reference corpus not available",
)


def ids(r):
    return [h["document"]["ref_id"] for h in r["hits"]]


@pytest.fixture(scope="module")
def movies_dir(ray_session, tmp_path_factory):
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
    out = str(tmp_path_factory.mktemp("synidx"))
    cfg = IndexConfig(
        text_field="title", id_field="ref_id", sha_field=None, batch_docs=8,
        meta_fields=("ref_id", "title", "starring", "points", "cast"),
        indexed_fields=("starring",),
    )
    build_index(rd.from_arrow(tbl), out, cfg, concurrency=1)
    return out


def test_synonym_parsing_from_json():
    # CollectionSynonymsTest.SynonymParsingFromJson (:57-145)
    syn = SynonymIndex()
    sid = syn.add_json({"id": "syn-1", "root": "Ocean",
                        "synonyms": ["Sea"]})
    assert sid == "syn-1"
    view = syn.to_json()[0]
    assert view["root"] == "ocean" and view["synonyms"] == ["sea"]

    # accepted without root (multi-way)
    syn.add_json({"id": "syn-2", "synonyms": ["Sea", "ocean"]})

    with pytest.raises(ValueError, match="Missing `id` field."):
        syn.add_json({"root": "Ocean", "synonyms": ["Sea"]})
    with pytest.raises(ValueError, match="array of `synonyms`"):
        syn.add_json({"id": "x", "root": "Ocean"})
    with pytest.raises(ValueError, match="valid string array"):
        syn.add_json({"id": "x", "root": "Ocean", "synonyms": ["Sea", 1]})
    with pytest.raises(ValueError, match="array of `synonyms`"):
        syn.add_json({"id": "x", "root": "Ocean", "synonyms": "foo"})
    with pytest.raises(ValueError, match="array of `synonyms`"):
        syn.add_json({"id": "x", "root": "Ocean", "synonyms": []})
    with pytest.raises(ValueError, match="Key `root` should be a string."):
        syn.add_json({"id": "x", "root": 120, "synonyms": ["Sea"]})


def test_synonym_belonging_to_multiple_sets():
    # CollectionSynonymsTest.SynonymBelongingToMultipleSets (:270-293):
    # a window in two multi-way sets expands through BOTH, in set order
    syn = SynonymIndex()
    syn.add_json({"id": "iphone-synonyms",
                  "synonyms": ["i phone", "smart phone"]})
    syn.add_json({"id": "samsung-synonyms",
                  "synonyms": ["smart phone", "galaxy phone",
                               "samsung phone"]})
    out = syn.expand(["smart", "phone"])
    assert out == [["i", "phone"], ["galaxy", "phone"],
                   ["samsung", "phone"]]


def test_one_way_synonym_search(movies_dir):
    # CollectionSynonymsTest.OneWaySynonym (:294-318)
    plain = RayCollection(movies_dir, default_sorting_field="points")
    assert plain.search("ocean", mode="reference")["found"] == 0

    syn = SynonymIndex()
    syn.add_json({"id": "syn-1", "root": "Ocean", "synonyms": ["Sea"]})
    coll = RayCollection(movies_dir, default_sorting_field="points",
                         synonyms=syn)
    r = coll.search("ocean", mode="reference")
    assert r["found"] == 1


def test_multi_way_synonym_search(movies_dir):
    # CollectionSynonymsTest.MultiWaySynonym (:320-371)
    plain = RayCollection(movies_dir, default_sorting_field="points")
    assert plain.search("homǝland", mode="reference")["found"] == 0

    syn = SynonymIndex()
    syn.add_json({"id": "syn-1",
                  "synonyms": ["Home Land", "Homeland", "homǝland"]})
    syn.add_json({"id": "syn-2",
                  "synonyms": ["Samuel L. Jackson", "Sam Jackson",
                               "Leroy"]})
    coll = RayCollection(movies_dir, default_sorting_field="points",
                         synonyms=syn)

    r = coll.search("homǝland", mode="reference")
    assert r["found"] == 1
    assert r["hits"][0]["highlights"][0]["snippet"] == \
        "<mark>Homeland</mark> Security"

    # multi-token replacement searched in a secondary field
    r = coll.search("samuel leroy jackson", mode="reference",
                    query_by=["starring"])
    assert r["found"] == 2
    for h in r["hits"]:
        assert h["document"]["starring"] == "Samuel L. Jackson"

    # synonyms never apply to prefixes
    r = coll.search("ler", mode="reference", query_by=["starring"],
                    prefix=True)
    assert r["found"] == 0


def test_synonym_field_ordering(ray_session, tmp_path):
    # CollectionSynonymsTest.SynonymFieldOrdering (:426-477): a synonym
    # match in an EARLIER query_by field outranks an exact match in a
    # later field
    import ray.data as rd

    records = [
        ("LOL really", "Description 1", 50),
        ("Never stop", "Description 2", 120),
        ("Yes and no", "Laughing out loud sure", 100),
        ("And so on", "Description 3", 250),
    ]
    tbl = pa.table(
        {
            "ref_id": pa.array(range(4), pa.int64()),
            "title": pa.array([r[0] for r in records]),
            "description": pa.array([r[1] for r in records]),
            "points": pa.array([r[2] for r in records], pa.int64()),
        }
    )
    out = str(tmp_path / "fieldorder")
    cfg = IndexConfig(
        text_field="title", id_field="ref_id", sha_field=None, batch_docs=8,
        meta_fields=("ref_id", "title", "description", "points"),
        indexed_fields=("description",),
    )
    build_index(rd.from_arrow(tbl), out, cfg, concurrency=1)

    syn = SynonymIndex()
    syn.add_json({"id": "syn-1", "synonyms": ["Lol", "ROFL", "laughing"]})
    coll = RayCollection(out, default_sorting_field="points", synonyms=syn)

    r = coll.search("laughing", mode="reference",
                    query_by=["title", "description"])
    assert r["found"] == 2
    assert ids(r) == [0, 2]


def test_delete_and_upsert_duplication_of_synonyms():
    # CollectionSynonymsTest.DeleteAndUpsertDuplicationOfSynonms
    # (:478-506): id-keyed store with upsert-replace semantics
    syn = SynonymIndex()
    syn.add_json({"id": "ipod-synonyms",
                  "synonyms": ["ipod", "i pod", "pod"]})
    syn.add_json({"id": "samsung-synonyms",
                  "synonyms": ["s3", "s3 phone", "samsung"]})
    assert len(syn.get_synonyms()) == 2

    syn.remove_synonym("ipod-synonyms")
    assert set(syn.get_synonyms()) == {"samsung-synonyms"}
    # removed rules stop expanding
    assert syn.expand(["ipod"]) == []

    # upsert with the same id replaces the definition
    syn.add_json({"id": "samsung-synonyms", "root": "s3 smartphone",
                  "synonyms": ["s3", "s3 phone", "samsung"]})
    assert len(syn.get_synonyms()) == 1
    upd = syn.get_synonym("samsung-synonyms")
    assert upd["root"] == "s3 smartphone"

    syn.remove_synonym("samsung-synonyms")
    assert syn.get_synonyms() == {}
    assert syn.expand(["s3", "smartphone"]) == []


def test_synonym_json_serialization():
    # CollectionSynonymsTest.SynonymJsonSerialization: the view JSON
    # carries the id, the space-joined root tokens and each synonym's
    # space-joined token string
    syn = SynonymIndex()
    syn.add_json({"id": "ipod-synonyms", "root": "apple ipod",
                  "synonyms": ["ipod", "i pod", "pod"]})
    obj = syn.to_json()[0]
    assert obj["id"] == "ipod-synonyms"
    assert obj["root"] == "apple ipod"
    assert obj["synonyms"] == ["ipod", "i pod", "pod"]
