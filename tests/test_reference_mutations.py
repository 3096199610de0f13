"""Conformance ports of the reference's document-mutation and
validation cases (``test/collection_test.cpp``): ImportDocuments,
ImportDocumentsUpsert, ImportDocumentsUpsertOptional,
IndexingWithBadData, IdFieldShouldBeAString,
AnIntegerCanBePassedToAFloatField, StringArrayFieldShouldNotAllowPlainString,
EmptyIndexShouldNotCrash, CreateCollectionInvalidFieldType,
UpdateDocument, UpdateDocumentSorting, RemoveIfFound,
DeletionOfDocumentArrayFields, SearchingWithMissingFields,
KeywordQueryReturnsResultsBasedOnPerPageParam,
WildcardQueryReturnsResultsBasedOnPerPageParam, PruneFieldsFromDocument,
plus the OptionalFields create-validation tail.

Error strings are asserted verbatim against the reference except the
raw-JSON parse message, which carries the JSON library's own text on
both sides (``Bad JSON: <library detail>``) — only the stable prefix is
asserted there."""

import json
import os

import pytest

from typesense_ray.collection import CollectionRegistry
from typesense_ray.manager import (
    DocumentError,
    ManagedCollection,
    prune_document,
)
from typesense_ray.validate import FieldSpec

MUL_JSONL = "/root/reference/test/multi_field_documents.jsonl"
DOCS_JSONL = "/root/reference/test/documents.jsonl"
NUM_JSONL = "/root/reference/test/numeric_array_documents.jsonl"

pytestmark = pytest.mark.skipif(
    not os.path.exists(MUL_JSONL),
    reason="reference corpus not available",
)

MUL_FIELDS = [
    FieldSpec("title", "string"),
    FieldSpec("starring", "string", facet=True),
    FieldSpec("cast", "string[]"),
    FieldSpec("points", "int32"),
]


def mul_records():
    return [line.strip() for line in open(MUL_JSONL) if line.strip()]


def hit_ids(r):
    return [h["document"]["id"] for h in r["hits"]]


@pytest.fixture()
def reg(ray_session, tmp_path):
    return CollectionRegistry(root=str(tmp_path))


def test_import_documents(reg):
    # CollectionTest.ImportDocuments (:1274-1410)
    coll = reg.create_collection("coll_mul_fields", MUL_FIELDS, "points")
    summary, _ = coll.add_many(mul_records())
    assert summary == {"success": True, "num_imported": 18}

    r = coll.search("Will", mode="reference",
                    query_by=["title", "starring"])
    assert hit_ids(r) == ["3", "2", "1", "0"]

    # empty import handled gracefully
    summary, results = coll.add_many([])
    assert summary == {"success": True, "num_imported": 0}
    assert results == []

    # only bad records rejected (records 2 and 4 are bad)
    more = [
        '{"id": "id1", "title": "Test1", "starring": "Rand Fish", '
        '"points": 12, "cast": ["Tom Skerritt"] }',
        '{"title": 123, "starring": "Jazz Gosh", "points": 23, '
        '"cast": ["Tom Skerritt"] }',
        '{"title": "Test3", "starring": "Brad Fin", "points": 11, '
        '"cast": ["Tom Skerritt"] }',
        '{"title": "Test4", "points": 55, "cast": ["Tom Skerritt"] }',
    ]
    summary, results = coll.add_many(more)
    assert summary == {"success": False, "num_imported": 2}
    assert [r["success"] for r in results] == [True, False, True, False]
    assert results[1]["error"] == "Field `title` must be a string."
    assert results[3]["error"] == (
        "Field `starring` has been declared in the schema, but is not "
        "found in the document."
    )
    assert results[1]["document"] == more[1]

    # duplicate id within one batch: second fails
    more = [
        '{"id": "id2", "title": "Test1", "starring": "Rand Fish", '
        '"points": 12, "cast": ["Tom Skerritt"] }',
        '{"id": "id1", "title": "Test1", "starring": "Rand Fish", '
        '"points": 12, "cast": ["Tom Skerritt"] }',
    ]
    summary, results = coll.add_many(more)
    assert summary == {"success": False, "num_imported": 1}
    assert results[0]["success"] and not results[1]["success"]
    assert results[1]["error"] == "A document with id id1 already exists."
    assert results[1]["document"] == more[1]

    # valid JSON but not a document
    summary, results = coll.add_many(["[]"])
    assert summary == {"success": False, "num_imported": 0}
    assert results[0]["error"] == "Bad JSON: not a properly formed document."
    assert results[0]["document"] == "[]"

    # invalid JSON (library-specific detail; stable prefix only)
    summary, results = coll.add_many(["{"])
    assert summary == {"success": False, "num_imported": 0}
    assert results[0]["error"].startswith("Bad JSON:")
    assert results[0]["document"] == "{"


def test_import_documents_upsert(reg):
    # CollectionTest.ImportDocumentsUpsert (:1029-1188)
    coll = reg.create_collection("coll_mul_fields", MUL_FIELDS, "points")
    summary, _ = coll.add_many(mul_records())
    assert summary == {"success": True, "num_imported": 18}

    r = coll.search("*", mode="reference", filter_by="starring:= [Will Ferrell]",
                    facet_by="starring", per_page=30)
    assert len(r["hits"]) == 2

    more = [
        '{"id": "0", "title": "The Fifth Harry", "starring": "Will Ferrell"}',
        '{"id": "2", "cast": ["Chris Fisher", "Rand Alan"]}',
        '{"id": "18", "title": "Back Again Forest", "points": 45, '
        '"starring": "Ronald Wells", "cast": ["Dant Saren"]}',
        '{"id": "6", "points": 77}',
    ]
    summary, results = coll.add_many(more, action="upsert")
    assert summary == {"success": True, "num_imported": 4}
    assert all(r == {"success": True} for r in results)

    r = coll.search("*", mode="reference", filter_by="starring:= [Will Ferrell]",
                    facet_by="starring", per_page=30)
    assert len(r["hits"]) == 2
    r = coll.search("*", mode="reference", facet_by="starring", per_page=30)
    assert len(r["hits"]) == 19
    assert coll.num_documents == 19

    r = coll.search("back again forest", mode="reference", per_page=30)
    assert len(r["hits"]) == 1
    assert coll.get("18")["title"] == "Back Again Forest"

    r = coll.search("fifth", mode="reference")
    assert len(r["hits"]) == 2
    assert (r["hits"][0]["highlights"][0]["snippet"]
            == "The <mark>Fifth</mark> Harry")
    assert (r["hits"][1]["highlights"][0]["snippet"]
            == "The Woman in the <mark>Fifth</mark> from Kristin")

    assert coll.search("burgundy", mode="reference")["hits"] == []
    assert len(coll.search("harry", mode="reference")["hits"]) == 1
    r = coll.search("captain america", mode="reference")
    assert len(r["hits"]) == 1
    assert r["hits"][0]["document"]["points"] == 77

    # upserting with some bad docs: new docs must be complete
    more = [
        '{"id": "1", "title": "Wake up, Harry"}',
        '{"id": "90", "cast": ["Kim Werrel", "Random Wake"]}',
        '{"id": "5", "points": 60}',
        '{"id": "24", "starring": "John", "cast": ["John Kim"], "points": 11}',
    ]
    summary, results = coll.add_many(more, action="upsert")
    assert summary == {"success": False, "num_imported": 2}
    assert not results[1]["success"] and not results[3]["success"]
    assert results[1]["error"] == (
        "Field `points` has been declared as a default sorting field, "
        "but is not found in the document."
    )
    assert results[3]["error"] == (
        "Field `title` has been declared in the schema, but is not "
        "found in the document."
    )

    # duplicates without upsert
    more = ['{"id": "1", "title": "Wake up, Harry"}',
            '{"id": "5", "points": 60}']
    summary, results = coll.add_many(more)
    assert summary == {"success": False, "num_imported": 0}
    assert results[0]["error"] == "A document with id 1 already exists."
    assert results[1]["error"] == "A document with id 5 already exists."

    # UPDATE with verbatim fields except points
    more = ['{"id": "3", "cast":["Matt Damon","Ben Affleck","Minnie Driver"],'
            '"points":70,"starring":"Robin Williams",'
            '"title":"Good Will Hunting"}']
    summary, _ = coll.add_many(more, action="update")
    assert summary == {"success": True, "num_imported": 1}
    r = coll.search("Good Will Hunting", mode="reference")
    assert r["hits"][0]["document"]["points"] == 70

    # UPDATE of a missing doc fails with 404, others succeed
    more = ['{"id": "20", "points": 51}', '{"id": "1", "points": 64}']
    summary, results = coll.add_many(more, action="update")
    assert summary == {"success": False, "num_imported": 1}
    assert not results[0]["success"] and results[1]["success"]
    assert results[0]["error"] == "Could not find a document with id: 20"
    assert results[0]["code"] == 404
    r = coll.search("wake up harry", mode="reference")
    assert r["hits"][0]["document"]["points"] == 64

    # CREATE on existing ids → 409 for both
    more = ['{"id": "2", "points": 51}', '{"id": "1", "points": 64}']
    summary, results = coll.add_many(more)
    assert summary == {"success": False, "num_imported": 0}
    assert results[0]["error"] == "A document with id 2 already exists."
    assert results[1]["error"] == "A document with id 1 already exists."
    assert results[0]["code"] == 409 and results[1]["code"] == 409


def test_import_documents_upsert_optional(reg):
    # CollectionTest.ImportDocumentsUpsertOptional (:1191-1272) — the
    # searchable field is an OPTIONAL string[]; 1000 docs created
    # without it, then twice upserted with it
    coll = reg.create_collection(
        "coll1",
        [FieldSpec("title", "string[]", optional=True),
         FieldSpec("points", "int32")],
        "points",
    )
    n = 1000
    records = [json.dumps({"id": str(i), "points": i}) for i in range(n)]
    summary, _ = coll.add_many(records)
    assert summary == {"success": True, "num_imported": n}

    def texts(i, salt):
        return [" ".join(f"w{(i * 7 + j * 13 + k + salt) % 100}"
                         for k in range(10)) for j in range(4)]

    records = [json.dumps({"id": str(i), "title": texts(i, 0)})
               for i in range(n)]
    summary, _ = coll.add_many(records, action="upsert")
    assert summary == {"success": True, "num_imported": n}

    records = [json.dumps({"id": str(i), "title": texts(i, 1)})
               for i in range(n)]
    summary, _ = coll.add_many(records, action="upsert")
    assert summary == {"success": True, "num_imported": n}
    assert coll.num_documents == n


def test_indexing_with_bad_data(reg):
    # CollectionTest.IndexingWithBadData (:1578-1658)
    coll = reg.create_collection(
        "sample_collection",
        [FieldSpec("name", "string"),
         FieldSpec("tags", "string[]", facet=True),
         FieldSpec("age", "int32"),
         FieldSpec("average", "int32")],
        "age",
    )

    def err(rec, action="create"):
        with pytest.raises(DocumentError) as ei:
            coll.add(rec, action)
        return str(ei.value), ei.value.code

    assert err('{"name": "foo", "age": 29, "average": 78}')[0] == (
        "Field `tags` has been declared in the schema, but is not found "
        "in the document."
    )
    assert err('{"namez": "foo", "tags": [], "age": 34, "average": 78}')[0] == (
        "Field `name` has been declared in the schema, but is not found "
        "in the document."
    )
    assert err('{"name": "foo", "age": 34, "average": 78}')[0] == (
        "Field `tags` has been declared in the schema, but is not found "
        "in the document."
    )
    assert err('{"name": "foo", "age": 34, "avg": 78, '
               '"tags": ["red", "blue"]}')[0] == (
        "Field `average` has been declared in the schema, but is not "
        "found in the document."
    )
    assert err('{"name": "foo", "age": 34, "tags": 22, "average": 78}')[0] \
        == "Field `tags` must be a string array."
    # empty array is fine
    coll.add('{"name": "foo", "age": 34, "tags": [], "average": 34}')
    assert err('{"name": "foo", "age": "34", "tags": [], "average": 34 }')[0] \
        == "Default sorting field `age` must be a single valued numerical field."
    assert err('{"name": "foo", "tags": [], "average": 34 }')[0] == (
        "Field `age` has been declared as a default sorting field, but "
        "is not found in the document."
    )
    assert err('{"name": "foo", "age": 34, "tags": [], "average": "34"}')[0] \
        == "Field `average` must be an int32."
    msg, _ = err('{"name": "foo", "age": asdadasd, "tags": [], "average": 34 }')
    assert msg.startswith("Bad JSON:")

    # pre-existing id
    doc = '{"id": "100", "name": "foo", "age": 29, "tags": [], "average": 78}'
    coll.add(doc)
    msg, code = err(doc)
    assert msg == "A document with id 100 already exists."
    assert code == 409


def test_id_field_should_be_a_string(reg):
    # CollectionTest.IdFieldShouldBeAString (:1681-1708)
    coll = reg.create_collection(
        "coll1",
        [FieldSpec("name", "string"), FieldSpec("tags", "string[]"),
         FieldSpec("age", "int32"), FieldSpec("average", "int32")],
        "age",
    )
    with pytest.raises(DocumentError) as ei:
        coll.add({"id": 101010, "name": "Jane", "age": 25, "average": 98,
                  "tags": ["tag1"]})
    assert str(ei.value) == "Document's `id` field should be a string."


def test_an_integer_can_be_passed_to_a_float_field(reg):
    # CollectionTest.AnIntegerCanBePassedToAFloatField (:1711-1732)
    coll = reg.create_collection(
        "coll1",
        [FieldSpec("name", "string"), FieldSpec("average", "float")],
        "average",
    )
    coll.add({"id": "101010", "name": "Jane", "average": 98})
    assert coll.get("101010")["average"] == 98.0


def test_string_array_field_should_not_allow_plain_string(reg):
    # CollectionTest.StringArrayFieldShouldNotAllowPlainString (:1986-2009)
    coll = reg.create_collection(
        "coll1",
        [FieldSpec("categories", "string[]", facet=True),
         FieldSpec("points", "int32")],
        "points",
    )
    with pytest.raises(DocumentError) as ei:
        coll.add({"id": "100", "categories": "Should not be allowed!",
                  "points": 25})
    assert str(ei.value) == "Field `categories` must be a string array."


def test_empty_index_should_not_crash(reg):
    # CollectionTest.EmptyIndexShouldNotCrash (:1661-1679)
    coll = reg.create_collection(
        "empty_coll",
        [FieldSpec("name", "string"), FieldSpec("tags", "string[]"),
         FieldSpec("age", "int32"), FieldSpec("average", "int32")],
        "age",
    )
    assert coll.search("a", mode="reference", query_by=["name"])["hits"] == []


def test_create_collection_invalid_field_type(reg):
    # CollectionTest.CreateCollectionInvalidFieldType (:2617-2632)
    with pytest.raises(DocumentError) as ei:
        reg.create_collection(
            "coll1",
            [FieldSpec("title", "blah", facet=True),
             FieldSpec("points", "int")],
            None,
        )
    assert str(ei.value) == (
        "Field `title` has an invalid data type `blah`, see docs for "
        "supported data types."
    )


def test_default_sorting_field_cannot_be_optional(reg):
    # CollectionTest.OptionalFields tail (:2506-2515)
    with pytest.raises(DocumentError) as ei:
        reg.create_collection(
            "coll2",
            [FieldSpec("title", "string"),
             FieldSpec("score", "int32", optional=True)],
            "score",
        )
    assert str(ei.value) == (
        "Default sorting field `score` cannot be an optional field."
    )


def test_update_document(reg):
    # CollectionTest.UpdateDocument (:2136-2298)
    coll = reg.create_collection(
        "coll1",
        [FieldSpec("title", "string", facet=True),
         FieldSpec("tags", "string[]", facet=True),
         FieldSpec("points", "int32")],
        "points",
    )
    doc = {"id": "100",
           "title": "The quick brown fox jumped over the lazy dog and ran"
                    " straight to the forest to sleep.",
           "tags": ["NEWS", "LAZY"], "points": 25}
    coll.add(dict(doc))

    r = coll.search("lazy", mode="reference", facet_by="tags")
    assert len(r["hits"]) == 1
    assert r["hits"][0]["document"]["title"] == doc["title"]

    # reindex verbatim via upsert
    coll.add(dict(doc), action="upsert")
    r = coll.search("lazy", mode="reference", facet_by="tags")
    assert len(r["hits"]) == 1
    fc = r["facet_counts"][0]
    assert fc["field_name"] == "tags"
    assert {(c["value"], c["count"]) for c in fc["counts"]} == {
        ("NEWS", 1), ("LAZY", 1)
    }

    # change title, search for an older token
    doc["title"] = "The quick brown fox."
    coll.add(dict(doc), action="upsert")
    assert coll.num_documents == 1
    assert coll.search("lazy", mode="reference", facet_by="tags")["hits"] == []
    r = coll.search("quick", mode="reference", facet_by="title")
    assert len(r["hits"]) == 1
    assert r["hits"][0]["document"]["title"] == "The quick brown fox."

    # update tags without id
    with pytest.raises(DocumentError) as ei:
        coll.add({"tags": ["SENTENCE"]}, action="update")
    assert str(ei.value) == "For update, the `id` key must be provided."

    coll.add({"id": "100", "tags": ["SENTENCE"]}, action="update")
    assert coll.search("NEWS", mode="reference", query_by=["tags"],
                       facet_by="tags")["hits"] == []
    r = coll.search("SENTENCE", mode="reference", query_by=["tags"],
                    facet_by="tags")
    assert len(r["hits"]) == 1
    assert r["facet_counts"][0]["counts"][0]["value"] == "SENTENCE"

    # change points
    coll.add({"id": "100", "points": 99}, action="update")
    r = coll.search("*", mode="reference", filter_by="points: > 90",
                    facet_by="tags")
    assert len(r["hits"]) == 1
    assert r["hits"][0]["document"]["points"] == 99

    # id passed by param
    coll.add({"points": 105}, action="upsert", id_param="100")
    r = coll.search("*", mode="reference", filter_by="points: > 101")
    assert len(r["hits"]) == 1
    assert r["hits"][0]["document"]["points"] == 105

    # bad value → old doc retained
    with pytest.raises(DocumentError):
        coll.add({"points": "abc"}, action="upsert", id_param="100")
    r = coll.search("*", mode="reference", filter_by="points: > 101")
    assert len(r["hits"]) == 1
    assert r["hits"][0]["document"]["points"] == 105

    # explicit path id mismatch
    with pytest.raises(DocumentError) as ei:
        coll.add({"id": "800", "title": "The Secret Seven", "points": 250,
                  "tags": ["BOOK", "ENID BLYTON"]}, action="upsert",
                 id_param="799")
    assert str(ei.value) == (
        "The `id` of the resource does not match the `id` in the JSON body."
    )
    assert ei.value.code == 400

    # empty id
    with pytest.raises(DocumentError) as ei:
        coll.add({"id": "", "title": "The Secret Seven", "points": 250,
                  "tags": ["BOOK", "ENID BLYTON"]}, action="update")
    assert str(ei.value) == "The `id` should not be empty."
    assert ei.value.code == 400


def test_update_document_sorting(reg):
    # CollectionTest.UpdateDocumentSorting (:2301-2357)
    coll = reg.create_collection(
        "coll1",
        [FieldSpec("title", "string", facet=True),
         FieldSpec("tags", "string[]", facet=True),
         FieldSpec("points", "int32")],
        "points",
    )
    doc1 = {"id": "100",
            "title": "The quick brown fox jumped over the lazy dog and ran"
                     " straight to the forest to sleep.",
            "tags": ["NEWS", "LAZY"], "points": 100}
    doc2 = {"id": "101", "title": "The random sentence.",
            "tags": ["RANDOM"], "points": 101}
    coll.add(dict(doc1))
    coll.add(dict(doc2))

    r = coll.search("*", mode="reference", sort_by="points:desc",
                    facet_by="tags")
    assert [(h["document"]["id"], h["document"]["points"])
            for h in r["hits"]] == [("101", 101), ("100", 100)]

    doc1["points"] = 1000
    coll.add(dict(doc1), action="update")
    r = coll.search("*", mode="reference", sort_by="points:desc",
                    facet_by="tags")
    assert [(h["document"]["id"], h["document"]["points"])
            for h in r["hits"]] == [("100", 1000), ("101", 101)]


def test_remove_if_found(reg):
    # CollectionTest.RemoveIfFound (:2571-2614)
    coll = reg.create_collection(
        "coll1",
        [FieldSpec("title", "string", facet=True),
         FieldSpec("points", "int32")],
        "points",
    )
    summary, _ = coll.add_many(
        [{"id": str(i), "title": f"Title {i}", "points": i}
         for i in range(10)]
    )
    assert summary["num_imported"] == 10
    assert coll.search("*", mode="reference")["found"] == 10

    assert coll.remove_if_found(0) is True
    with pytest.raises(DocumentError) as ei:
        coll.get("0")
    assert ei.value.code == 404

    assert coll.remove_if_found(100) is False


def test_deletion_of_document_array_fields(reg):
    # CollectionTest.DeletionOfDocumentArrayFields (:1816-1880)
    coll = reg.create_collection(
        "coll1",
        [FieldSpec("strarray", "string[]"),
         FieldSpec("int32array", "int32[]"),
         FieldSpec("int64array", "int64[]"),
         FieldSpec("floatarray", "float[]"),
         FieldSpec("boolarray", "bool[]"),
         FieldSpec("points", "int32")],
        "points",
    )
    coll.add({
        "id": "100",
        "strarray": ["Cell Phones", "Cell Phone Accessories",
                     "Cell Phone Cases & Clips"],
        "int32array": [100, 200, 300],
        "int64array": [1582369739000, 1582369739000, 1582369739000],
        "floatarray": [19.99, 400.999],
        "boolarray": [True, False, True],
        "points": 25,
    })
    r = coll.search("phone", mode="reference", query_by=["strarray"])
    assert r["found"] == 1

    coll.remove("100")
    r = coll.search("phone", mode="reference", query_by=["strarray"])
    assert r["found"] == 0
    # the index itself must be empty, not just the result set
    assert coll.num_documents == 0
    assert coll.searcher.stats["n_postings"] == 0


def test_searching_with_missing_fields(reg):
    # CollectionTest.SearchingWithMissingFields (:1521-1576)
    coll = reg.create_collection(
        "coll_array_fields",
        [FieldSpec("name", "string"),
         FieldSpec("age", "int32"),
         FieldSpec("years", "int32[]"),
         FieldSpec("timestamps", "int64[]"),
         FieldSpec("tags", "string[]", facet=True)],
        "age",
    )
    records = [line.strip() for line in open(NUM_JSONL) if line.strip()]
    summary, _ = coll.add_many(records)
    assert summary["success"]

    with pytest.raises(ValueError) as ei:
        coll.search("the", mode="reference", query_by=["titlez"])
    assert str(ei.value) == (
        "Could not find a field named `titlez` in the schema."
    )
    with pytest.raises(ValueError) as ei:
        coll.search("the", mode="reference", query_by=["age"])
    assert str(ei.value) == (
        "Field `age` should be a string or a string array."
    )
    with pytest.raises(ValueError) as ei:
        coll.search("the", mode="reference", query_by=["name"],
                    facet_by="timestamps")
    assert str(ei.value) == (
        "Could not find a facet field named `timestamps` in the schema."
    )
    with pytest.raises(ValueError) as ei:
        coll.search("the", mode="reference", query_by=["name"],
                    sort_by="timestamps:asc")
    assert str(ei.value) == (
        "Could not find a field named `timestamps` in the schema for "
        "sorting."
    )
    with pytest.raises(ValueError) as ei:
        coll.search("the", mode="reference", query_by=["name"],
                    sort_by="_rank:asc")
    assert str(ei.value) == (
        "Could not find a field named `_rank` in the schema for sorting."
    )


def test_keyword_query_per_page_param(reg):
    # CollectionTest.KeywordQueryReturnsResultsBasedOnPerPageParam
    # (:947-1017): prefix query 'w' over title+starring
    coll = reg.create_collection(
        "coll_mul_fields",
        MUL_FIELDS + [FieldSpec("starring_facet", "string", facet=True)],
        "points",
    )
    summary, _ = coll.add_many(mul_records())
    assert summary["num_imported"] == 18

    kw = dict(mode="reference", query_by=["title", "starring"],
              prefix=True, drop_tokens_threshold=1000)
    r = coll.search("w", per_page=3, **kw)
    assert len(r["hits"]) == 3 and r["found"] == 7

    with pytest.raises(ValueError) as ei:
        coll.search("w", per_page=251, **kw)
    assert str(ei.value) == "Only upto 250 hits can be fetched per page."

    with pytest.raises(ValueError) as ei:
        coll.search("w", per_page=10, page=0, **kw)
    assert str(ei.value) == "Page must be an integer of value greater than 0."

    for page, n in [(1, 3), (2, 3), (3, 1)]:
        r = coll.search("w", per_page=3, page=page, **kw)
        assert len(r["hits"]) == n and r["found"] == 7


def test_wildcard_query_per_page_param(reg):
    # CollectionTest.WildcardQueryReturnsResultsBasedOnPerPageParam
    # (:2520-2569): the main 25-doc title corpus
    coll = reg.create_collection(
        "collection",
        [FieldSpec("title", "string"), FieldSpec("points", "int32")],
        "points",
    )
    coll.add({"points": 10, "title": "z"})  # dummy record id 0
    summary, _ = coll.add_many(
        [line.strip() for line in open(DOCS_JSONL) if line.strip()]
    )
    assert summary["num_imported"] == 24

    r = coll.search("*", mode="reference", per_page=12)
    assert len(r["hits"]) == 12 and r["found"] == 25
    r = coll.search("*", mode="reference", per_page=100)
    assert len(r["hits"]) == 25 and r["found"] == 25

    with pytest.raises(ValueError):
        coll.search("*", mode="reference", per_page=251)
    with pytest.raises(ValueError):
        coll.search("*", mode="reference", per_page=10, page=0)

    for page, n in [(1, 10), (2, 10), (3, 5)]:
        r = coll.search("*", mode="reference", per_page=10, page=page)
        assert len(r["hits"]) == n and r["found"] == 25


def test_prune_fields_from_document():
    # CollectionTest.PruneFieldsFromDocument (:1951-1984)
    def doc():
        return {"one": 1, "two": 2, "three": 3, "four": 4}

    assert prune_document(doc(), {"one", "two"}) == {"one": 1, "two": 2}
    assert prune_document(doc(), {"one"}, {"one"}) == {}
    assert prune_document(doc(), (), {"three"}) == {
        "one": 1, "two": 2, "four": 4
    }
    assert prune_document(doc()) == doc()
    assert prune_document(doc(), {"notfound"}) == {}
    assert prune_document(doc(), (), {"notfound"}) == doc()


def test_stateful_remove_docs(ray_session, tmp_path):
    # CoreAPIUtilsTest.StatefulRemoveDocs (test/core_api_utils_test.cpp:
    # 36-118): filter-matched deletion counts across successive deletes,
    # plus the malformed-filter error. The reference drains ids in
    # batches of 4/5/7 with resumable offsets; our delete is one
    # parallel pass, so the per-batch waypoints collapse into the same
    # final counts.
    reg = CollectionRegistry(root=str(tmp_path))
    coll = reg.create_collection(
        "coll1",
        [FieldSpec("title", "string"), FieldSpec("points", "int32")],
        "points",
    )
    summary, _ = coll.add_many(
        [{"id": str(i), "title": f"Title {i}", "points": i}
         for i in range(100)]
    )
    assert summary["num_imported"] == 100

    # single document match
    assert coll.remove_by_filter("points: 99") == 1
    # match 11 documents (points 0..10)
    assert coll.remove_by_filter("points:< 11") == 11
    # match 9 documents (11..19 — 0..10 already gone)
    assert coll.remove_by_filter("points:< 20") == 9
    assert coll.num_documents == 79

    # bad filter query
    with pytest.raises(ValueError) as ei:
        coll.remove_by_filter("bad filter")
    assert str(ei.value) == "Could not parse the filter query."


def test_scrub_reindex_doc():
    """Ports IndexTest.ScrubReindexDoc (test/index_test.cpp:5-59):
    fields whose update value equals the old value are erased from both
    the del and update docs; changed fields, the id, and keys outside
    the search schema survive."""
    from typesense_ray.ops import scrub_reindex_doc

    schema = [
        FieldSpec("title", "string"),
        FieldSpec("points", "int32"),
        FieldSpec("cast", "string[]"),
        FieldSpec("movie", "bool"),
    ]
    old_doc = {
        "id": "1",
        "title": "One more thing.",
        "points": 100,
        "cast": ["John Wick", "Jeremy Renner"],
        "movie": True,
    }

    # all fields remain the same → only id survives
    update_doc1 = dict(old_doc)
    del_doc1 = dict(old_doc)
    scrub_reindex_doc(update_doc1, del_doc1, old_doc, schema)
    assert del_doc1 == {"id": "1"}

    # only some fields updated → unchanged 'points' is scrubbed,
    # changed 'cast' stays
    update_doc2 = {"id": "1", "points": 100, "cast": ["Jack"]}
    del_doc2 = dict(update_doc2)
    scrub_reindex_doc(update_doc2, del_doc2, old_doc, schema)
    assert del_doc2 == {"id": "1", "cast": ["Jack"]}

    # keys not in the search schema always survive
    update_doc3 = {"id": "1", "title": "The Lawyer", "foo": "Bar"}
    del_doc3 = dict(update_doc3)
    scrub_reindex_doc(update_doc3, del_doc3, old_doc, schema)
    assert del_doc3 == {"id": "1", "title": "The Lawyer", "foo": "Bar"}

    # nlohmann equality is type-sensitive for bools: movie 1 vs True is
    # a CHANGE (not scrubbed), while int-vs-float numeric equality is a
    # match
    update_doc4 = {"id": "1", "movie": 1, "points": 100.0}
    del_doc4 = dict(update_doc4)
    scrub_reindex_doc(update_doc4, del_doc4, old_doc, schema)
    assert del_doc4 == {"id": "1", "movie": 1}


def test_int64_overflow_is_a_per_record_error(reg):
    """An int beyond int64 must fail validation per-record (the
    reference's nlohmann parser stores it as double, failing
    is_number_integer) — never OverflowError inside the Arrow commit,
    which would lose every other staged doc in the batch."""
    coll = reg.create_collection(
        "big", [FieldSpec("title", "string"),
                FieldSpec("n", "int64")], None)
    summary, results = coll.add_many([
        {"title": "ok", "n": 2**63 - 1},
        {"title": "too big", "n": 2**63},
        {"title": "too small", "n": -(2**63) - 1},
    ])
    assert summary == {"success": False, "num_imported": 1}
    assert results[0]["success"] is True
    assert results[1]["success"] is False and results[1]["code"] == 400
    assert results[1]["error"] == "Field `n` must be an int64."
    assert results[2]["success"] is False
    assert coll.num_documents == 1


def test_unserializable_record_is_a_per_record_error(reg):
    """A dict record that json.dumps cannot serialize must produce a
    per-record failure, not a TypeError aborting the whole add_many
    batch before any result is built."""
    coll = reg.create_collection(
        "rawbytes", [FieldSpec("title", "string")], None)
    summary, results = coll.add_many([
        {"title": "fine"},
        {"title": b"bytes are not json"},
    ])
    assert summary["num_imported"] == 1
    assert results[0] == {"success": True}
    assert results[1]["success"] is False and results[1]["code"] == 400
    assert coll.num_documents == 1


def test_auto_id_sequence_survives_stale_registry_snapshot(reg, tmp_path):
    """_next_seq persists with the INDEX at every commit (next_seq.json),
    so reloading from a registry snapshot older than the last commit
    must not rewind the sequence and overwrite documents whose auto ids
    were consumed after the snapshot."""
    from typesense_ray.manager import ManagedCollection

    coll = reg.create_collection(
        "seq", [FieldSpec("title", "string")], None)
    coll.add_many([{"title": f"doc {i}"} for i in range(3)])  # ids 0..2
    stale_next_seq = 1  # pretend the registry snapshot predates 2 adds

    fresh = ManagedCollection("seq", coll.index_dir, coll.fields, None)
    fresh._next_seq = max(stale_next_seq, fresh._next_seq)  # load path
    assert fresh._next_seq == 3  # sidecar wins over the stale snapshot
    doc = fresh.add({"title": "new"})
    assert doc["id"] == "3"
    assert fresh.num_documents == 4
    assert fresh.get("0")["title"] == "doc 0"  # nothing overwritten
