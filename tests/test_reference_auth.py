"""Conformance port of the reference's auth suite
(``test/auth_manager_test.cpp``): API-key CRUD + restore, the
authenticate action/collection matrix, HMAC scoped keys (the test's own
golden base64 blobs, verified byte-for-byte), and key-definition
validation errors.

Not ported: ``GenerationOfAPIAction`` (:192-216) — it asserts
``route_path::_get_action`` HTTP-route internals; this engine has no
HTTP layer (SURVEY §2) and callers name actions directly.
"""

import json

import pytest

from typesense_ray.auth import (
    FAR_FUTURE_TIMESTAMP,
    ApiKey,
    AuthManager,
    generate_scoped_key,
    hmac_b64,
)
from typesense_ray.manager import DocumentError

FUTURE_TS = 64723363199


def test_create_list_get_delete_keys(tmp_path):
    # AuthManagerTest.CreateListDeleteAPIKeys (:31-90)
    am = AuthManager(str(tmp_path))
    assert am.list_keys() == []

    with pytest.raises(DocumentError) as e:
        am.get_key(0)
    assert e.value.code == 404

    key1 = ApiKey("abcd1", "test key 1", ["read", "write"],
                  ["collection1", "collection2"], FUTURE_TS)
    key2 = ApiKey("abcd2", "test key 2", ["admin"], ["*"], FUTURE_TS)

    assert len(am.create_key(key1).value) == 5
    assert len(am.create_key(key2).value) == 5

    got1 = am.get_key(0)
    assert len(got1.value) == 4
    assert got1.description == "test key 1"
    assert got1.actions == ["read", "write"]
    assert got1.collections == ["collection1", "collection2"]

    got2 = am.get_key(1)
    assert len(got2.value) == 4
    assert got2.description == "test key 2"

    assert len(am.get_key(1, truncate_value=False).value) != 4

    with pytest.raises(DocumentError):
        am.get_key(2, truncate_value=False)

    listed = am.list_keys()
    assert [k.description for k in listed] == ["test key 1", "test key 2"]
    assert [k.value for k in listed] == ["abcd", "abcd"]

    # remove (the D in CRUD; reference wraps a get-miss as 500)
    removed = am.remove_key(0)
    assert removed.value == "abcd"
    assert [k.description for k in am.list_keys()] == ["test key 2"]
    with pytest.raises(DocumentError) as e:
        am.remove_key(0)
    assert e.value.code == 500


def test_restore_of_api_keys(tmp_path):
    # AuthManagerTest.CheckRestoreOfAPIKeys (:92-116)
    am = AuthManager(str(tmp_path))
    v1 = am.create_key(ApiKey("abcd1", "test key 1", ["read", "write"],
                              ["collection1", "collection2"],
                              FUTURE_TS)).value
    v2 = am.create_key(ApiKey("abcd2", "test key 2", ["admin"], ["*"],
                              FUTURE_TS)).value

    am2 = AuthManager(str(tmp_path))
    listed = am2.list_keys()
    assert len(listed) == 2
    assert listed[0].description == "test key 1"
    assert listed[0].value == "abcd" == v1[:4]
    assert listed[0].expires_at == FUTURE_TS
    assert listed[1].description == "test key 2"
    assert listed[1].value == "abcd" == v2[:4]
    assert listed[1].expires_at == FUTURE_TS

    # ids keep incrementing after restore, never reused
    k3 = am2.create_key(ApiKey("abcd3", "k3", ["*"], ["*"]))
    assert k3.id == 2


def test_verify_authentication():
    # AuthManagerTest.VerifyAuthentication (:118-190)
    am = AuthManager()
    p = {}
    assert not am.authenticate("jdlaslasdasd", "", "", p)

    wildcard_all = ApiKey("abcd1", "wildcard all key", ["*"], ["*"],
                          FUTURE_TS)
    am.create_key(wildcard_all)
    assert not am.authenticate("jdlaslasdasd", "documents:create",
                               "collection1", p)
    assert am.authenticate(wildcard_all.value, "metrics:get", "", p)

    wildcard_coll = ApiKey("abcd2", "wildcard coll key", ["*"],
                           ["collection1"], FUTURE_TS)
    am.create_key(wildcard_coll)
    assert not am.authenticate("adasda", "documents:create",
                               "collection1", p)
    assert am.authenticate(wildcard_coll.value, "documents:get",
                           "collection1", p)
    assert not am.authenticate(wildcard_coll.value, "documents:get",
                               "collection2", p)

    wildcard_colls = ApiKey(
        "abcd3", "wildcard coll key", ["*"],
        ["collection1", "collection2", "collection3"], FUTURE_TS)
    am.create_key(wildcard_colls)
    assert am.authenticate(wildcard_colls.value, "documents:get",
                           "collection1", p)
    assert am.authenticate(wildcard_colls.value, "documents:search",
                           "collection2", p)
    assert am.authenticate(wildcard_colls.value, "documents:create",
                           "collection3", p)
    assert not am.authenticate(wildcard_colls.value, "documents:get",
                               "collection4", p)
    assert not am.authenticate(wildcard_colls.value, "documents:get",
                               "*", p)

    one_action = ApiKey("abcd4", "one action key", ["documents:search"],
                        ["collection1", "collection2"], FUTURE_TS)
    am.create_key(one_action)
    assert am.authenticate(one_action.value, "documents:search",
                           "collection1", p)
    assert not am.authenticate(one_action.value, "documents:get",
                               "collection2", p)
    assert not am.authenticate(one_action.value, "documents:search",
                               "collection5", p)
    assert not am.authenticate(one_action.value, "*", "collection2", p)

    mul_acoll = ApiKey("abcd5", "multiple action/collection key",
                       ["documents:get", "collections:list"],
                       ["metacollection", "collection2"], FUTURE_TS)
    am.create_key(mul_acoll)
    assert am.authenticate(mul_acoll.value, "documents:get",
                           "metacollection", p)
    assert am.authenticate(mul_acoll.value, "collections:list",
                           "collection2", p)
    assert am.authenticate(mul_acoll.value, "collections:list",
                           "metacollection", p)
    assert not am.authenticate(mul_acoll.value, "documents:search",
                               "collection2", p)
    assert not am.authenticate(mul_acoll.value, "documents:get",
                               "collection5", p)
    assert not am.authenticate(mul_acoll.value, "*", "*", p)

    # regex collection patterns
    regexp1 = ApiKey("abcd6", "regexp coll key", ["*"], ["coll.*"],
                     FUTURE_TS)
    am.create_key(regexp1)
    assert am.authenticate(regexp1.value, "collections:list",
                           "collection2", p)
    assert am.authenticate(regexp1.value, "documents:get",
                           "collection5", p)

    regexp2 = ApiKey("abcd7", "regexp coll key", ["*"], [".*meta.*"],
                     FUTURE_TS)
    am.create_key(regexp2)
    assert am.authenticate(regexp2.value, "collections:list",
                           "metacollection", p)
    assert am.authenticate(regexp2.value, "collections:list",
                           "ametacollection", p)

    # expiry
    expired = ApiKey("abcd8", "expiry key", ["*"], ["*"], 1606542716)
    am.create_key(expired)
    assert not am.authenticate(expired.value, "collections:list",
                               "collection", p)

    unexpired = ApiKey("abcd9", "expiry key", ["*"], ["*"], 2237712220)
    am.create_key(unexpired)
    assert am.authenticate(unexpired.value, "collections:list",
                           "collection", p)


def test_scoped_api_keys():
    # AuthManagerTest.ScopedAPIKeys (:218-299) — the reference's own
    # golden base64 blobs, byte-for-byte.
    import base64

    am = AuthManager()
    params = {"filter_by": "country:USA"}

    am.create_key(ApiKey("KeyVal", "test key", ["documents:search"],
                         ["coll1"], FUTURE_TS))

    scoped_key = base64.b64encode(
        b'IvjqWNZ5M5ElcvbMoXj45BxkQrZG4ZKEaNQoRioCx2s=KeyV'
        b'{"filter_by": "user_id:1080"}'
    ).decode()

    assert am.authenticate(scoped_key, "documents:search", "coll1", params)
    assert params["filter_by"] == "country:USA&&user_id:1080"

    # scoped to the parent key's collection
    assert not am.authenticate(scoped_key, "documents:search", "coll2",
                               params)
    # scoped to the search action only
    assert not am.authenticate(scoped_key, "documents:create", "coll1",
                               params)
    # corrupted key
    assert not am.authenticate("asdasasd", "documents:search", "coll1",
                               params)

    # empty request params: embedded param is set
    empty_params = {}
    assert am.authenticate(scoped_key, "documents:search", "coll1",
                           empty_params)
    assert empty_params["filter_by"] == "user_id:1080"

    # multiple prefix matches pick the correct underlying key
    am.create_key(ApiKey("KeyVal2", "test key", ["documents:search"],
                         ["coll2"], FUTURE_TS))
    assert not am.authenticate(scoped_key, "documents:search", "coll2",
                               empty_params)

    # parent must allow ONLY documents:search
    am.create_key(ApiKey("AdminKey", "admin key", ["*"], ["*"],
                         FUTURE_TS))
    scoped_key2 = base64.b64encode(
        b'BXbsk+xLT1gxOjDyip6+PE4MtOzOm/H7kbkN1d/j/s4=Admi'
        b'{"filter_by": "user_id:1080"}'
    ).decode()
    assert not am.authenticate(scoped_key2, "documents:search", "coll",
                               empty_params)

    # embedded expires_at in the future (2237712220): accepted, and
    # expires_at itself never leaks into the search params
    am.create_key(ApiKey("ExpireKey", "expire key", ["documents:search"],
                         ["*"], FUTURE_TS))
    empty_params = {}
    scoped_key3 = (
        "K1M2STRDelZYNHpxNGVWUTlBTGpOWUl4dk8wNU8xdnVEZi9aSUcvZE5tcz1FeHBp"
        "eyJmaWx0ZXJfYnkiOiAidXNlcl9pZDoxMDgwIiwgImV4cGlyZXNfYXQiOiAyMjM3"
        "NzEyMjIwfQ=="
    )
    assert am.authenticate(scoped_key3, "documents:search", "coll1",
                           empty_params)
    assert empty_params == {"filter_by": "user_id:1080"}

    # embedded expires_at in the past (1606563316): rejected
    am.create_key(ApiKey("ExpireKey2", "expire key", ["documents:search"],
                         ["*"], FUTURE_TS))
    empty_params = {}
    scoped_key4 = (
        "SXFKNldZZWRiWkVKVmI2RCt3OTlKNHpBZ24yWlRUbEdJdERtTy9IZ2REZz1FeHBp"
        "eyJmaWx0ZXJfYnkiOiAidXNlcl9pZDoxMDgwIiwgImV4cGlyZXNfYXQiOiAxNjA2"
        "NTYzMzE2fQ=="
    )
    assert not am.authenticate(scoped_key4, "documents:search", "coll1",
                               empty_params)

    # embedded expiry beyond the parent's own: parent wins → rejected
    am.create_key(ApiKey("ExpireKey3", "expire key", ["documents:search"],
                         ["*"], 1606563841))
    empty_params = {}
    scoped_key5 = (
        "V3JMNFJlZHRMVStrZHphNFVGZDh4MWltSmx6Yzk2R3QvS2ZwSE8weGRWQT1FeHBp"
        "eyJmaWx0ZXJfYnkiOiAidXNlcl9pZDoxMDgwIiwgImV4cGlyZXNfYXQiOiA2NDcy"
        "MzM2MzIwMH0="
    )
    assert not am.authenticate(scoped_key5, "documents:search", "coll1",
                               empty_params)


def test_validate_bad_key_properties():
    # AuthManagerTest.ValidateBadKeyProperties (:301-343)
    key_obj1 = {"description": "desc", "actions": ["*"],
                "collections": [1]}
    with pytest.raises(DocumentError) as e:
        ApiKey.validate(key_obj1)
    assert str(e.value) == ("Wrong format for `collections`. It should "
                            "be an array of string.")

    key_obj1["actions"] = ["*", 1]
    key_obj1["collections"] = [1, "*"]
    with pytest.raises(DocumentError) as e:
        ApiKey.validate(key_obj1)
    assert str(e.value) == ("Wrong format for `actions`. It should be "
                            "an array of string.")

    key_obj1["actions"] = 1
    key_obj1["collections"] = ["*"]
    with pytest.raises(DocumentError) as e:
        ApiKey.validate(key_obj1)
    assert str(e.value) == ("Wrong format for `actions`. It should be "
                            "an array of string.")

    key_obj2 = {"description": "desc", "actions": ["*"],
                "collections": ["foobar"], "expires_at": -100}
    with pytest.raises(DocumentError) as e:
        ApiKey.validate(key_obj2)
    assert str(e.value) == ("Wrong format for `expires_at`. It should "
                            "be an unsigned integer.")

    key_obj2["expires_at"] = "expiry_ts"
    with pytest.raises(DocumentError) as e:
        ApiKey.validate(key_obj2)
    assert str(e.value) == ("Wrong format for `expires_at`. It should "
                            "be an unsigned integer.")

    key_obj2["expires_at"] = 1606539880
    ApiKey.validate(key_obj2)  # valid — no raise

    # missing mandatory key
    with pytest.raises(DocumentError) as e:
        ApiKey.validate({"actions": ["*"], "collections": ["*"]})
    assert str(e.value) == "Could not find a `description` key."


def test_generate_scoped_key_roundtrip():
    """Client-side generation → server-side verification, including the
    full merge matrix (set / filter_by-compose / override / skip)."""
    am = AuthManager()
    parent = ApiKey("SearchOnlyKey0123", "scoped parent",
                    ["documents:search"], ["*"], FUTURE_TS)
    am.create_key(parent)

    scoped = generate_scoped_key(
        parent.value,
        {"filter_by": "lang:en", "per_page": 5, "q": "override",
         "expires_at": 2237712220})
    assert len(scoped) > 32  # always detected as a scoped key

    params = {"filter_by": "points:>10", "q": "original",
              "sort_by": "points:desc"}
    assert am.authenticate(scoped, "documents:search", "anycoll", params)
    assert params == {
        "filter_by": "points:>10&&lang:en",  # composed
        "q": "override",                     # embedded overrides
        "per_page": 5,                       # absent → set (native type)
        "sort_by": "points:desc",            # untouched
    }

    # the same blob signed by an unknown parent prefix fails
    assert not am.authenticate(
        generate_scoped_key("UnknownParent", {"filter_by": "lang:en"}),
        "documents:search", "anycoll", {})

    # tampering with the embedded params breaks the digest
    import base64
    payload = base64.b64decode(scoped).decode()
    tampered = base64.b64encode(
        (payload[:48] + payload[48:].replace("lang:en", "lang:fr"))
        .encode()).decode()
    assert not am.authenticate(tampered, "documents:search", "anycoll",
                               {})


def test_hmac_matches_reference_golden():
    assert hmac_b64("KeyVal", '{"filter_by": "user_id:1080"}') == \
        "IvjqWNZ5M5ElcvbMoXj45BxkQrZG4ZKEaNQoRioCx2s="


def test_scoped_key_search_integration(ray_session, tmp_path):
    """End-to-end: a scoped key's embedded filter_by constrains what the
    holder can see — search with the enriched params equals a direct
    search with the composed filter."""
    from typesense_ray.collection import CollectionRegistry
    from typesense_ray.validate import FieldSpec

    reg = CollectionRegistry(root=str(tmp_path))
    coll = reg.create_collection(
        "auth_coll",
        [FieldSpec("title", "string"), FieldSpec("user_id", "int32"),
         FieldSpec("points", "int32")],
        "points")
    coll.add_many([
        json.dumps({"title": "hello world", "user_id": 1080,
                    "points": 10}),
        json.dumps({"title": "hello again", "user_id": 1080,
                    "points": 20}),
        json.dumps({"title": "hello there", "user_id": 55,
                    "points": 30}),
        json.dumps({"title": "unrelated doc", "user_id": 1080,
                    "points": 40}),
    ])

    am = AuthManager(str(tmp_path / "auth_state"))
    parent = am.create_key(
        ApiKey("UserScopedParentKey", "per-user search key",
               ["documents:search"], ["auth_coll"], FUTURE_TS))
    scoped = generate_scoped_key(parent.value,
                                 {"filter_by": "user_id:1080"})

    params = {}
    assert am.authenticate(scoped, "documents:search", "auth_coll",
                           params)
    r = coll.search("hello", mode="reference", query_by=["title"],
                    **params)
    got = sorted(h["document"]["user_id"] for h in r["hits"])
    assert got == [1080, 1080]  # the user_id:55 hit is filtered out

    direct = coll.search("hello", mode="reference", query_by=["title"],
                         filter_by="user_id:1080")
    assert [h["document"]["title"] for h in r["hits"]] == \
        [h["document"]["title"] for h in direct["hits"]]

    # the scoped key cannot reach another collection
    assert not am.authenticate(scoped, "documents:search", "other_coll",
                               {})


def test_crafted_scoped_key_with_non_ascii_digest_is_rejected():
    """A tampered scoped key whose digest bytes are non-ASCII must be a
    clean auth failure — hmac.compare_digest raises TypeError on
    non-ASCII str operands, which must never escape into the request
    thread."""
    import base64

    am = AuthManager()
    parent = am.create_key(ApiKey(
        "KeyValKeyValKeyValKeyValKeyVal12", "search only",
        ["documents:search"], ["*"]))
    real = generate_scoped_key("KeyValKeyValKeyValKeyValKeyVal12",
                               {"filter_by": "user_id:1080"})
    payload = base64.b64decode(real).decode()
    forged = base64.b64encode(
        ("é" * 44 + payload[44:]).encode()).decode()
    assert not am.authenticate(forged, "documents:search", "any", {})
    assert parent.id == 0


def test_create_key_rejects_non_string_value():
    """Beyond the reference (which ignores client values entirely): an
    explicit non-string `value` must 400 at validation, not poison the
    key store with TypeErrors."""
    import pytest

    from typesense_ray.errors import DocumentError

    with pytest.raises(DocumentError) as ei:
        ApiKey.validate({"value": 123, "description": "x",
                         "actions": ["*"], "collections": ["*"]})
    assert str(ei.value) == "Wrong format for `value`. It should be a string."
