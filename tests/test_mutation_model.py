"""Model-based fuzz of the typed-collection mutation surface.

A seeded random sequence of create / upsert / update / remove /
remove_if_found ops is applied to BOTH a ``ManagedCollection`` and a
plain-dict model implementing the reference's documented semantics
(``src/collection.cpp`` add/update/remove): create on an existing id is
a 409, update/remove on a missing id is a 404, upsert replaces the
whole document, update merges into the stored one. Every few steps and
at the end, the collection must agree with the model on: document
count, the full wildcard id set, per-id stored field values, a numeric
filter count, and the facet histogram of a facet field.

The conformance ports pin individual reference cases; this drives long
interleavings of them, where staleness bugs (searcher caches, typo
tables, segment surgery) would surface.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from typesense_ray.collection import CollectionRegistry
from typesense_ray.manager import DocumentError
from typesense_ray.validate import FieldSpec

WORDS = ["amber", "basalt", "cobalt", "dune", "ember", "flint",
         "garnet", "hazel", "iris", "jade"]
TAGS = ["red", "green", "blue", "gold"]
IDS = [f"d{i}" for i in range(18)]
STEPS = 60


def _mk_doc(rng) -> dict:
    return {
        "title": " ".join(rng.choice(WORDS, 3)),
        "tag": TAGS[int(rng.integers(0, len(TAGS)))],
        "points": int(rng.integers(0, 100)),
    }


def _check_agreement(coll, model):
    assert coll.num_documents == len(model)
    if not model:
        return
    r = coll.search("*", per_page=250)
    assert r["found"] == len(model)
    got_ids = sorted(h["document"]["id"] for h in r["hits"])
    assert got_ids == sorted(model)
    # per-id stored values
    for did, want in model.items():
        doc = coll.get(did)
        for k, v in want.items():
            assert doc[k] == v, (did, k)
    # numeric filter count
    thr = 50
    rf = coll.search("*", per_page=250, filter_by=f"points:>{thr}")
    assert rf["found"] == sum(1 for d in model.values()
                              if d["points"] > thr)
    # facet histogram
    rfc = coll.search("*", per_page=250, facet_by="tag",
                      max_facet_values=10)
    got = {c["value"]: c["count"]
           for c in rfc.get("facet_counts", [{}])[0].get("counts", [])}
    want_hist: dict[str, int] = {}
    for d in model.values():
        want_hist[d["tag"]] = want_hist.get(d["tag"], 0) + 1
    assert got == want_hist


_FUZZ_SEEDS = (
    [int(s) for s in os.environ["GRAFT_MUTATION_SEEDS"].split(",")]
    if os.environ.get("GRAFT_MUTATION_SEEDS")
    else [11, 23, 47]
)


@pytest.mark.parametrize("seed", _FUZZ_SEEDS)
def test_mutation_sequence_agrees_with_model(ray_session, tmp_path, seed):
    reg = CollectionRegistry(root=str(tmp_path))
    coll = reg.create_collection(
        f"fuzz{seed}",
        [FieldSpec("title", "string"),
         FieldSpec("tag", "string", facet=True),
         FieldSpec("points", "int32")],
        default_sorting_field="points",
    )
    rng = np.random.default_rng(seed)
    model: dict[str, dict] = {}

    for step in range(STEPS):
        did = IDS[int(rng.integers(0, len(IDS)))]
        op = ["create", "upsert", "update", "remove",
              "remove_if_found"][int(rng.integers(0, 5))]
        if op == "create":
            doc = {"id": did, **_mk_doc(rng)}
            if did in model:
                with pytest.raises(DocumentError) as ei:
                    coll.add(doc, action="create")
                assert f"id {did} already exists" in str(ei.value)
            else:
                coll.add(doc, action="create")
                model[did] = {k: v for k, v in doc.items() if k != "id"}
        elif op == "upsert":
            doc = {"id": did, **_mk_doc(rng)}
            coll.add(doc, action="upsert")
            model[did] = {k: v for k, v in doc.items() if k != "id"}
        elif op == "update":
            patch = {"id": did, "points": int(rng.integers(0, 100))}
            if did not in model:
                with pytest.raises(DocumentError) as ei:
                    coll.add(patch, action="update")
                assert "Could not find a document with id" in str(ei.value)
            else:
                coll.add(patch, action="update")
                model[did]["points"] = patch["points"]
        elif op == "remove":
            if did not in model:
                with pytest.raises(DocumentError):
                    coll.remove(did)
            else:
                gone = coll.remove(did)
                assert gone["id"] == did
                del model[did]
        else:
            assert coll.remove_if_found(did) == (did in model)
            model.pop(did, None)
        if step % 9 == 8:
            _check_agreement(coll, model)

    _check_agreement(coll, model)
    # a text query still reaches the surviving docs only
    if model:
        w = next(iter(model.values()))["title"].split()[0]
        r = coll.search(w, per_page=250)
        want = sorted(d for d, doc in model.items()
                      if w in doc["title"].split())
        got = sorted(h["document"]["id"] for h in r["hits"])
        assert got == want
