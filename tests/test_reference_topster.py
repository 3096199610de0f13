"""Conformance ports of the reference's Topster cases
(``test/topster_test.cpp``) against this repo's top-k components:
:func:`typesense_ray.collection._dedup_best` (the kv_map
keep-best-per-key role) and :func:`typesense_ray.query.merge_topk`
(the capped multi-score ordered merge).

Ported: MaxIntValues, MaxFloatValues. NOT ported: DistinctIntValues —
its outer-heap score assertions (group 5 surfacing score 9 while its
inner topster holds a 10) encode the heap-slot churn of
``Topster::add``'s distinct path (``include/topster.h:107-167``: the
outer slot is overwritten by the LAST accepted group member), not an
observable search semantic; the observable grouped orderings are
covered by the collection_grouping_test ports instead.

The reference KV's float attributes go through
``Index::float_to_in64_t``, an order-preserving int64 encoding —
MaxFloatValues is the encoding's ordering test (negatives below
positives, -9.999 < -9.998). Our sort keys carry raw floats, so the
same vectors assert the ordering directly."""

import numpy as np

from typesense_ray.collection import _dedup_best
from typesense_ray.query import merge_topk

# (key, match_score, primary_attr, secondary_attr) — topster_test.cpp:9-32
INT_DATA = [
    (1, 11, 20, 30),
    (1, 12, 20, 32),
    (2, 4, 20, 30),
    (3, 7, 20, 30),
    (4, 14, 20, 30),
    (5, 9, 20, 30),
    (5, 10, 20, 32),
    (5, 9, 20, 30),
    (6, 6, 20, 30),
    (7, 6, 22, 30),
    (7, 6, 22, 30),
    (8, 9, 20, 30),
    (9, 8, 20, 30),
    (10, 5, 20, 30),
]

# topster_test.cpp:61-104 (float primary attribute)
FLOAT_DATA = [
    (1, 11, 1.09, 30),
    (2, 11, -20.0, 30),
    (3, 11, -20.0, 30),
    (4, 11, 7.812, 30),
    (4, 11, 7.912, 30),
    (5, 11, 0.0, 34),
    (6, 11, -22.0, 30),
    (7, 11, -22.0, 30),
    (8, 11, -9.998, 30),
    (8, 11, -9.998, 30),
    (9, 11, -9.999, 30),
    (10, 11, -20.0, 30),
]


def _keep_best(rows):
    """kv_map role: per key keep the entry with the best score tuple.
    ``_dedup_best`` reduces (key, score) pairs; the multi-attr vectors
    are folded through it per score column, mirroring the reference's
    lexicographic ``is_greater`` (scores[0], scores[1], scores[2])."""
    keys = np.array([r[0] for r in rows], np.int64)
    # pack the 3 scores into one comparable float via lexicographic
    # weighting — the vectors' attrs are small ints/floats, so scaled
    # packing is exact
    packed = np.array(
        [r[1] * 1e6 + r[2] * 1e2 + r[3] / 1e3 for r in rows], np.float64
    )
    best = _dedup_best(keys, packed)
    by_key = dict(zip(best["cand"].tolist(), best["score"].tolist()))
    out = {}
    for r in rows:
        p = r[1] * 1e6 + r[2] * 1e2 + r[3] / 1e3
        if p == by_key[r[0]]:
            out[r[0]] = r
    return list(out.values())


def test_max_int_values():
    rows = _keep_best(INT_DATA)
    ids = np.array([r[0] for r in rows], np.uint64)
    m = np.array([r[1] for r in rows], np.float64)
    p = np.array([r[2] for r in rows], np.float64)
    s = np.array([r[3] for r in rows], np.float64)
    top = merge_topk([(ids, m, p, s)], 5)
    assert top[0].tolist() == [4, 1, 5, 8, 9]
    by_id = dict(zip(top[0].tolist(), top[1].tolist()))
    # duplicate keys kept their best match score
    assert by_id[1] == 12
    assert by_id[5] == 10


def test_max_float_values():
    rows = _keep_best(FLOAT_DATA)
    ids = np.array([r[0] for r in rows], np.uint64)
    m = np.array([r[1] for r in rows], np.float64)
    p = np.array([r[2] for r in rows], np.float64)
    s = np.array([r[3] for r in rows], np.float64)
    top = merge_topk([(ids, m, p, s)], 5)
    assert top[0].tolist() == [4, 1, 5, 8, 9]
    # the float attribute ordering the reference encodes via
    # float_to_in64_t: dup key 4 kept 7.912 over 7.812; negatives order
    # correctly below zero
    by_id = dict(zip(top[0].tolist(), top[2].tolist()))
    assert by_id[4] == 7.912
    assert by_id[9] == -9.999 and by_id[8] == -9.998
