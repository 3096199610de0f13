import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from typesense_ray.codec import (
    block_max_meta,
    decode_posting_ids,
    decode_positions,
    delta_decode,
    delta_encode,
    encode_posting_ids,
    encode_positions,
    varbyte_decode,
    varbyte_encode,
)


def test_varbyte_roundtrip_simple():
    v = np.array([0, 1, 127, 128, 300, 2**32, 2**63, 2**64 - 1], dtype=np.uint64)
    buf = varbyte_encode(v)
    out = varbyte_decode(buf, len(v))
    np.testing.assert_array_equal(v, out)


def test_varbyte_empty():
    assert varbyte_encode(np.empty(0, np.uint64)) == b""
    assert varbyte_decode(b"").size == 0


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200))
def test_varbyte_roundtrip_property(xs):
    v = np.array(xs, dtype=np.uint64)
    np.testing.assert_array_equal(varbyte_decode(varbyte_encode(v), len(v)), v)


def test_varbyte_compactness():
    # small values use one byte each
    v = np.arange(100, dtype=np.uint64)
    assert len(varbyte_encode(v)) == 100


def test_delta_roundtrip():
    v = np.array([3, 3, 10, 500, 500, 501], dtype=np.uint64)
    np.testing.assert_array_equal(delta_decode(delta_encode(v)), v)


def test_posting_ids_roundtrip():
    ids = np.sort(
        np.random.default_rng(7).choice(10**6, size=5000, replace=False)
    ).astype(np.uint64)
    buf = encode_posting_ids(ids)
    np.testing.assert_array_equal(decode_posting_ids(buf, len(ids)), ids)
    # dense ids should compress far below 8 bytes/id
    assert len(buf) < 3 * len(ids)


def test_positions_roundtrip():
    # three docs with tf 2, 1, 3
    pos = np.array([4, 9, 0, 2, 7, 100], dtype=np.uint64)
    tfs = np.array([2, 1, 3], dtype=np.int64)
    buf = encode_positions(pos, tfs)
    np.testing.assert_array_equal(decode_positions(buf, tfs), pos)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=65535), min_size=1, max_size=20),
        min_size=1,
        max_size=30,
    )
)
def test_positions_roundtrip_property(doc_positions):
    doc_positions = [sorted(p) for p in doc_positions]
    pos = np.array([x for p in doc_positions for x in p], dtype=np.uint64)
    tfs = np.array([len(p) for p in doc_positions], dtype=np.int64)
    buf = encode_positions(pos, tfs)
    np.testing.assert_array_equal(decode_positions(buf, tfs), pos)


def test_block_max_meta():
    n = 300
    ids = np.arange(n, dtype=np.uint64) * 2
    tfs = np.ones(n, dtype=np.int64)
    tfs[130] = 9
    dls = np.full(n, 50, dtype=np.int64)
    dls[5] = 3
    last, max_tf, min_dl = block_max_meta(ids, tfs, dls, block=128)
    assert list(last) == [ids[127], ids[255], ids[299]]
    assert list(max_tf) == [1, 9, 1]
    assert list(min_dl) == [3, 50, 50]


def test_block_max_bound_dominates():
    rng = np.random.default_rng(0)
    n = 1000
    ids = np.sort(rng.choice(10**6, n, replace=False)).astype(np.uint64)
    tfs = rng.integers(1, 20, n)
    dls = rng.integers(5, 500, n)
    last, max_tf, min_dl = block_max_meta(ids, tfs, dls, block=128)
    k1, b, avgdl, idf = 1.2, 0.75, 120.0, 2.5

    def bm25(tf, dl):
        return idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))

    bounds = bm25(max_tf.astype(float), min_dl.astype(float))
    scores = bm25(tfs.astype(float), dls.astype(float))
    for blk in range(len(last)):
        lo, hi = blk * 128, min((blk + 1) * 128, n)
        assert scores[lo:hi].max() <= bounds[blk] + 1e-12
