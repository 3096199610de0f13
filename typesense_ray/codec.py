"""Posting-list codecs: delta + varbyte, with block-max skip metadata.

Plays the role of the reference's Frame-of-Reference bit-packing
(``src/sorted_array.cpp:5-20`` for sorted doc-id lists,
``src/array.cpp:44-59`` for position arrays) but uses the encoding the
north rule specifies: delta + varbyte (LEB128, 7 bits per byte,
little-endian) with per-block maxima for block-max scoring.

All encode/decode paths are numpy-vectorized — no per-integer Python loop:
encode scatters each value's bytes with masked writes per byte-position
(≤10 iterations total, independent of array length); decode reassembles
values with ``np.add.reduceat`` over continuation-bit segments.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # postings per block-max entry


def varbyte_encode_raw(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """LEB128-encode a uint64 array; returns (byte array, bytes-per-value).
    The per-value lengths let callers slice one big encoded stream into
    per-term / per-part chunks without re-encoding (see
    :func:`slice_encoded`)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, np.uint8), np.empty(0, np.int64)
    # bytes needed per value: ceil(bit_length/7), min 1 — computed by
    # repeated 7-bit shifts (≤10 iterations, vectorized)
    nbytes = np.ones(v.shape, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nbytes += (tmp > 0).astype(np.int64)
        tmp >>= np.uint64(7)
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    # start offset of each value's byte run
    starts = np.zeros(v.shape, dtype=np.int64)
    np.cumsum(nbytes[:-1], out=starts[1:])
    ends = starts + nbytes - 1
    shifted = v.copy()
    pos = starts.copy()
    alive = np.ones(v.shape, dtype=bool)
    while alive.any():
        idx = pos[alive]
        byte = (shifted[alive] & np.uint64(0x7F)).astype(np.uint8)
        # continuation bit on every byte except the value's last
        cont = (idx < ends[alive]).astype(np.uint8) << 7
        out[idx] = byte | cont
        shifted[alive] >>= np.uint64(7)
        pos[alive] += 1
        alive = alive & (pos <= ends)
    return out, nbytes


def varbyte_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array (vectorized)."""
    out, _ = varbyte_encode_raw(values)
    return out.tobytes()


def slice_encoded(
    buf: np.ndarray, nbytes: np.ndarray, part_starts: np.ndarray
) -> list[bytes]:
    """Split one encoded stream into per-part byte strings, where
    ``part_starts`` are *value* indices (e.g. term boundaries)."""
    if nbytes.size == 0:
        return []
    byte_offsets = np.zeros(nbytes.size + 1, dtype=np.int64)
    np.cumsum(nbytes, out=byte_offsets[1:])
    starts_b = byte_offsets[part_starts]
    ends_b = np.append(byte_offsets[part_starts[1:]], byte_offsets[-1])
    raw = buf.tobytes()
    return [raw[s:e] for s, e in zip(starts_b, ends_b)]


def varbyte_decode(buf: bytes | memoryview, count: int | None = None) -> np.ndarray:
    """Decode a LEB128 byte string back to a uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = b < 128  # terminator bytes (no continuation bit)
    ends = np.flatnonzero(is_last)
    if ends.size == 0 or ends[-1] != b.size - 1:
        raise ValueError("varbyte_decode: truncated or corrupt stream")
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    # within-run byte offsets → shifts of 7*offset
    run_ids = np.cumsum(is_last) - is_last  # index of the run each byte belongs to
    offsets = np.arange(b.size, dtype=np.int64) - starts[run_ids]
    contrib = (b.astype(np.uint64) & np.uint64(0x7F)) << (
        np.uint64(7) * offsets.astype(np.uint64)
    )
    vals = np.add.reduceat(contrib, starts)
    if count is not None and vals.size != count:
        raise ValueError(f"varbyte_decode: expected {count} values, got {vals.size}")
    return vals


def delta_encode(sorted_values: np.ndarray) -> np.ndarray:
    """First value verbatim, then gaps. Input must be non-decreasing."""
    v = np.ascontiguousarray(sorted_values, dtype=np.uint64)
    if v.size == 0:
        return v
    d = np.empty_like(v)
    d[0] = v[0]
    np.subtract(v[1:], v[:-1], out=d[1:])
    return d


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(np.ascontiguousarray(deltas, dtype=np.uint64), dtype=np.uint64)


def encode_posting_ids(doc_ids: np.ndarray) -> bytes:
    """delta+varbyte for a strictly-increasing doc-id list."""
    return varbyte_encode(delta_encode(doc_ids))


def decode_posting_ids(buf: bytes | memoryview, df: int | None = None) -> np.ndarray:
    return delta_decode(varbyte_decode(buf, df))


def encode_positions(positions_concat: np.ndarray, tfs: np.ndarray) -> bytes:
    """Encode per-doc position lists (concatenated; ``tfs[i]`` positions for
    doc i) with per-doc delta restart.

    Mirrors the role of the reference's offset arrays
    (``src/index.cpp:558-606``) without the array-sentinel scheme: position
    counts equal tf, so offsets into the stream are ``cumsum(tfs)``.
    """
    p = np.ascontiguousarray(positions_concat, dtype=np.uint64)
    if p.size == 0:
        return b""
    d = p.copy()
    d[1:] -= p[:-1]
    starts = np.zeros(len(tfs), dtype=np.int64)
    np.cumsum(np.asarray(tfs, dtype=np.int64)[:-1], out=starts[1:])
    d[starts] = p[starts]  # restart delta at each doc boundary
    return varbyte_encode(d)


def decode_positions(buf: bytes | memoryview, tfs: np.ndarray) -> np.ndarray:
    """Inverse of :func:`encode_positions`; returns the concatenated
    positions array (caller splits by ``cumsum(tfs)``)."""
    d = varbyte_decode(buf)
    if d.size == 0:
        return d
    tfs = np.asarray(tfs, dtype=np.int64)
    starts = np.zeros(len(tfs), dtype=np.int64)
    np.cumsum(tfs[:-1], out=starts[1:])
    # segmented cumsum: global cumsum minus each segment's preceding total
    out = np.cumsum(d, dtype=np.uint64)
    if starts.size > 1:
        seg_bases = np.concatenate(([np.uint64(0)], out[starts[1:] - 1]))
        lengths = np.diff(np.concatenate((starts, [d.size])))
        out = out - np.repeat(seg_bases, lengths)
    return out


def block_max_meta(
    local_ids: np.ndarray, tfs: np.ndarray, doclens: np.ndarray, block: int = BLOCK_SIZE
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-block skip metadata for block-max scoring.

    Returns ``(last_id, max_tf, min_dl)`` per block of ``block`` postings.
    The BM25 upper bound for a block given idf and avgdl is
    ``idf * (k1+1) * max_tf / (max_tf + k1*(1 - b + b*min_dl/avgdl))`` —
    monotone ↑ in tf and ↓ in dl, so (max_tf, min_dl) bounds every posting
    in the block. Plays the role of the leaf ``max_score`` in the reference
    ART (``src/art.cpp:411-412``) generalized to per-block granularity.
    """
    n = local_ids.size
    starts = np.arange(0, n, block, dtype=np.int64)
    last = local_ids[np.minimum(starts + block - 1, n - 1)]
    max_tf = np.maximum.reduceat(tfs, starts) if n else np.empty(0, tfs.dtype)
    min_dl = np.minimum.reduceat(doclens, starts) if n else np.empty(0, doclens.dtype)
    return last, max_tf, min_dl
