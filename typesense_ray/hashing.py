"""Reference-compatible scalar hash functions — the last §2.8 rows.

The reference hashes facet values and synonym tokens with wyhash v5
(``StringUtils::hash_wy``, ``include/string_utils.h:284-288``; call
sites ``src/index.cpp:520`` facet hashing, ``src/collection.cpp:1985``
synonym tokens), combines multi-token group keys with a boost-style
``hash_combine`` (``include/index.h:231-234``), and serializes RocksDB
sequence keys as big-endian uint32 (``include/string_utils.h:268-282``).

This engine does NOT need any of them on a hot path — facet and group
keys are native Arrow values grouped by factorize/dictionary encoding,
synonym lookups key a Python dict by the token tuple, and storage is
Parquet — but the functions are part of the reference's observable
surface (a facet hash collision or the uint64-max sentinel remap would
change reference results), so they are provided as conformance-grade
scalar utilities, golden-tested against vectors generated from the
reference's own vendored header (``include/wyhash_v5.h``, public-domain
algorithm by Wang Yi).

Nothing here is vectorized on purpose: the only legitimate callers hash
a handful of distinct values (synonym definitions, route keys,
conformance oracles). Corpus-scale hashing in this repo goes through
the numpy FNV / factorize kernels in ``functions/``.
"""

from __future__ import annotations

_M64 = (1 << 64) - 1

# wyhash v5 default secret (public constants from the algorithm spec)
_WYP = (
    0xA0761D6478BD642F,
    0xE7037ED1A0B428DB,
    0x8EBC6AF09C88C6E3,
    0x589965CC75374CC3,
    0x1D8E4E27C47D124F,
    0x72B22B96E169B471,
)


def _wymum(a: int, b: int) -> int:
    r = a * b
    return ((r >> 64) ^ r) & _M64


def _wymix(a: int, b: int) -> int:
    return (a ^ b ^ _wymum(a, b)) & _M64


def _r8(p: bytes, o: int) -> int:
    return int.from_bytes(p[o:o + 8], "little")


def _r4(p: bytes, o: int) -> int:
    return int.from_bytes(p[o:o + 4], "little")


def _r3(p: bytes, o: int, k: int) -> int:
    return (p[o] << 16) | (p[o + (k >> 1)] << 8) | p[o + k - 1]


def wyhash(key: bytes, seed: int = 0, secret=_WYP) -> int:
    """wyhash v5 of ``key`` — value-identical to the reference's
    ``wyhash(key, len, seed, _wyp)`` for every length branch (empty,
    1-3, 4-7, 8-16, 17-32, 33-64, and the 64-byte stripe loop)."""
    n = len(key)
    i = n
    o = 0
    seed = (seed ^ secret[4]) & _M64
    if i > 64:
        see1 = see2 = see3 = seed
        while i > 64:
            seed = _wymix(_r8(key, o) ^ secret[0], _r8(key, o + 8) ^ seed)
            see1 = _wymix(_r8(key, o + 16) ^ secret[1],
                          _r8(key, o + 24) ^ see1)
            see2 = _wymix(_r8(key, o + 32) ^ secret[2],
                          _r8(key, o + 40) ^ see2)
            see3 = _wymix(_r8(key, o + 48) ^ secret[3],
                          _r8(key, o + 56) ^ see3)
            i -= 64
            o += 64
        seed ^= see1 ^ see2 ^ see3
    if i >= 8:
        if i <= 16:
            h = _wymix(_r8(key, o) ^ secret[0], _r8(key, o + i - 8) ^ seed)
        elif i <= 32:
            h = (_wymix(_r8(key, o) ^ secret[0], _r8(key, o + 8) ^ seed)
                 ^ _wymix(_r8(key, o + i - 16) ^ secret[1],
                          _r8(key, o + i - 8) ^ seed))
        else:
            h = (_wymix(_r8(key, o) ^ secret[0], _r8(key, o + 8) ^ seed)
                 ^ _wymix(_r8(key, o + 16) ^ secret[1],
                          _r8(key, o + 24) ^ seed)
                 ^ _wymix(_r8(key, o + i - 32) ^ secret[2],
                          _r8(key, o + i - 24) ^ seed)
                 ^ _wymix(_r8(key, o + i - 16) ^ secret[3],
                          _r8(key, o + i - 8) ^ seed))
    elif i >= 4:
        h = _wymix(_r4(key, o) ^ secret[0], _r4(key, o + i - 4) ^ seed)
    else:
        h = _wymix((_r3(key, o, i) if i else 0) ^ secret[0], seed)
    return _wymum(h ^ n, secret[5])


def wyhash64(a: int, b: int) -> int:
    """The header's ``wyhash64(A, B)`` two-word mixer."""
    return _wymum(_wymum((a ^ _WYP[0]) & _M64, (b ^ _WYP[1]) & _M64),
                  _WYP[2])


def hash_wy(token: str | bytes) -> int:
    """``StringUtils::hash_wy``: wyhash at seed 0 with uint64-max
    remapped to max-1 (max is reserved as a delimiter sentinel in the
    reference's facet hash streams)."""
    key = token.encode("utf-8") if isinstance(token, str) else token
    h = wyhash(key)
    return h if h != _M64 else _M64 - 1


def hash_combine(combined: int, hash_: int) -> int:
    """Boost-style combiner (``include/index.h:231-234``) with C
    uint64 wrapping semantics — used by the reference for multi-token
    facet/group keys."""
    return (combined ^ ((hash_ + 0x517CC1B727220A95
                         + ((combined << 6) & _M64)
                         + (combined >> 2)) & _M64)) & _M64


def serialize_uint32(num: int) -> bytes:
    """Big-endian uint32 (``StringUtils::serialize_uint32_t``) — the
    RocksDB seq-key byte order; kept for snapshot/export parity tools."""
    return int(num).to_bytes(4, "big")


def deserialize_uint32(raw: bytes) -> int:
    return int.from_bytes(raw[:4], "big")
