"""Byte-compatible re-implementation of the reference tokenizer.

Semantics mirror the reference tokenizer (``src/tokenizer.cpp:4-112``,
flags ``include/tokenizer.h:20-24``):

- The ONLY token separators are space (0x20) and newline (0x0A). Any other
  character — including tab/CR and all punctuation — is *not* a separator.
- With ``normalize=True`` (the indexing/query default), ASCII characters are
  kept only if alphanumeric, lowercased; all other ASCII (punctuation, tabs)
  is dropped *within* the token (so ``foo-bar`` tokenizes to ``foobar``).
- Non-ASCII codepoints are transliterated to ASCII (the reference uses glibc
  ``iconv UTF-8 → ASCII//TRANSLIT``, ``src/tokenizer.cpp:64-100``); the
  ASCII output is then filtered to lowercase alnum. Codepoints that cannot
  be transliterated (EILSEQ) are passed through verbatim (so Tamil / CJK
  tokens survive as-is, mirroring ``test/tokenizer_test.cpp``).
- With ``keep_empty=True`` (the indexing default, ``src/index.cpp:530``),
  empty slots between consecutive separators are emitted as ``""`` tokens
  and *consume a token index*; the indexer skips the empty tokens but keeps
  the index numbering (``src/index.cpp:534-545``) — i.e. token positions are
  separator-slot indices.
- Quirk mirrored from ``src/tokenizer.cpp:7-12``: a text ending in a space
  emits one final ``""`` token even when ``keep_empty=False``.

The hot path (`doc_term_positions`) uses ``str.translate`` over a 128-entry
table for pure-ASCII text (the common case for source code) and falls back
to a per-codepoint path only when non-ASCII is present.
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache

# --- ASCII fast-path tables -------------------------------------------------

# For whole-string normalization: uppercase→lower, '\n'→' ' (unifies the two
# separators so a single split(' ') applies), keep lowercase/digits/space,
# delete every other ASCII char (tab, CR, punctuation — NOT separators).
_FAST_TBL: dict[int, int | None] = {}
for _cp in range(128):
    _ch = chr(_cp)
    if _ch == "\n":
        _FAST_TBL[_cp] = 0x20
    elif _ch == " " or _ch.islower() or _ch.isdigit():
        pass  # identity; omit from table
    elif _ch.isupper():
        _FAST_TBL[_cp] = ord(_ch.lower())
    else:
        _FAST_TBL[_cp] = None

# For normalizing a single already-split token (no separators inside):
# keep alnum lowercased, drop the rest.
_TOKEN_TBL: dict[int, int | None] = {}
for _cp in range(128):
    _ch = chr(_cp)
    if _ch.islower() or _ch.isdigit():
        pass
    elif _ch.isupper():
        _TOKEN_TBL[_cp] = ord(_ch.lower())
    else:
        _TOKEN_TBL[_cp] = None

# glibc iconv ASCII//TRANSLIT entries that Unicode NFKD does not produce.
# Verified against the reference's expectations in test/tokenizer_test.cpp
# ("½¥" → "12yen", "Åà…ß" → "aa…ss") plus common Latin fold entries.
_TRANSLIT_TABLE: dict[str, str] = {
    "¥": "yen",
    "ß": "ss",
    "ẞ": "SS",
    "æ": "ae",
    "Æ": "AE",
    "ø": "o",
    "Ø": "O",
    "œ": "oe",
    "Œ": "OE",
    "đ": "d",
    "Đ": "D",
    "ł": "l",
    "Ł": "L",
    "þ": "th",
    "Þ": "TH",
    "ð": "d",
    "Ð": "D",
    "«": "<<",
    "»": ">>",
}


class _NormTable(dict):
    """Whole-string translate table: ASCII entries per ``_FAST_TBL``;
    non-ASCII codepoints transliterated on first sight (then cached in the
    dict, so ``str.translate`` stays one C loop with a rare Python
    callback). Char-wise transliteration is exactly ``normalize_token``'s
    per-char rule, so one translate+split replaces the per-token path."""

    def __missing__(self, cp: int):
        ch = chr(cp)
        t = _translit(ch)
        r = ch if t is None else t
        self[cp] = r
        return r


@lru_cache(maxsize=65536)
def _translit(ch: str) -> str | None:
    """Transliterate one non-ASCII codepoint to normalized (lower alnum)
    ASCII, or None when untranslatable (the reference's EILSEQ branch keeps
    the original symbol, ``src/tokenizer.cpp:79-81``)."""
    mapped = _TRANSLIT_TABLE.get(ch)
    if mapped is None:
        decomposed = unicodedata.normalize("NFKD", ch)
        mapped = "".join(c for c in decomposed if c.isascii())
        if not mapped:
            return None
    return mapped.translate(_TOKEN_TBL)


# module-level instance (shared cache); seeded with the ASCII table PLUS
# explicit identity entries for the codepoints _FAST_TBL leaves implicit
# (translate consults __missing__ for any absent key, which would
# otherwise transliterate-and-drop space itself)
_NORM_TBL = _NormTable(_FAST_TBL)
for _cp in range(128):
    if _cp not in _NORM_TBL:
        _NORM_TBL[_cp] = _cp


def normalized_slots(text: str) -> list[str]:
    """One-shot ``text`` → normalized separator-slot tokens (empties kept,
    positions = list indices). Equivalent to
    ``[normalize_token(s) for s in _raw_slots(text)]`` but a single C-level
    translate+split for any content (ASCII or not)."""
    return text.translate(_NORM_TBL).split(" ")


def normalize_token(raw: str) -> str:
    """Normalize one separator-free token exactly like the reference does
    while accumulating a token (``src/tokenizer.cpp:43-100``)."""
    if raw.isascii():
        return raw.translate(_TOKEN_TBL)
    out: list[str] = []
    for ch in raw:
        if ch.isascii():
            if ch.isalnum():
                out.append(ch.lower())
        else:
            t = _translit(ch)
            out.append(ch if t is None else t)
    return "".join(out)


def _raw_slots(text: str) -> list[str]:
    """Split into separator slots (space/newline), keeping empties."""
    if "\n" in text:
        text = text.replace("\n", " ")
    return text.split(" ")


def tokenize(text: str, keep_empty: bool = True, normalize: bool = True) -> list[str]:
    """Reference-equivalent ``Tokenizer(text, keep_empty, normalize)
    .tokenize(tokens)`` (``src/tokenizer.cpp:114-121``).

    Mirrors the trailing-space quirk: a trailing space yields one final
    ``""`` token even with ``keep_empty=False``.
    """
    if not text:
        return []
    slots = _raw_slots(text)
    # A trailing '\n' ends the C loop without the final-empty-token quirk
    # (the quirk fires only for a trailing ' ', src/tokenizer.cpp:7-12), so
    # drop the empty slot str.split created for it.
    if text.endswith("\n"):
        slots.pop()
    if normalize:
        toks = [normalize_token(s) for s in slots]
    else:
        toks = slots
    if keep_empty:
        return toks
    out = [t for t in toks if t]
    # trailing-space quirk: text ending in ' ' emits one "" even when
    # empties are dropped.
    if text.endswith(" "):
        out.append("")
    return out


def tokenize_query(query: str) -> tuple[list[str], list[str]]:
    """Parse a search query into (include_tokens, exclude_tokens), mirroring
    ``Collection::parse_search_query`` (``src/collection.cpp:1166-1195``):
    split on spaces, ``-tok`` excludes, each piece normalized with
    keep_empty=False; empty include list → ``["*"]``; ``"*"`` passes through.
    """
    if query == "*":
        return ["*"], []
    include: list[str] = []
    exclude: list[str] = []
    for piece in query.split(" "):
        if not piece:
            continue
        if piece[0] == "-":
            t = normalize_token(piece[1:])
            if t:
                exclude.append(t)
        else:
            t = normalize_token(piece)
            if t:
                include.append(t)
    if not include:
        include = ["*"]
    return include, exclude


def doc_term_positions(text: str) -> tuple[dict[str, list[int]], int]:
    """Hot-path tokenization for indexing.

    Returns ``(term → sorted slot positions, doclen)`` where positions are
    separator-slot indices (matching the reference's ``token_index``
    numbering with ``keep_empty=True``, ``src/index.cpp:526-545``) and
    ``doclen`` is the number of non-empty tokens (the BM25 |d|).
    """
    slots = text.translate(_NORM_TBL).split(" ")
    d: dict[str, list[int]] = {}
    n = 0
    for i, tok in enumerate(slots):
        if tok:
            n += 1
            try:
                d[tok].append(i)
            except KeyError:
                d[tok] = [i]
    return d, n


def normalized_slot_codes(texts: list):
    """Batch slot-stream tokenization, dictionary-encoded: returns
    ``(codes, uniq, unit_ix, pos_in_unit)`` over NON-EMPTY slots, where
    ``codes`` indexes ``uniq`` (the batch's distinct normalized tokens),
    ``unit_ix`` is each occurrence's row index and ``pos_in_unit`` its
    separator-slot position — exactly the stream
    ``[normalized_slots(t) for t in texts]`` yields, for EVERY batch
    (ASCII or not): the separator-slot split runs in Arrow C++
    (``replace_substring`` \\n→space → ``split_pattern`` →
    ``dictionary_encode`` on the RAW slots), and normalization runs only
    over the DISTINCT raw slots — Arrow ``ascii_lower`` + one regex
    delete for ASCII tokens, the ``_NORM_TBL`` translate
    (transliteration semantics, ``src/tokenizer.cpp:43-100``) for the
    rest. Splitting before normalizing is exact because normalization
    can neither create nor consume separators: space/\\n are ASCII, the
    ASCII rule deletes-or-keeps in place, and every ``_translit`` output
    is ``[a-z0-9]*`` (its trailing ``_TOKEN_TBL`` translate strips
    anything else). Per-occurrence Python strings are never
    materialized; Python cost is O(distinct raw slots), not
    O(occurrences) — the previous all-or-nothing ASCII gate sent a
    2048-doc batch with ONE non-ASCII row down a per-occurrence object
    path (~240 µs/doc on the 95 %-non-ASCII bench corpus vs ~25 µs
    here). ``None``/empty texts contribute zero slots."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    m = len(texts)
    empty = (
        np.empty(0, np.int64),
        np.empty(0, dtype=object),
        np.empty(0, np.int64),
        np.empty(0, np.int64),
    )
    if m == 0:
        return empty
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if isinstance(texts, pa.Array):
        col = pc.fill_null(texts, "")
    else:
        col = pa.array([t or "" for t in texts], pa.string())
    # empty/None inputs yield one "" raw slot here where the Python path
    # yields zero slots — harmless: "" normalizes to "" and every
    # empty-normalized slot is dropped below, and a lone slot 0 carries
    # no occurrence
    slots = pc.split_pattern(pc.replace_substring(col, "\n", " "), " ")
    lens = pc.list_value_length(slots).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    flat_all = pc.list_flatten(slots)
    total = int(lens.sum())
    unit_ix = np.repeat(np.arange(m, dtype=np.int64), lens)
    off = np.zeros(m, dtype=np.int64)
    np.cumsum(lens[:-1], out=off[1:])
    pos = np.arange(total, dtype=np.int64) - np.repeat(off, lens)
    denc = pc.dictionary_encode(flat_all)
    raw_codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    raw_uniq = denc.dictionary
    n_raw = len(raw_uniq)
    norm_uniq = np.empty(n_raw, dtype=object)
    am = pc.string_is_ascii(raw_uniq).to_numpy(zero_copy_only=False)
    if am.any():
        asc = pc.replace_substring_regex(
            pc.ascii_lower(raw_uniq.filter(pa.array(am))), r"[^a-z0-9]", ""
        )
        norm_uniq[np.flatnonzero(am)] = np.asarray(
            asc.to_pylist(), dtype=object
        )
    if not am.all():
        for i in np.flatnonzero(~am):
            norm_uniq[i] = raw_uniq[i].as_py().translate(_NORM_TBL)
    # distinct raw → distinct normalized: factorize over the raw-uniq
    # order assigns each normalized token the id of its EARLIEST raw
    # carrier, which is also its first occurrence in the stream — the
    # same first-appearance order pd.factorize over the full stream (the
    # per-doc path) produces
    ncodes, nuniq = pd.factorize(norm_uniq)
    nuniq = np.asarray(nuniq, dtype=object)
    occ_n = ncodes[raw_codes]
    nonempty = nuniq != ""
    if nonempty.all():
        return occ_n.astype(np.int64), nuniq, unit_ix, pos
    new_id = np.full(len(nuniq), -1, dtype=np.int64)
    new_id[nonempty] = np.arange(int(nonempty.sum()), dtype=np.int64)
    occ_new = new_id[occ_n]
    keep = occ_new >= 0
    return occ_new[keep], nuniq[nonempty], unit_ix[keep], pos[keep]
