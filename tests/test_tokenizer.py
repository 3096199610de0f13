"""Tokenizer conformance vectors ported from the reference
test/tokenizer_test.cpp (behavioral port, no code copied)."""

from typesense_ray.tokenizer import (
    doc_term_positions,
    normalize_token,
    tokenize,
    tokenize_query,
)


def test_normalize_keep_empty_trailing_space():
    s = "Michael Jordan:\nWelcome, everybody. Welcome! "
    assert tokenize(s, keep_empty=True, normalize=True) == [
        "michael",
        "jordan",
        "welcome",
        "everybody",
        "welcome",
        "",
    ]


def test_keep_empty_slots():
    s = " Michael  Jordan  "
    assert tokenize(s, keep_empty=True, normalize=True) == [
        "",
        "michael",
        "",
        "jordan",
        "",
        "",
    ]
    assert tokenize(s, keep_empty=False, normalize=True) == [
        "michael",
        "jordan",
        "",  # trailing-space quirk (src/tokenizer.cpp:7-12)
    ]


def test_unicode_translit():
    s = "Special ½¥ and தமிழ் 你好吗 abcÅà123ß12 here."
    assert tokenize(s, keep_empty=False, normalize=True)[:-1] == [
        "special",
        "12yen",
        "and",
        "தமிழ்",
        "你好吗",
        "abcaa123ss12",
    ]
    toks = tokenize(s, keep_empty=False, normalize=True)
    assert toks[-1] == "here"
    assert len(toks) == 7


def test_no_normalize():
    s = "Mise  à  jour."
    assert tokenize(s, keep_empty=True, normalize=False) == [
        "Mise",
        "",
        "à",
        "",
        "jour.",
    ]
    assert tokenize(s, keep_empty=False, normalize=False) == ["Mise", "à", "jour."]


def test_iterative_double_newline():
    s = "Michael Jordan:\n\nWelcome, everybody. Welcome!"
    assert tokenize(s, keep_empty=True, normalize=True) == [
        "michael",
        "jordan",
        "",
        "welcome",
        "everybody",
        "welcome",
    ]


def test_trailing_newline_no_quirk():
    assert tokenize("ab\n", keep_empty=True) == ["ab"]
    assert tokenize("ab\n", keep_empty=False) == ["ab"]
    assert tokenize("", keep_empty=True) == []


def test_punct_merges_not_splits():
    # '-' and tab are NOT separators: chars are dropped inside the token
    assert tokenize("foo-bar a\tb", keep_empty=False)[:-0 or None] == ["foobar", "ab"]


def test_positions_are_slot_indices():
    d, n = doc_term_positions("a  b a")
    assert d == {"a": [0, 3], "b": [2]}
    assert n == 3


def test_positions_non_ascii():
    d, n = doc_term_positions("héllo  wörld héllo")
    assert d == {"hello": [0, 3], "world": [2]}
    assert n == 3


def test_query_parse():
    inc, exc = tokenize_query("how -propellants -are")
    assert inc == ["how"]
    assert exc == ["propellants", "are"]
    inc, exc = tokenize_query("-rocket")
    assert inc == ["*"]
    assert exc == ["rocket"]
    assert tokenize_query("*") == (["*"], [])


def test_normalize_token():
    assert normalize_token("Jordan:") == "jordan"
    assert normalize_token("½¥") == "12yen"
    assert normalize_token("தமிழ்") == "தமிழ்"


# -- equivalence of the one-translate fast path ------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

from typesense_ray.tokenizer import _raw_slots, normalized_slots


@settings(max_examples=300, deadline=None)
@given(
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_characters=["\x00"]
        ),
        max_size=200,
    )
)
def test_normalized_slots_matches_per_token_path(text):
    # the optimized whole-string translate must equal the per-slot
    # normalize_token reference path for ANY input
    expected = [normalize_token(s) for s in _raw_slots(text)]
    assert normalized_slots(text) == expected


@settings(max_examples=200, deadline=None)
@given(
    st.text(
        alphabet=st.characters(codec="utf-8", exclude_characters=["\x00"]),
        max_size=200,
    )
)
def test_doc_term_positions_matches_slot_walk(text):
    d, n = doc_term_positions(text)
    slots = [normalize_token(s) for s in _raw_slots(text)]
    expected = {}
    for i, tok in enumerate(slots):
        if tok:
            expected.setdefault(tok, []).append(i)
    assert d == expected
    assert n == sum(1 for t in slots if t)


def test_should_normalize_string_vectors():
    """StringUtilsTest.ShouldNormalizeString (test/string_utils_test.cpp:
    7-40): the whole-string unicode_normalize vectors, applied per
    separator slot (our normalize_token is the same Any-Latin;
    Latin-ASCII; Lower(); drop-non-alnum pipeline — the reference's
    whole-string variant additionally eats spaces, so multi-word vectors
    compare against the joined slots)."""
    from typesense_ray.tokenizer import normalize_token, tokenize

    def norm_join(s):
        return "".join(tokenize(s, keep_empty=False, normalize=True))

    assert normalize_token("Aa12Zz") == "aa12zz"
    assert norm_join("Aa12Zz 12A") == "aa12zz12a"
    assert normalize_token("Aa12Zz@W-_?,.R") == "aa12zzwr"
    assert normalize_token("abcÅà123ß12") == "abcaa123ss12"
    assert norm_join("தமிழ் நாடு") == "தமிழ்நாடு"
    assert normalize_token("你好吗") == "你好吗"
    assert norm_join("çн தமிழ் நாடு so...") == "cнதமிழ்நாடுso"


def test_normalized_slot_codes_matches_python_path():
    """The Arrow-encoded slot stream (ASCII fast path) must produce the
    exact (token, unit, position) stream of per-doc normalized_slots —
    including separator-slot numbering with empties kept, punctuation
    deletion inside tokens, and the newline separator."""
    import numpy as np

    from typesense_ray.tokenizer import normalized_slot_codes, normalized_slots

    def ref(texts):
        toks, units, poss = [], [], []
        for u, t in enumerate(texts):
            slots = normalized_slots(t) if t else []
            for p, tok in enumerate(slots):
                if tok:
                    toks.append(tok)
                    units.append(u)
                    poss.append(p)
        return toks, units, poss

    cases = [
        ["Hello World", "foo-bar  baz!", "", None, " lead trail ", "a\tb",
         "line1\nline2", "MiXeD 42x", "\n", "  ", "!!!", "x"],
        ["ascii only here", "Üben von Xylophon", "தமிழ் 你好"],  # fallback
    ]
    for texts in cases:
        codes, uniq, unit_ix, pos = normalized_slot_codes(texts)
        got = (list(uniq[codes]), unit_ix.tolist(), pos.tolist())
        assert got == ref(texts), texts


@given(st.lists(st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
    max_size=60,
), max_size=12))
@settings(max_examples=120, deadline=None)
def test_normalized_slot_codes_property_ascii(texts):
    from typesense_ray.tokenizer import normalized_slot_codes, normalized_slots

    codes, uniq, unit_ix, pos = normalized_slot_codes(texts)
    toks, units, poss = [], [], []
    for u, t in enumerate(texts):
        slots = normalized_slots(t) if t else []
        for p, tok in enumerate(slots):
            if tok:
                toks.append(tok)
                units.append(u)
                poss.append(p)
    assert list(uniq[codes]) == toks
    assert unit_ix.tolist() == units
    assert pos.tolist() == poss


def test_tokenize_iteratively_reference_vector():
    """Ports TokenizerTest.ShouldTokenizeIteratively
    (test/tokenizer_test.cpp:73-104): the keep_empty iteration emits an
    EMPTY slot between consecutive newlines (position numbering skips
    across blank segments). The case's second half (no_op=true verbatim
    mode) is the reference's "don't tokenize" flag — trivially the
    whole string as one token, with no analogue needed here (no caller
    in this engine tokenizes in no-op mode)."""
    from typesense_ray.tokenizer import tokenize

    toks = tokenize(
        "Michael Jordan:\n\nWelcome, everybody. Welcome!", keep_empty=True
    )
    assert toks == ["michael", "jordan", "", "welcome", "everybody",
                    "welcome"]
