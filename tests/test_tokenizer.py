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
