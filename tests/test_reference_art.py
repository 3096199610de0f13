"""Conformance ports of the reference's ART fuzzy-search cases
(``test/art_test.cpp``) against :class:`typesense_ray.typo.TypoResolver`
— the component that plays the ART trie's fuzzy/prefix-traversal role
(``src/art.cpp:art_fuzzy_search``).

Ported: test_art_fuzzy_search_single_leaf, _single_leaf_prefix,
_unicode_chars, test_art_search_sku_like_tokens (the repo's
``test/skus.txt`` corpus), test_art_search_ill_like_tokens
(``test/ill.txt``), test_art_search_ill_like_tokens2.

The reference's "exact search all tokens via fuzzy API" calls pass the
key WITH its null terminator even when ``prefix=true``
(``art_test.cpp:786-798``), which makes the traversal byte-exact — both
the prefix and non-prefix assertions there are exact cost-0 lookups, and
are ported as such. The big ``test_art_fuzzy_search`` word-list case is
NOT portable: the repo's checked-in ``test/words.txt`` holds 11 words,
not the corpus its assertions (e.g. 39 candidates for ``liq``) were
recorded against."""

import os

import pyarrow as pa
import pytest

from typesense_ray.index_build import IndexConfig, build_index
from typesense_ray.typo import TypoResolver, build_typo_table

SKUS_TXT = "/root/reference/test/skus.txt"
ILL_TXT = "/root/reference/test/ill.txt"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SKUS_TXT), reason="reference corpus not available"
)


def _resolver_over(tokens: list[str], tmp_path) -> TypoResolver:
    """One doc per vocabulary token → index → typo table, the analogue
    of the art tests' one-insert-per-word setup loop."""
    import ray.data as rd

    tbl = pa.table({
        "docnum": pa.array(range(len(tokens)), pa.int64()),
        "title": pa.array(tokens, pa.string()),
    })
    out = str(tmp_path / "artidx")
    cfg = IndexConfig(text_field="title", id_field="docnum",
                      sha_field=None, batch_docs=64,
                      meta_fields=("docnum", "title"))
    build_index(rd.from_arrow(tbl), out, cfg, concurrency=2)
    build_typo_table(out)
    return TypoResolver(out)


def test_fuzzy_search_single_leaf(ray_session, tmp_path):
    # art_test.cpp:578-611
    r = _resolver_over(["implement"], tmp_path)
    assert r.fuzzy("implement", max_cost=0) == [("implement", 0)]
    # one typo not found at cost 0 ...
    assert r.fuzzy("implment", max_cost=0) == []
    # ... found at cost 1
    assert r.fuzzy("implment", max_cost=1) == [("implement", 1)]
    # two typos found at cost 2
    assert r.fuzzy("implwnent", max_cost=2) == [("implement", 2)]


def test_fuzzy_search_single_leaf_prefix(ray_session, tmp_path):
    # art_test.cpp:613-631: 'aplication' (1 missing char) with prefix
    # mode + 1 typo resolves to 'application'
    r = _resolver_over(["application"], tmp_path)
    variants = r.expand_query(["aplication"], num_typos=1, prefix_last=True)
    assert [v[0] for v in variants] == [["application"]]


def test_fuzzy_search_unicode_chars(ray_session, tmp_path):
    # art_test.cpp:728-753: exact lookup of non-latin tokens through the
    # fuzzy API returns exactly the token
    keys = ["роман", "обладать", "роисхождения", "без",
            "பஞ்சமம்", "சுதந்திரமாகவே", "அல்லது", "அடிப்படையில்"]
    r = _resolver_over(keys, tmp_path)
    from typesense_ray.tokenizer import tokenize

    for key in keys:
        tok = tokenize(key)[0]
        assert r.fuzzy(tok, max_cost=0) == [(tok, 0)]


def _exact_all_tokens(path, tmp_path):
    keys = [ln.strip() for ln in open(path) if ln.strip()]
    from typesense_ray.tokenizer import tokenize

    toks = [tokenize(k) for k in keys]
    assert all(len(t) == 1 for t in toks), "vocab keys must be one token"
    vocab = [t[0] for t in toks]
    r = _resolver_over(vocab, tmp_path)
    for tok in vocab:
        # cost-0 exact via the fuzzy API: exactly one candidate, itself —
        # near-identical sibling tokens (SKUs differ by 1-2 digits,
        # ill.txt holds 'illustration'/'illustrations') must NOT leak in
        assert r.fuzzy(tok, max_cost=0) == [(tok, 0)]


def test_search_sku_like_tokens(ray_session, tmp_path):
    # art_test.cpp:755-802
    _exact_all_tokens(SKUS_TXT, tmp_path)


def test_search_ill_like_tokens(ray_session, tmp_path):
    # art_test.cpp:804-849
    _exact_all_tokens(ILL_TXT, tmp_path)


def test_search_ill_like_tokens2(ray_session, tmp_path):
    # art_test.cpp:851-892: {input, illustrations, illustration} — the
    # one-char-extension neighbour must not surface at cost 0, in either
    # candidate lookup or an actual search
    keys = ["input", "illustrations", "illustration"]
    r = _resolver_over(keys, tmp_path)
    for key in keys:
        assert r.fuzzy(key, max_cost=0) == [(key, 0)]

    from typesense_ray.collection import RayCollection

    coll = RayCollection(os.path.join(str(tmp_path), "artidx"))
    for i, key in enumerate(keys):
        hits = coll.search(key, mode="reference", num_typos=0)["hits"]
        assert [h["document"]["docnum"] for h in hits] == [i]
