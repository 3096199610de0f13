"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting — vectorized ``map_batches`` stages over the
``documents`` table shape (doc_id, text, ...).

Every kernel here is regex/numpy-vectorized over the whole batch (no
per-row Python loops in the hot path): at 100 TB these per-doc functions
ARE the bill, so each one is a handful of C-level passes per batch.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

# n-gram/stopword profiles for the language-ID heuristic
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "for", "with", "on", "as", "a"},
    "fr": {"le", "la", "les", "de", "des", "et", "est", "un", "une", "que", "pour", "dans"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "eine", "für", "nicht"},
    "es": {"el", "la", "los", "de", "y", "es", "un", "una", "que", "por", "con", "para"},
}

_WORD_RE = re.compile(r"[a-z0-9]+")
# BPE-ish subword split: runs of letters, digits, or single punctuation
_BPE_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")
_STOP_EN = _LANG_PROFILES["en"]


def _texts(batch: pa.Table, text_col: str) -> pd.Series:
    return pd.Series(batch[text_col].to_pylist()).fillna("")


class LangId:
    """Actor-pool stage: stopword-profile language ID with confidence.

    Vectorized: one compiled token-boundary regex count per language over
    the whole batch (token == maximal [a-z0-9]+ run; a profile word hits
    only when it equals a full token). Patterns compiled once per actor
    (``__init__``). Tie-break on equal scores picks the lexicographically
    largest language (``max(scores, key=lambda l: (scores[l], l))``
    semantics), mirrored by iterating languages in descending name order.
    """

    def __init__(self):
        self.langs_desc = sorted(_LANG_PROFILES, reverse=True)
        self.patterns = {
            lang: re.compile(
                r"(?:^|(?<=[^a-z0-9]))(?:"
                + "|".join(sorted(words))
                + r")(?=[^a-z0-9]|$)"
            )
            for lang, words in _LANG_PROFILES.items()
        }
        self.tok_re = re.compile(r"[a-z0-9]+")

    def _score(self, n_toks: np.ndarray, counts: np.ndarray):
        """(n_docs,) token counts + (n_langs, n_docs) profile-hit counts
        → (preds, confs). Shared by both tokenization paths."""
        safe_n = np.where(n_toks > 0, n_toks, 1.0)
        scores = counts / safe_n  # langs in DESC name order
        best_idx = np.argmax(scores, axis=0)  # first max == largest name
        best = scores[best_idx, np.arange(scores.shape[1])]
        langs_arr = np.array(self.langs_desc, dtype=object)
        preds = np.where((best > 0) & (n_toks > 0), langs_arr[best_idx], "und")
        confs = np.where(n_toks > 0, np.round(best, 6), 0.0)
        return preds, confs

    def _counts_regex(self, texts: list) -> tuple[np.ndarray, np.ndarray]:
        s = pd.Series(texts).fillna("").str.lower()
        n_toks = s.str.count(self.tok_re).to_numpy(dtype=np.float64)
        counts = np.stack(
            [
                s.str.count(self.patterns[lang]).to_numpy(np.float64)
                for lang in self.langs_desc
            ]
        )
        return n_toks, counts

    def _counts_arrow(self, col) -> tuple[np.ndarray, np.ndarray]:
        """Tokenize ONCE in Arrow C++ (ascii_lower → split on non-token
        runs → dictionary_encode), then profile membership is a set probe
        over the DISTINCT tokens only — replaces n_langs+1 full regex
        scans of the batch text. Occurrence counts per (doc, lang) fold
        with one reduceat, matching the regex path's semantics exactly
        (token = maximal [a-z0-9]+ run; profile word must equal a full
        token; repeated words count per occurrence)."""
        import pyarrow.compute as pc

        m = len(col)
        toks = pc.split_pattern_regex(
            pc.ascii_lower(pc.fill_null(col, "")), r"[^a-z0-9]+"
        )
        flat = pc.list_flatten(toks)
        lens_all = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        doc_ix = np.repeat(np.arange(m, dtype=np.int64), lens_all)
        keep_arr = pc.not_equal(flat, "")
        doc_ix = doc_ix[keep_arr.to_numpy(zero_copy_only=False)]
        flat = flat.filter(keep_arr)
        denc = pc.dictionary_encode(flat)
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = denc.dictionary.to_pylist()
        member = np.zeros((len(uniq), len(self.langs_desc)), dtype=np.uint8)
        for li, lang in enumerate(self.langs_desc):
            words = _LANG_PROFILES[lang]
            for ti, tok in enumerate(uniq):
                if tok in words:
                    member[ti, li] = 1
        n_toks = np.bincount(doc_ix, minlength=m).astype(np.float64)
        counts = np.zeros((len(self.langs_desc), m), dtype=np.float64)
        nz = n_toks > 0
        if nz.any() and len(uniq):
            starts = np.concatenate(
                ([0], np.cumsum(n_toks.astype(np.int64))[:-1])
            )[nz]
            per_doc = np.add.reduceat(member[codes], starts, axis=0,
                                      dtype=np.int64)
            counts[:, nz] = per_doc.T
        return n_toks, counts

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = batch["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = pc.fill_null(col, "")
        ascii_mask = pc.string_is_ascii(col).to_numpy(zero_copy_only=False)
        n = len(col)
        n_toks = np.zeros(n, np.float64)
        counts = np.zeros((len(self.langs_desc), n), np.float64)
        if ascii_mask.any():
            idx = np.flatnonzero(ascii_mask)
            nt, ct = self._counts_arrow(col.filter(pa.array(ascii_mask)))
            n_toks[idx] = nt
            counts[:, idx] = ct
        if not ascii_mask.all():
            # non-ASCII rows keep the str.lower()-based regex path
            # (utf8_lower diverges on e.g. Turkish İ, whose Python
            # lowering emits an ASCII 'i' + combining dot that splits
            # the token differently)
            rows = np.flatnonzero(~ascii_mask)
            nt, ct = self._counts_regex(
                col.take(pa.array(rows)).to_pylist()
            )
            n_toks[rows] = nt
            counts[:, rows] = ct
        preds, confs = self._score(n_toks, counts)
        return batch.append_column(
            "lang_pred", pa.array(preds.tolist(), pa.string())
        ).append_column("lang_conf", pa.array(confs, pa.float64()))


_TOKEN_CHARS = r"[^ \n]"
_STOP_PAT = re.compile(
    r"(?:^|(?<=[ \n]))(?:" + "|".join(sorted(_STOP_EN)) + r")(?=[ \n]|$)",
    re.IGNORECASE,
)


def _quality_counts_pandas(texts: list):
    """The original pandas-regex raw counts — the reference path for
    non-ASCII rows (Python's ``\\s`` and ``str.len`` are Unicode-aware
    where RE2's are not) and for the equality tests."""
    s = pd.Series(texts).fillna("")
    return (
        s.str.count(_TOKEN_CHARS + "+").to_numpy(np.int64),
        s.str.count(_TOKEN_CHARS).to_numpy(np.float64),
        s.str.len().to_numpy(np.float64),
        s.str.count(r"[0-9]").to_numpy(np.float64),
        s.str.count(r"[^a-zA-Z0-9\s]").to_numpy(np.float64),
        s.str.count(_STOP_PAT).to_numpy(np.float64),
    )


def _quality_counts_arrow(sub):
    """ASCII-row raw counts in Arrow C++. The stopword count can't use
    ``count_substring_regex`` (RE2 has no lookbehind), so it's the
    tokenize-once shape: split on ``[ \\n]+`` runs, lower, ``is_in`` the
    stopword list, one reduceat per doc — exactly the boundary-anchored
    case-insensitive full-token semantics of ``_STOP_PAT``."""
    import pyarrow.compute as pc

    m = len(sub)
    n_tokens = pc.count_substring_regex(sub, r"[^ \n]+").to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    tok_chars = pc.count_substring_regex(sub, r"[^ \n]").to_numpy(
        zero_copy_only=False
    ).astype(np.float64)
    n_chars = pc.utf8_length(sub).to_numpy(
        zero_copy_only=False
    ).astype(np.float64)
    digits = pc.count_substring_regex(sub, r"[0-9]").to_numpy(
        zero_copy_only=False
    ).astype(np.float64)
    punct = pc.count_substring_regex(sub, r"[^a-zA-Z0-9\s]").to_numpy(
        zero_copy_only=False
    ).astype(np.float64)
    toks = pc.split_pattern_regex(sub, r"[ \n]+")
    flat = pc.ascii_lower(pc.list_flatten(toks))
    hit = pc.is_in(
        flat, value_set=pa.array(sorted(_STOP_EN), pa.string())
    ).to_numpy(zero_copy_only=False).astype(np.uint8)
    lens_all = pc.list_value_length(toks).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    stops = np.zeros(m, np.float64)
    nz = lens_all > 0
    if nz.any() and hit.size:
        starts = np.concatenate(([0], np.cumsum(lens_all)[:-1]))[nz]
        stops[nz] = np.add.reduceat(hit, starts).astype(np.float64)
    return n_tokens, tok_chars, n_chars, digits, punct, stops


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality-signal columns: n_tokens, mean token length, digit ratio,
    punctuation ratio, stopword ratio, and a composite [0,1] score.
    ASCII rows count in Arrow C++ (one split replaces the lookbehind
    stopword regex); non-ASCII rows keep the pandas-regex path —
    bit-identical outputs either way, and pure-SQL-expressible
    components stay bit-identical to the oracle (see
    __ray_entry__.oracle_sql)."""
    import pyarrow.compute as pc

    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    ascii_mask = pc.string_is_ascii(col).to_numpy(zero_copy_only=False)
    n = len(col)
    n_tokens = np.zeros(n, np.int64)
    tok_chars = np.zeros(n, np.float64)
    n_chars = np.zeros(n, np.float64)
    digits = np.zeros(n, np.float64)
    punct = np.zeros(n, np.float64)
    stops = np.zeros(n, np.float64)
    if ascii_mask.any():
        idx = np.flatnonzero(ascii_mask)
        parts = _quality_counts_arrow(col.filter(pa.array(ascii_mask)))
        for dst, src in zip(
            (n_tokens, tok_chars, n_chars, digits, punct, stops), parts
        ):
            dst[idx] = src
    if not ascii_mask.all():
        rows = np.flatnonzero(~ascii_mask)
        parts = _quality_counts_pandas(col.take(pa.array(rows)).to_pylist())
        for dst, src in zip(
            (n_tokens, tok_chars, n_chars, digits, punct, stops), parts
        ):
            dst[rows] = src

    safe_nt = np.where(n_tokens > 0, n_tokens, 1).astype(np.float64)
    safe_nc = np.where(n_chars > 0, n_chars, 1.0)
    mean_len = np.where(n_tokens > 0, np.round(tok_chars / safe_nt, 6), 0.0)
    digit_r = np.where(n_chars > 0, np.round(digits / safe_nc, 6), 0.0)
    punct_r = np.where(n_chars > 0, np.round(punct / safe_nc, 6), 0.0)
    stop_r = np.where(n_tokens > 0, np.round(stops / safe_nt, 6), 0.0)
    score = np.round(
        np.clip(
            0.4 * np.minimum(1.0, n_tokens / 100.0)
            + 0.3 * (1.0 - digit_r)
            + 0.3 * (1.0 - punct_r),
            0.0,
            1.0,
        ),
        6,
    )
    out = batch.append_column("n_tokens", pa.array(n_tokens, pa.int64()))
    out = out.append_column("mean_token_len", pa.array(mean_len, pa.float64()))
    out = out.append_column("digit_ratio", pa.array(digit_r, pa.float64()))
    out = out.append_column("punct_ratio", pa.array(punct_r, pa.float64()))
    out = out.append_column("stopword_ratio", pa.array(stop_r, pa.float64()))
    return out.append_column("quality", pa.array(score, pa.float64()))


def ws_token_counts(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Whitespace token count per row. ASCII rows count in Arrow C++
    (``count_substring_regex`` — RE2); non-ASCII rows keep the Python
    regex path, whose ``\\s`` is Unicode-aware where RE2's is
    ASCII-only, so the output equals a pandas ``str.count(r"\\S+")`` on
    every input."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    ascii_mask = pc.string_is_ascii(col).to_numpy(zero_copy_only=False)
    ws = np.zeros(len(col), np.int64)
    if ascii_mask.any():
        sub = col.filter(pa.array(ascii_mask))
        ws[np.flatnonzero(ascii_mask)] = pc.count_substring_regex(
            sub, r"\S+"
        ).to_numpy(zero_copy_only=False)
    if not ascii_mask.all():
        rows = np.flatnonzero(~ascii_mask)
        s = pd.Series(col.take(pa.array(rows)).to_pylist()).fillna("")
        ws[rows] = s.str.count(r"\S+").to_numpy(np.int64)
    return ws


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count + BPE-ish subword count. ASCII rows count
    in Arrow C++ (``count_substring_regex`` — RE2); non-ASCII rows keep
    the Python regex path, whose ``\\d``/``\\s`` are Unicode-aware where
    RE2's are ASCII-only, so the output equals the original pandas
    kernel on every input."""
    import pyarrow.compute as pc

    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    ascii_mask = pc.string_is_ascii(col).to_numpy(zero_copy_only=False)
    n = len(col)
    bpe = np.zeros(n, np.int64)
    ws = ws_token_counts(col)
    if ascii_mask.any():
        sub = col.filter(pa.array(ascii_mask))
        idx = np.flatnonzero(ascii_mask)
        bpe[idx] = pc.count_substring_regex(
            sub, r"[A-Za-z]+|\d+|[^\sA-Za-z\d]"
        ).to_numpy(zero_copy_only=False)
    if not ascii_mask.all():
        rows = np.flatnonzero(~ascii_mask)
        s = pd.Series(col.take(pa.array(rows)).to_pylist()).fillna("")
        bpe[rows] = s.str.count(_BPE_RE).to_numpy(np.int64)
    out = batch.append_column("ws_tokens", pa.array(ws, pa.int64()))
    return out.append_column("bpe_tokens", pa.array(bpe, pa.int64()))


_FP_BASE = np.uint64(1099511628211)
_FP_OFFSET = np.uint64(14695981039346656037)


def rolling_fingerprint(text: str) -> int:
    """FNV-1a-style rolling hash over normalized whitespace tokens —
    a stable 64-bit document fingerprint (scalar reference used by the
    vectorized batch kernel's tests)."""
    h = _FP_OFFSET
    for tok in (text or "").lower().split():
        for b in tok.encode("utf-8"):
            h = np.uint64((int(h) ^ b) * int(_FP_BASE) & 0xFFFFFFFFFFFFFFFF)
        h = np.uint64((int(h) ^ 0x20) * int(_FP_BASE) & 0xFFFFFFFFFFFFFFFF)
    return int(h)


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized FNV-1a rolling fingerprint: the byte recurrence is
    inherently sequential per doc, so vectorize ACROSS docs — one padded
    (n_docs, max_len) uint8 matrix, then max_len lane-parallel
    xor-multiply steps (wrap-around uint64 arithmetic). ~L numpy ops per
    batch instead of n_docs × L Python ops. Bit-identical to
    :func:`rolling_fingerprint`."""
    texts = batch[text_col].to_pylist()
    n = len(texts)
    streams = []
    for t in texts:
        toks = (t or "").lower().split()
        streams.append((" ".join(toks) + " ").encode("utf-8") if toks else b"")
    lens = np.fromiter(map(len, streams), dtype=np.int64, count=n)
    max_len = int(lens.max()) if n else 0
    arr = np.zeros((n, max_len), dtype=np.uint8)
    for i, st in enumerate(streams):
        arr[i, : len(st)] = np.frombuffer(st, dtype=np.uint8)
    h = np.full(n, _FP_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(max_len):
            alive = lens > j
            h[alive] = (h[alive] ^ arr[alive, j].astype(np.uint64)) * _FP_BASE
    return batch.append_column("fingerprint", pa.array(h, pa.uint64()))


def fnv1a_ascii_batch(strings: list) -> np.ndarray:
    """Vectorized FNV-1a over a batch of ASCII strings (one uint64 per
    string). Same lane-parallel shape as :func:`fingerprint_batch`:
    concatenate once, slice into a padded (n, max_len) byte matrix, then
    max_len vectorized xor-multiply steps — no per-string Python hashing.
    Bit-identical to hashing each string's bytes with FNV-1a, and to the
    DuckDB ``list_reduce`` FNV fold used by the oracles."""
    n = len(strings)
    if n == 0:
        return np.empty(0, np.uint64)
    cat = "".join(strings)
    if cat.isascii():
        joined = cat.encode("ascii")
        lens = np.fromiter(map(len, strings), dtype=np.int64, count=n)
    else:
        # rare non-ASCII path: byte lengths differ from char lengths
        encoded = [s.encode("utf-8") for s in strings]
        joined = b"".join(encoded)
        lens = np.fromiter(map(len, encoded), dtype=np.int64, count=n)
    buf = np.frombuffer(joined, dtype=np.uint8)
    max_len = int(lens.max()) if n else 0
    h = np.full(n, _FP_OFFSET, dtype=np.uint64)
    if max_len == 0 or buf.size == 0:
        return h
    offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
    idx = np.minimum(offs[:, None] + np.arange(max_len)[None, :],
                     buf.size - 1)
    arr = buf[idx]
    with np.errstate(over="ignore"):
        for j in range(max_len):
            alive = lens > j
            h[alive] = (h[alive] ^ arr[alive, j].astype(np.uint64)) * _FP_BASE
    return h


def batch_term_stream(texts: list) -> tuple[np.ndarray, np.ndarray]:
    """Flatten a batch of texts into one (term, unit_index) occurrence
    stream using the index tokenizer's normalization. Tokenization and
    factorization run through :func:`tokenizer.normalized_slot_codes`
    (Arrow C++ for all-ASCII batches), so each distinct token string is
    materialized ONCE — the returned object array is a gather of
    dictionary references, not fresh per-occurrence strings. Empty slots
    are dropped. Accepts a list or an Arrow string column."""
    from typesense_ray.tokenizer import normalized_slot_codes

    codes, uniq, unit_ix, _pos = normalized_slot_codes(texts)
    return uniq[codes], unit_ix


def doc_freq_partial(
    flat: np.ndarray,
    unit: np.ndarray,
    group_codes: np.ndarray | None = None,
):
    """Per-batch document-frequency combiner over an occurrence stream:
    distinct-(unit, term) dedup then a count per term (or per
    (group, term) when ``group_codes`` gives an int code per unit) —
    all INTEGER ops (one ``pd.factorize`` of the terms, then composite
    int64 ``np.unique``), never an object-dtype ``drop_duplicates`` /
    multi-key groupby (~4× faster on token-scale batches; the same
    integer-run shape as :func:`top_bigrams`' combiner).

    Returns ``(terms, counts)`` or ``(group_ids, terms, counts)``.
    """
    codes, uniq = pd.factorize(flat)
    nt = len(uniq)
    if nt == 0:
        empty = np.empty(0, np.int64)
        terms = np.empty(0, dtype=object)
        return (terms, empty) if group_codes is None else (empty, terms, empty)
    comp_u = np.unique(unit.astype(np.int64) * nt + codes)
    tc = comp_u % nt
    if group_codes is None:
        key_u, cnt = np.unique(tc, return_counts=True)
        return uniq[key_u], cnt
    gt = group_codes[comp_u // nt].astype(np.int64) * nt + tc
    key_u, cnt = np.unique(gt, return_counts=True)
    return key_u // nt, uniq[key_u % nt], cnt


def unit_term_tf(flat: np.ndarray, unit: np.ndarray):
    """Per-(unit, term) term-frequency counts over an occurrence stream
    via the composite-int64 ``np.unique`` (no object-key groupby).
    Returns ``(unit_ids, term_codes, term_uniq, tf)`` — term strings
    stay factorized so downstream sorts can use integer ranks."""
    codes, uniq = pd.factorize(flat)
    nt = len(uniq)
    if nt == 0:
        e = np.empty(0, np.int64)
        return e, e, np.empty(0, dtype=object), e
    ku, cnt = np.unique(unit.astype(np.int64) * nt + codes, return_counts=True)
    return ku // nt, ku % nt, uniq, cnt


def batch_ngram_stream(texts: list, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Word n-grams per doc as space-joined strings over the normalized
    occurrence stream: returns (ngrams, unit_index). Vectorized: one
    flatten via :func:`batch_term_stream`, then n-1 shifted C-level
    string concats over the whole batch (no per-doc Python loops);
    cross-doc windows are masked out with one numpy compare."""
    flat, unit = batch_term_stream(texts)
    m = len(flat)
    if m < n:
        return np.empty(0, dtype=object), np.empty(0, np.int64)
    s = pd.Series(flat, dtype=object)
    g = s.copy()
    for j in range(1, n):
        g = g + " " + s.shift(-j)
    gv = g.to_numpy(dtype=object)[: m - n + 1]
    head_unit = unit[: m - n + 1]
    valid = head_unit == unit[n - 1 :]
    return gv[valid], head_unit[valid]


def repetition_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style repetition signals per doc (Rae et al. 2021 §A1.1):
    ``top_unigram_frac`` (share of tokens taken by the single most
    frequent term) and ``dup_2gram_frac`` (1 − distinct/total bigrams).
    ``keep_rep`` = passes both thresholds (≤0.30 / ≤0.20). Vectorized:
    one flatten, one (doc, term) groupby, one bigram stream + distinct
    bincount — no per-doc Python."""
    texts = batch[text_col].to_pylist()
    m = len(texts)
    flat, unit = batch_term_stream(texts)
    tot = np.bincount(unit, minlength=m).astype(np.float64)
    max_cnt = np.zeros(m)
    tot2 = np.zeros(m, np.float64)
    dist2 = np.zeros(m)
    if len(flat):
        # terms → int codes ONCE; both the per-(doc, term) counts and
        # the bigram-distinct counts become sorted-run detection over
        # integer keys (normalized tokens never contain spaces, so a
        # code-pair equals the old space-joined bigram string exactly).
        # Replaces two pandas object-key groupbys — ~4× faster.
        codes, _ = pd.factorize(flat)
        codes = codes.astype(np.int64)
        U = np.int64(codes.max() + 1)
        pair = unit * U + codes
        sp = np.sort(pair)
        run_start = np.r_[True, sp[1:] != sp[:-1]]
        run_pos = np.flatnonzero(run_start)
        counts = np.diff(np.r_[run_pos, sp.size])
        docs_of = sp[run_start] // U  # ascending within the sort
        doc_start = np.r_[True, docs_of[1:] != docs_of[:-1]]
        max_cnt[docs_of[doc_start]] = np.maximum.reduceat(
            counts, np.flatnonzero(doc_start)
        )
        # bigrams: within-doc adjacent code pairs
        if len(flat) > 1:
            valid = unit[:-1] == unit[1:]
            bu = unit[:-1][valid]
            b0 = codes[:-1][valid]
            b1 = codes[1:][valid]
            tot2 = np.bincount(bu, minlength=m).astype(np.float64)
            if bu.size:
                order = np.lexsort((b1, b0, bu))
                su, s0, s1 = bu[order], b0[order], b1[order]
                uniq_run = np.r_[
                    True,
                    (su[1:] != su[:-1]) | (s0[1:] != s0[:-1])
                    | (s1[1:] != s1[:-1]),
                ]
                dist2 = np.bincount(
                    su[uniq_run], minlength=m
                ).astype(np.float64)
    top_frac = np.where(tot > 0, max_cnt / np.where(tot > 0, tot, 1.0), 0.0)
    dup2 = np.where(tot2 > 0, 1.0 - dist2 / np.where(tot2 > 0, tot2, 1.0), 0.0)
    keep = ((top_frac <= 0.3) & (dup2 <= 0.2)).astype(np.int64)
    out = batch.append_column(
        "top_unigram_frac", pa.array(top_frac, pa.float64())
    )
    out = out.append_column("dup_2gram_frac", pa.array(dup2, pa.float64()))
    return out.append_column("keep_rep", pa.array(keep, pa.int64()))


def chunk_docs_batch(
    batch: pa.Table,
    window: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Split each doc into overlapping token windows (the LLM context
    chunking pass): chunk c covers tokens [c·stride, c·stride+window)
    of the normalized token stream; the tail chunk may be shorter; docs
    with zero tokens emit no chunks. Emits (id_col, chunk_id,
    n_chunk_tokens, chunk_text).

    Shape: one normalize+join per doc, then chunk texts are C-level
    substring slices at precomputed char offsets (one cumsum per doc) —
    the only Python-level iteration is over OUTPUT chunks, ~n_tokens /
    stride per doc, the same order as the rows produced."""
    from typesense_ray.tokenizer import normalized_slots

    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    texts = batch[text_col].to_pylist()
    out_id, out_chunk, out_n, out_text = [], [], [], []
    for did, t in zip(ids, texts):
        toks = [s for s in normalized_slots(t or "") if s]
        n = len(toks)
        if n == 0:
            continue
        joined = " ".join(toks)
        off = np.concatenate(
            [[0], np.cumsum(np.fromiter(map(len, toks), np.int64, n) + 1)]
        )
        for c, s in enumerate(range(0, n, stride)):
            e = min(s + window, n)
            out_id.append(did)
            out_chunk.append(c)
            out_n.append(e - s)
            out_text.append(joined[off[s] : off[e] - 1])
    return pa.table(
        {
            id_col: pa.array(out_id, pa.int64()),
            "chunk_id": pa.array(out_chunk, pa.int64()),
            "n_chunk_tokens": pa.array(out_n, pa.int64()),
            "chunk_text": pa.array(out_text, pa.string()),
        }
    )


def _char_bigram_stream(texts: list) -> tuple[np.ndarray, np.ndarray]:
    """All within-doc char bigrams of a batch as packed uint64 codes
    (cp1 << 21 | cp2) + doc index. One join + one utf-32 decode for the
    whole batch; cross-doc bigrams masked with one compare."""
    m = len(texts)
    joined = "".join(t or "" for t in texts)
    arr = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    if arr.size < 2:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    lens = np.fromiter((len(t or "") for t in texts), np.int64, m)
    codes = (arr[:-1].astype(np.uint64) << np.uint64(21)) | arr[1:].astype(
        np.uint64
    )
    unit = np.repeat(np.arange(m, dtype=np.int64), lens)
    valid = unit[:-1] == unit[1:]
    return codes[valid], unit[:-1][valid]


def char_lm_score(ds, text_col: str = "text", id_col: str = "doc_id"):
    """CCNet-style LM quality signal: per-doc mean log-probability under
    a char-bigram model TRAINED ON THE CORPUS ITSELF —
    ``avg_logprob = mean_i ln P(c_{i+1} | c_i)`` with
    ``P(b|a) = count(ab) / count(a·)``.

    Two streaming passes: (1) per-batch bigram histograms
    (``np.unique`` on packed codes) fold to the global model — the
    model is |charset|² rows max, so it broadcasts via ``ray.put`` and
    the fold is trivially driver-sized; (2) per-batch vectorized
    ``searchsorted`` probe + in-text-order ``bincount`` accumulation
    (matches a serial scan's float-add order for oracle parity).

    Returns a Dataset of (id_col, n_bigrams, avg_logprob-unrounded).
    """
    import ray

    def hist(batch: pa.Table) -> pa.Table:
        codes, _ = _char_bigram_stream(batch[text_col].to_pylist())
        u, c = np.unique(codes, return_counts=True)
        return pa.table(
            {"bg": pa.array(u.astype(np.int64), pa.int64()),
             "c": pa.array(c, pa.int64())}
        )

    parts = ds.map_batches(hist, batch_format="pyarrow").to_pandas()
    model = parts.groupby("bg", as_index=False)["c"].sum().sort_values(
        "bg", ignore_index=True
    )
    bgs = model["bg"].to_numpy(np.uint64)
    cnt = model["c"].to_numpy(np.float64)
    first = (bgs >> np.uint64(21)).astype(np.int64)
    c1 = pd.DataFrame({"f": first, "c": cnt}).groupby("f")["c"].sum()
    lnp = np.log(cnt / c1.loc[first].to_numpy())
    ref = ray.put((bgs, lnp))

    def score(batch: pa.Table) -> pa.Table:
        b, l = ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = len(ids)
        codes, unit = _char_bigram_stream(batch[text_col].to_pylist())
        pos = np.searchsorted(b, codes)
        lp = l[pos]  # every bigram is in the model (trained on this corpus)
        n = np.bincount(unit, minlength=m).astype(np.int64)
        sums = np.bincount(unit, weights=lp, minlength=m)
        avg = np.where(n > 0, sums / np.where(n > 0, n, 1), 0.0)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "n_bigrams": pa.array(n, pa.int64()),
                "avg_logprob": pa.array(avg, pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def tfidf_topk(
    ds,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Top-k TF-IDF terms per document: score = tf · ln(N / df).

    Two streaming passes over the corpus (re-tokenizing beats
    materializing a corpus-sized (doc, term, tf) stream):

    1. global df — per-batch distinct-(term, doc) partials reduced with
       one pandas groupby (vocab-sized by Heaps' law: vocab << corpus),
       broadcast via ``ray.put`` as (sorted terms, df) arrays for
       vectorized ``np.searchsorted`` probes;
    2. per-batch: occurrence stream → (doc, term) tf counts → scores →
       per-doc top-k by (score desc, term asc), all pandas/numpy.

    Returns a Dataset of (id_col, term, score).
    """
    import ray

    def df_partial(batch: pa.Table) -> pa.Table:
        flat, unit = batch_term_stream(batch[text_col].to_pylist())
        terms, cnt = doc_freq_partial(flat, unit)
        return pa.table(
            {"term": pa.array(terms, pa.string()),
             "df": pa.array(cnt, pa.int64())}
        )

    from typesense_ray.agg import fold_grouped

    parts = ds.map_batches(
        df_partial, batch_format="pyarrow", batch_size=8192
    ).to_pandas()
    dfs = fold_grouped(parts, ["term"], {"df": "sum"})
    n_docs = ds.count()
    terms_sorted = dfs["term"].to_numpy(dtype=object)
    df_arr = dfs["df"].to_numpy(np.int64)
    ref = ray.put((terms_sorted, df_arr, n_docs))

    def topk(batch: pa.Table) -> pa.Table:
        terms, dfv, n = ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        flat, unit = batch_term_stream(batch[text_col].to_pylist())
        u, tc, uniq, tf = unit_term_tf(flat, unit)
        pos = np.searchsorted(terms, uniq[tc])
        score = tf.astype(np.float64) * np.log(n / dfv[pos])
        # per-doc top-k by (score desc, term asc) without an object-key
        # sort: term asc == rank asc where rank is the term's position
        # in the lexicographic order of this batch's vocab
        rank = np.empty(len(uniq), np.int64)
        rank[np.argsort(uniq, kind="stable")] = np.arange(len(uniq))
        o = np.lexsort((rank[tc], -score, u))
        us = u[o]
        starts = np.flatnonzero(np.r_[True, us[1:] != us[:-1]])
        offset = np.repeat(starts, np.diff(np.r_[starts, len(us)]))
        sel = o[np.arange(len(us)) - offset < k]
        return pa.table(
            {
                id_col: pa.array(ids[u[sel]], pa.int64()),
                "term": pa.array(uniq[tc[sel]], pa.string()),
                "score": pa.array(score[sel], pa.float64()),
            }
        )

    return ds.map_batches(topk, batch_format="pyarrow")


# PII patterns, deliberately RE2-compatible so the DuckDB oracle can run
# the byte-identical substitutions (no lookbehind/backrefs)
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+\d{7,15}\b", "<PHONE>"),
)

_PII_COMPILED = tuple(
    (re.compile(pat), repl) for pat, repl in PII_PATTERNS
)


def redact_pii_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Scrub emails / IPv4s / E.164-ish phone numbers to placeholder
    tokens — the standard pre-training privacy pass, applied in
    declaration order; emits ``text`` (redacted) and ``pii_hits``
    (total substitutions per doc). ASCII rows run the substitutions in
    Arrow C++ (the patterns are deliberately RE2-compatible — that's
    also what lets the DuckDB oracle run them byte-identically);
    non-ASCII rows keep the Python path, whose ``\\d`` additionally
    matches Unicode digits."""
    import pyarrow.compute as pc

    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    ascii_mask = pc.string_is_ascii(col).to_numpy(zero_copy_only=False)
    n = len(col)
    hits = np.zeros(n, np.int64)
    texts = np.empty(n, dtype=object)
    if ascii_mask.any():
        idx = np.flatnonzero(ascii_mask)
        sub = col.filter(pa.array(ascii_mask))
        for pat, repl in PII_PATTERNS:
            hits[idx] += pc.count_substring_regex(sub, pat).to_numpy(
                zero_copy_only=False
            )
            sub = pc.replace_substring_regex(sub, pat, repl)
        texts[idx] = np.asarray(sub.to_pylist(), dtype=object)
    if not ascii_mask.all():
        rows = np.flatnonzero(~ascii_mask)
        s = pd.Series(col.take(pa.array(rows)).to_pylist()).fillna("")
        h = np.zeros(len(rows), np.int64)
        for rx, repl in _PII_COMPILED:
            h += s.str.count(rx).to_numpy(np.int64)
            s = s.str.replace(rx, repl, regex=True)
        hits[rows] = h
        texts[rows] = s.to_numpy(dtype=object)
    out = batch.drop_columns([text_col])
    out = out.append_column(text_col, pa.array(texts.tolist(), pa.string()))
    return out.append_column("pii_hits", pa.array(hits, pa.int64()))


def oov_rate(ds, vocab_terms, text_col: str = "text", id_col: str = "doc_id"):
    """Per-doc out-of-vocabulary token-occurrence rate against a
    broadcast vocabulary (the tokenizer-coverage report run before any
    BPE/vocab decision): the vocab is ``ray.put`` once and probed with a
    C-level hash ``isin`` over the flattened occurrence stream — no
    per-token Python, no shuffle. Docs with zero tokens are dropped
    (rate undefined). Returns (id, n_toks, oov_rate)."""
    import ray

    ref = ray.put(np.asarray(list(vocab_terms), dtype=object))

    def rate(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        flat, unit = batch_term_stream(texts)
        n = np.bincount(unit, minlength=len(texts))
        inv = pd.Series(flat, dtype=object).isin(ray.get(ref)).to_numpy()
        oovs = np.bincount(unit[~inv], minlength=len(texts))
        keep = n > 0
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array(ids[keep], pa.int64()),
                "n_toks": pa.array(n[keep], pa.int64()),
                "oov_rate": pa.array(
                    oovs[keep] * 1.0 / n[keep], pa.float64()
                ),
            }
        )

    return ds.map_batches(rate, batch_format="pyarrow")


def top_bigrams(ds, text_col: str = "text", k: int = 30,
                mode: str = "auto",
                stream_max_rows: int = 5_000_000) -> pd.DataFrame:
    """Corpus-wide word-bigram counts, top-k by (count desc, bigram asc)
    — the co-occurrence table LM data reports start from.

    Per-batch combiner counts adjacent-token pairs as INTEGER codes
    (factorize once, ``np.unique`` on packed int64 keys) and decodes
    only the batch's DISTINCT bigrams to strings — the previous
    shifted-string-concat allocated one Python string per OCCURRENCE
    (388 s at 400k docs). The merge is size-aware like the other folds
    (``functions/dedup.py``): partials under ``stream_max_rows`` fold
    on the driver; above that, ONE coarse ``hash(bigram) % 64``
    exchange (the same int-keyed partition shape as the dedup
    exchanges — a full Ray sort keyed by the bigram STRINGS was
    measured minutes-slow at ~29M distinct keys) co-locates each key
    in exactly one partition, so a per-partition pandas sum + top-k
    followed by a tiny driver merge is exact (same (cnt desc, bigram
    asc) order at both levels)."""
    empty = pd.DataFrame({"bigram": pd.Series([], dtype=object),
                          "cnt": pd.Series([], dtype=np.int64)})

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        flat, unit = batch_term_stream(df[text_col].tolist())
        if len(flat) < 2:
            return empty.copy()
        codes, uniq = pd.factorize(flat)
        codes = codes.astype(np.int64)
        U = np.int64(len(uniq))
        valid = unit[:-1] == unit[1:]
        pair = codes[:-1][valid] * U + codes[1:][valid]
        if not pair.size:
            return empty.copy()
        up, cnt = np.unique(pair, return_counts=True)
        ua = np.asarray(uniq, dtype=object)
        grams = [f"{a} {b}" for a, b in zip(ua[up // U], ua[up % U])]
        return pd.DataFrame({"bigram": pd.Series(grams, dtype=object),
                             "cnt": cnt.astype(np.int64)})

    part_ds = ds.map_batches(partial, batch_format="pandas").materialize()
    if mode == "auto":
        mode = "stream" if part_ds.count() <= stream_max_rows else "groupby"

    def _order(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["cnt", "bigram"], ascending=[False, True],
                              kind="stable").head(k)

    if mode == "stream":
        parts = list(
            part_ds.iter_batches(batch_format="pandas", batch_size=None)
        )
        if not parts:
            return empty
        allp = pd.concat(parts, ignore_index=True)
        if allp.empty:
            return empty
        out = allp.groupby("bigram", as_index=False).agg(cnt=("cnt", "sum"))
    else:
        n_parts = 64

        def add_part(df: pd.DataFrame) -> pd.DataFrame:
            h = pd.util.hash_array(df["bigram"].to_numpy(dtype=object))
            df = df.copy()
            df["part"] = (h % n_parts).astype(np.int32)
            return df

        def part_topk(g: pd.DataFrame) -> pd.DataFrame:
            s = g.groupby("bigram", as_index=False).agg(cnt=("cnt", "sum"))
            return _order(s)

        tops = list(
            part_ds.map_batches(add_part, batch_format="pandas")
            .groupby("part")
            .map_groups(part_topk, batch_format="pandas")
            .iter_batches(batch_format="pandas", batch_size=None)
        )
        if not tops:
            return empty
        out = pd.concat(tops, ignore_index=True)
    return _order(out).reset_index(drop=True)
