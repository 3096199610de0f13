"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting — vectorized ``map_batches`` stages over the
``documents`` table shape (doc_id, text, ...)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

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


class LangId:
    """Actor-pool stage: stopword-profile language ID with confidence.
    Profiles compiled once per actor (``__init__``)."""

    def __init__(self):
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs, confs = [], []
        for text in batch["text"].to_pylist():
            toks = _WORD_RE.findall((text or "").lower())
            if not toks:
                langs.append("und")
                confs.append(0.0)
                continue
            scores = {
                lang: sum(1 for t in toks if t in prof) / len(toks)
                for lang, prof in self.profiles.items()
            }
            best = max(scores, key=lambda l: (scores[l], l))
            langs.append(best if scores[best] > 0 else "und")
            confs.append(round(scores[best], 6))
        return batch.append_column(
            "lang_pred", pa.array(langs, pa.string())
        ).append_column("lang_conf", pa.array(confs, pa.float64()))


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality-signal columns: n_tokens, mean token length, digit ratio,
    punctuation ratio, stopword ratio, and a composite [0,1] score.
    Pure-SQL-expressible components are kept bit-identical to the oracle
    (see __ray_entry__.oracle_sql)."""
    n_tokens, mean_len, digit_r, punct_r, stop_r = [], [], [], [], []
    for text in batch[text_col].to_pylist():
        t = text or ""
        toks = [x for x in t.replace("\n", " ").split(" ") if x]
        n = len(toks)
        n_tokens.append(n)
        mean_len.append(round(sum(len(x) for x in toks) / n, 6) if n else 0.0)
        nc = len(t)
        digit_r.append(round(sum(c.isdigit() for c in t) / nc, 6) if nc else 0.0)
        punct_r.append(
            round(sum(not c.isalnum() and not c.isspace() for c in t) / nc, 6)
            if nc else 0.0
        )
        stop_r.append(
            round(sum(1 for x in toks if x.lower() in _STOP_EN) / n, 6) if n else 0.0
        )
    out = batch.append_column("n_tokens", pa.array(n_tokens, pa.int64()))
    out = out.append_column("mean_token_len", pa.array(mean_len, pa.float64()))
    out = out.append_column("digit_ratio", pa.array(digit_r, pa.float64()))
    out = out.append_column("punct_ratio", pa.array(punct_r, pa.float64()))
    out = out.append_column("stopword_ratio", pa.array(stop_r, pa.float64()))
    score = [
        round(
            max(0.0, min(1.0,
                0.4 * min(1.0, n / 100.0) + 0.3 * (1.0 - d) + 0.3 * (1.0 - p))),
            6,
        )
        for n, d, p in zip(n_tokens, digit_r, punct_r)
    ]
    return out.append_column("quality", pa.array(score, pa.float64()))


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count + BPE-ish subword count (compiled regex,
    vectorized via pandas str)."""
    s = pd.Series(batch[text_col].to_pylist()).fillna("")
    ws = s.str.split().str.len().astype("int64")
    bpe = s.str.findall(_BPE_RE).str.len().astype("int64")
    out = batch.append_column("ws_tokens", pa.array(ws.tolist(), pa.int64()))
    return out.append_column("bpe_tokens", pa.array(bpe.tolist(), pa.int64()))


_FP_BASE = np.uint64(1099511628211)
_FP_OFFSET = np.uint64(14695981039346656037)


def rolling_fingerprint(text: str) -> int:
    """FNV-1a-style rolling hash over normalized whitespace tokens —
    a stable 64-bit document fingerprint."""
    h = _FP_OFFSET
    for tok in (text or "").lower().split():
        for b in tok.encode("utf-8"):
            h = np.uint64((int(h) ^ b) * int(_FP_BASE) & 0xFFFFFFFFFFFFFFFF)
        h = np.uint64((int(h) ^ 0x20) * int(_FP_BASE) & 0xFFFFFFFFFFFFFFFF)
    return int(h)


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    fps = [rolling_fingerprint(t) for t in batch[text_col].to_pylist()]
    return batch.append_column("fingerprint", pa.array(fps, pa.uint64()))
