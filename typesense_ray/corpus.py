"""Deterministic synthetic source-code corpus (the north-rule input table).

Schema (FIXTURES.md §1): ``repo:string, path:string, commit:string,
lang:string, content:large_string, sha256:string`` — one row per source
file. Seeded and reproducible at any scale; no external data.

Planted query terms (:data:`PLANTED_TERMS`) occur with known, seeded
frequencies so exact-term (typo-distance-0) queries have verifiable
results. Repo sizes are zipf-ish to exercise skew; a sprinkle of unicode
identifiers exercises the tokenizer translit path; rare very-large and
empty/whitespace-only files exercise batch/memory edge cases.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

LANGS = ["py", "c", "cpp", "go", "js", "rs", "java", "md"]
EXT = {l: l for l in LANGS}
EXT.update({"py": "py", "rs": "rs", "md": "md", "java": "java"})

KEYWORDS = {
    "py": "def return import class for while if else elif try except lambda yield None True False self print".split(),
    "c": "int char void return struct static const for while if else sizeof typedef union switch case break".split(),
    "cpp": "int void return class template typename namespace const auto for while if else virtual public private".split(),
    "go": "func return package import type struct interface for range if else go chan defer select var const".split(),
    "js": "function return var let const for while if else class async await export import new this typeof".split(),
    "rs": "fn return pub use struct enum impl trait for while if else let mut match move unsafe crate".split(),
    "java": "public static void return class interface extends implements final for while if else new this import".split(),
    "md": "the a and of to in for is on with as by at from this that".split(),
}

# Exact-term query vocabulary planted with controlled frequency.
PLANTED_TERMS = [
    "quasar", "nebulaflux", "ioncore", "gravipulse", "heliograph",
    "darkmatter", "pulsar", "redshift", "perihelion", "magnetar",
    "tokamak", "cryostat", "qubit", "entropy", "lattice",
    "spinor", "gluon", "hadron", "meson", "tachyon",
]

UNICODE_IDENTS = ["café", "größe", "naïve", "übermax", "señal", "तापमान", "速度"]

_SYLLABLES = (
    "ba be bi bo bu ca ce ci co cu da de di do du fa fe fi fo fu "
    "ga ge gi go gu ha he hi ho hu ja je ji jo ju ka ke ki ko ku "
    "la le li lo lu ma me mi mo mu na ne ni no nu pa pe pi po pu "
    "ra re ri ro ru sa se si so su ta te ti to tu va ve vi vo vu"
).split()


def _build_ident_vocab(seed: int, n: int = 400) -> list[str]:
    rng = np.random.default_rng(seed)
    idents = []
    for _ in range(n):
        k = rng.integers(2, 5)
        parts = [_SYLLABLES[i] for i in rng.integers(0, len(_SYLLABLES), k)]
        if rng.random() < 0.5:
            name = "_".join(["".join(parts[:2]), "".join(parts[2:])]).strip("_")
        else:
            name = parts[0] + "".join(p.capitalize() for p in parts[1:])
        idents.append(name)
    return idents


_PUNCT_WRAP = ["{}(", "({})", "{};", "{},", "{}:", "[{}]", "{}()", "&{}", "*{}", "{}->"]


def make_doc(doc_index: int, seed: int = 42) -> dict:
    """Generate one document deterministically from (seed, doc_index)."""
    rng = np.random.default_rng([seed, doc_index])
    idents = _IDENT_CACHE.get(seed)
    if idents is None:
        idents = _IDENT_CACHE[seed] = _build_ident_vocab(seed)
    lang = LANGS[int(rng.integers(0, len(LANGS)))]
    n_repos = 97
    repo_idx = min(int(rng.zipf(1.3)) - 1, n_repos - 1)
    repo = f"org{repo_idx % 13}/repo{repo_idx}"
    path = (
        f"dir{int(rng.integers(0, 20))}/dir{int(rng.integers(0, 40))}/"
        f"file{doc_index}.{EXT[lang]}"
    )
    commit = bytes(rng.integers(0, 256, 20, dtype=np.uint8)).hex()

    if doc_index % 499 == 131:
        content = "" if doc_index % 2 else "   \n  "
    else:
        n_tokens = int(rng.integers(20, 400))
        if doc_index % 997 == 0:
            n_tokens = 5000
        kws = np.asarray(KEYWORDS[lang], dtype=object)
        ident_arr = np.asarray(idents, dtype=object)
        # one vectorized draw per choice dimension (fast path: ~100 µs/doc)
        r = rng.random(n_tokens)
        picks = rng.integers(0, 1 << 30, n_tokens)
        toks = np.empty(n_tokens, dtype=object)
        m_kw = r < 0.30
        toks[m_kw] = kws[picks[m_kw] % len(kws)]
        m_id = (r >= 0.30) & (r < 0.78)
        toks[m_id] = ident_arr[picks[m_id] % len(ident_arr)]
        m_num = (r >= 0.78) & (r < 0.86)
        toks[m_num] = np.char.mod("%d", (picks[m_num] % 10000)).astype(object)
        m_pl = (r >= 0.86) & (r < 0.97)
        zi = np.minimum(rng.zipf(1.4, int(m_pl.sum())) - 1, len(PLANTED_TERMS) - 1)
        toks[m_pl] = np.asarray(PLANTED_TERMS, dtype=object)[zi]
        m_uni = r >= 0.97
        toks[m_uni] = np.asarray(UNICODE_IDENTS, dtype=object)[
            picks[m_uni] % len(UNICODE_IDENTS)
        ]
        # wrap ~25% of identifiers in punctuation
        wrap_sel = np.flatnonzero(m_id & (rng.random(n_tokens) < 0.25))
        for j in wrap_sel:
            toks[j] = _PUNCT_WRAP[int(picks[j]) % len(_PUNCT_WRAP)].format(toks[j])
        # newline every 8 tokens
        lines = [
            " ".join(toks[i : i + 8]) for i in range(0, n_tokens, 8)
        ]
        content = "\n".join(lines)
    return {
        "repo": repo,
        "path": path,
        "commit": commit,
        "lang": lang,
        "content": content,
        "sha256": hashlib.sha256(content.encode("utf-8")).hexdigest(),
    }


_IDENT_CACHE: dict[int, list[str]] = {}

CORPUS_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.large_string()),
        ("sha256", pa.string()),
    ]
)


def generate_corpus_table(n_docs: int, seed: int = 42, start: int = 0) -> pa.Table:
    """Driver-side generation for tests / small scales."""
    rows = [make_doc(i, seed) for i in range(start, start + n_docs)]
    cols = {name: [r[name] for r in rows] for name in CORPUS_SCHEMA.names}
    return pa.Table.from_pydict(cols, schema=CORPUS_SCHEMA)


def generate_corpus(
    out_dir: str, n_docs: int, seed: int = 42, num_blocks: int | None = None
) -> None:
    """Ray-parallel generation: each ``map_batches`` task generates its id
    range independently (per-doc seeding ⇒ order-independent determinism)
    and the output is partitioned Parquet (resumable layout)."""
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        rows = [make_doc(int(i), seed) for i in batch["id"].to_numpy()]
        cols = {name: [r[name] for r in rows] for name in CORPUS_SCHEMA.names}
        return pa.Table.from_pydict(cols, schema=CORPUS_SCHEMA)

    ds = rd.range(n_docs)
    if num_blocks:
        ds = ds.repartition(num_blocks)
    ds.map_batches(gen, batch_format="pyarrow", batch_size=8192).write_parquet(out_dir)
