"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (index build + BM25 search over
the sf0.001 documents table). ``queries()`` exposes one callable per
implemented operator/pipeline from SURVEY.md §2 plus the training-data
operators; ``oracle_sql()`` gives the DuckDB-equivalent SQL for every
SQL-expressible one (same column names, floats rounded identically on
both sides).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa

_K1 = 1.2
_B = 0.75
_BM25_QUERY = "data stream join"
_BM25_TERMS = ("data", "join", "stream")  # sorted

_CACHE: dict[str, Any] = {}


def _docs_index(sf_dir: str):
    """Build (once per sf_dir) the inverted index over documents.parquet
    and return a RayCollection. Content-addressed output dir → resumable."""
    from typesense_ray.collection import RayCollection
    from typesense_ray.index_build import IndexConfig, build_index

    key = f"coll:{sf_dir}"
    if key in _CACHE:
        return _CACHE[key]
    tag = hashlib.blake2b(sf_dir.encode(), digest_size=6).hexdigest()
    out = f"/tmp/tsray_cache/docidx-{tag}"
    os.makedirs(out, exist_ok=True)
    cfg = IndexConfig(
        text_field="text",
        id_field="doc_id",
        sha_field=None,
        batch_docs=4096,
        meta_fields=("doc_id", "text", "lang", "source", "n_chars"),
    )
    build_index(f"{sf_dir}/documents.parquet", out, cfg)
    coll = RayCollection(out, default_sorting_field="n_chars")
    _CACHE[key] = coll
    return coll


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    """Streaming parquet read; pass ``columns`` so only the consumed
    columns leave storage (events.props — the fat JSON column — must
    never ride along with a window aggregate that ignores it).

    Read parallelism is row-aware (footer metadata only): a single-file
    corpus parquet otherwise reads as row-group-many blocks (~4 at 400k
    rows), capping every downstream ``map_batches`` at 4-way — measured
    2× on the 400k-doc text stages. Small tables keep few blocks so
    per-task overhead doesn't dominate (same formula as the dedup
    fixture's repartition)."""
    import pyarrow.parquet as pq
    import ray as _ray
    import ray.data as rd

    path = f"{sf_dir}/{table}.parquet"
    n_rows = pq.ParquetFile(path).metadata.num_rows
    n_cpu = int(_ray.cluster_resources().get("CPU", 8))
    n_blocks = max(8, min(2 * n_cpu, n_rows // 5_000))
    return rd.read_parquet(path, columns=columns, override_num_blocks=n_blocks)


def _i64(tbl: pa.Table, col: str) -> pa.Table:
    i = tbl.schema.get_field_index(col)
    return tbl.set_column(i, col, tbl[col].cast(pa.int64()))


def _min_k_ids(path: str, col: str, k: int) -> list[int]:
    """k smallest values of an id column, computed DISTRIBUTED: per-block
    partial k-smallest (np.partition) via map_batches, driver merges only
    k·n_blocks ints — never the full column (gigabytes of int64 at 10⁹
    rows)."""
    import ray.data as rd

    def partial(t: pa.Table) -> pa.Table:
        arr = t[col].to_numpy(zero_copy_only=False)
        kk = min(k, arr.size)
        if kk == 0:
            return pa.table({col: pa.array([], pa.int64())})
        sm = np.partition(arr, kk - 1)[:kk]
        return pa.table({col: pa.array(np.sort(sm).astype(np.int64))})

    parts = (
        rd.read_parquet(path, columns=[col])
        .map_batches(partial, batch_format="pyarrow")
        .take_all()
    )
    return sorted(r[col] for r in parts)[:k]


def _head_by_id(path: str, id_col: str, k: int,
                columns: list[str]) -> pa.Table:
    """The k smallest-``id_col`` rows of a parquet file, robust to file
    row order: distributed min-k over the id column, then a read of only
    ``columns`` with the ``id <= kth`` predicate pushed into the scan
    (row-group statistics pruning applies)."""
    import pyarrow.dataset as pds

    ids = _min_k_ids(path, id_col, k)
    if not ids:
        return pds.dataset(path).to_table(columns=columns).slice(0, 0)
    return (
        pds.dataset(path)
        .to_table(columns=columns,
                  filter=pds.field(id_col) <= int(ids[-1]))
        .sort_by(id_col)
        .slice(0, k)
    )


def _query_vec(sf_dir: str, vec_id: int = 0) -> np.ndarray:
    """One embedding row by key, read with the predicate pushed into the
    parquet scan — only row groups whose stats admit ``vec_id`` decode;
    never the whole embedding column on the driver."""
    import pyarrow.dataset as pds

    t = pds.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"],
        filter=pds.field("vec_id") == vec_id,
    )
    return np.array(t["embedding"].to_pylist()[0], dtype=np.float64)



def _round_half_up(x: float, nd: int) -> float:
    """DuckDB-compatible rounding (half away from zero) for POSITIVE
    rationals like jaccard scores, where python's banker's rounding can
    differ at exact .5 boundaries (e.g. 0.98125 -> 0.9812 vs 0.9813)."""
    import math

    p = 10.0 ** nd
    return math.floor(x * p + 0.5) / p


# ---------------------------------------------------------------------------
# fulltext engine queries
# ---------------------------------------------------------------------------


def q_term_df_top50(sf_dir: str) -> pa.Table:
    """Tokenize → per-batch partial df (combiner) → stream-merge the
    vocab-sized partials → top 50 by (df desc, term asc). The index-build
    hot path exposed as a relational result."""
    import pandas as pd
    import ray.data as rd

    from typesense_ray.agg import combiner_aggregate

    def triples(df: pd.DataFrame) -> pd.DataFrame:
        from typesense_ray.functions.text import (
            batch_term_stream,
            doc_freq_partial,
        )

        flat, unit = batch_term_stream(df["text"].tolist())
        terms, cnt = doc_freq_partial(flat, unit)
        return pd.DataFrame({"term": terms, "df": cnt})

    out = combiner_aggregate(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"]),
        triples, ["term"], {"df": "sum"},
    )
    out = out.sort_values(
        ["df", "term"], ascending=[False, True], kind="stable"
    ).head(50)
    return _i64(
        pa.Table.from_pandas(out.reset_index(drop=True)), "df"
    ).select(["term", "df"])


def q_top_terms_per_lang(sf_dir: str) -> pa.Table:
    """Top-10 terms by document frequency WITHIN each language — the
    grouped heavy-hitters report (per-batch distinct-(term, doc)
    combiners keyed by lang, vocab×langs-bounded merge, top-k per
    group)."""
    import pandas as pd
    import ray.data as rd

    from typesense_ray.agg import combiner_aggregate

    def triples(df: pd.DataFrame) -> pd.DataFrame:
        from typesense_ray.functions.text import (
            batch_term_stream,
            doc_freq_partial,
        )

        flat, unit = batch_term_stream(df["text"].tolist())
        lang_codes, lang_uniq = pd.factorize(df["lang"].to_numpy())
        gids, terms, cnt = doc_freq_partial(flat, unit, lang_codes)
        return pd.DataFrame(
            {"lang": lang_uniq[gids], "term": terms, "df": cnt}
        )

    out = combiner_aggregate(
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["text", "lang"]),
        triples, ["lang", "term"], {"df": "sum"},
    )
    top = (
        out.sort_values(["lang", "df", "term"],
                        ascending=[True, False, True], kind="stable")
        .groupby("lang", sort=False)
        .head(10)
        .reset_index(drop=True)
    )
    return _i64(pa.Table.from_pandas(top), "df").select(
        ["lang", "term", "df"]
    )


def q_bm25_topk(sf_dir: str) -> pa.Table:
    coll = _docs_index(sf_dir)
    res = coll._local.search(_BM25_QUERY, k=10, mode="bm25")
    return pa.table(
        {
            "doc_id": res["doc_id"].cast(pa.int64()),
            "score": pa.array(
                [round(s, 4) for s in res["score"].to_pylist()], pa.float64()
            ),
        }
    )


def q_bm25_or_topk(sf_dir: str) -> pa.Table:
    """Disjunctive (OR) BM25 top-10 via block-max WAND."""
    coll = _docs_index(sf_dir)
    res = coll._local.search(
        _BM25_QUERY, k=10, mode="bm25_or", disjunctive_method="wand"
    )
    return pa.table(
        {
            "doc_id": res["doc_id"].cast(pa.int64()),
            "score": pa.array(
                [round(s, 4) for s in res["score"].to_pylist()], pa.float64()
            ),
        }
    )


def q_hybrid_search(sf_dir: str) -> pa.Table:
    """Hybrid retrieval (the modern lexical+vector pipeline): BM25
    top-100 candidates from the inverted index, then embedding-cosine
    rerank against the query vector (vec 0) with a bounded broadcast
    probe (functions/similarity.rerank_by_cosine — only the 100
    candidates' embeddings ever leave the scan), final top-10 by
    (cosine desc, doc_id desc)."""
    import pyarrow.parquet as pq

    from typesense_ray.functions.similarity import rerank_by_cosine

    coll = _docs_index(sf_dir)
    res = coll._local.search(_BM25_QUERY, k=100, mode="bm25")
    bm = {
        int(d): float(s)
        for d, s in zip(res["doc_id"].to_pylist(), res["score"].to_pylist())
    }
    qvec = _query_vec(sf_dir, 0)
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cos = rerank_by_cosine(emb, list(bm), qvec).to_pandas()
    cos = cos.sort_values(
        ["cosine", "vec_id"], ascending=[False, False], ignore_index=True
    ).head(10)
    return pa.table(
        {
            "doc_id": pa.array(cos["vec_id"], pa.int64()),
            "bm25": pa.array(
                [round(bm[int(d)], 4) for d in cos["vec_id"]], pa.float64()
            ),
            "cosine": pa.array(
                [round(c, 5) for c in cos["cosine"]], pa.float64()
            ),
        }
    )


def q_more_like_this(sf_dir: str) -> pa.Table:
    """Top-20 docs most similar to doc 0 by Σ tf·ln(N/df) over the
    seed's distinct terms (LocalIndexSearcher.more_like_this)."""
    coll = _docs_index(sf_dir)
    res = coll._local.more_like_this(0, k=20)
    return pa.table(
        {
            "doc_id": res["doc_id"].cast(pa.int64()),
            "score": pa.array(
                [round(s, 4) for s in res["score"].to_pylist()], pa.float64()
            ),
        }
    )


def q_exact_and_search(sf_dir: str) -> pa.Table:
    coll = _docs_index(sf_dir)
    return coll.matching_ids("window merge")


def q_filter_dsl(sf_dir: str) -> pa.Table:
    coll = _docs_index(sf_dir)
    return coll.matching_ids("*", filter_by="n_chars:>=300 && lang:[en,de]")


def q_facet_lang_counts(sf_dir: str) -> pa.Table:
    coll = _docs_index(sf_dir)
    r = coll.search("data", facet_by="lang", per_page=1, highlight=False,
                    max_facet_values=100)
    counts = r["facet_counts"][0]["counts"]
    return pa.table(
        {"value": pa.array([c["value"] for c in counts], pa.string()),
         "cnt": pa.array([c["count"] for c in counts], pa.int64())}
    )


def q_facet_stats_by_lang(sf_dir: str) -> pa.Table:
    """Facet-stats machinery (min/max/sum/avg/count) as a combiner
    aggregate (the reference's numeric facet stats, src/index.cpp:608-640):
    each batch reduces to ≤|langs| partial rows, stream-merged."""
    import pandas as pd
    import ray.data as rd

    from typesense_ray.agg import combiner_aggregate

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("lang", as_index=False).agg(
            min_nc=("n_chars", "min"), max_nc=("n_chars", "max"),
            sum_nc=("n_chars", "sum"), cnt=("n_chars", "size"),
        )

    out = combiner_aggregate(
        rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"]
        ),
        partial, ["lang"],
        {"min_nc": "min", "max_nc": "max", "sum_nc": "sum", "cnt": "sum"},
    )
    tbl = pa.Table.from_pandas(out.reset_index(drop=True))
    return pa.table(
        {
            "lang": tbl["lang"],
            "min_nc": tbl["min_nc"].cast(pa.int64()),
            "max_nc": tbl["max_nc"].cast(pa.int64()),
            "sum_nc": tbl["sum_nc"].cast(pa.int64()),
            "avg_nc": pa.array(
                [
                    round(float(s) / int(c), 6)
                    for s, c in zip(
                        tbl["sum_nc"].to_pylist(), tbl["cnt"].to_pylist()
                    )
                ],
                pa.float64(),
            ),
            "cnt": tbl["cnt"].cast(pa.int64()),
        }
    )


def q_sort_topk(sf_dir: str) -> pa.Table:
    coll = _docs_index(sf_dir)
    r = coll.search("*", sort_by="n_chars:desc", per_page=20, highlight=False)
    return pa.table(
        {
            "doc_id": pa.array(
                [h["document"]["doc_id"] for h in r["hits"]], pa.int64()
            ),
            "n_chars": pa.array(
                [h["document"]["n_chars"] for h in r["hits"]], pa.int64()
            ),
        }
    )


def q_group_top2_per_lang(sf_dir: str) -> pa.Table:
    coll = _docs_index(sf_dir)
    r = coll.search(
        "*", group_by="lang", group_limit=2, sort_by="n_chars:desc",
        per_page=100, highlight=False,
    )
    langs, dids, ncs = [], [], []
    for g in r["grouped_hits"]:
        for h in g["hits"]:
            langs.append(g["group_key"][0])
            dids.append(h["document"]["doc_id"])
            ncs.append(h["document"]["n_chars"])
    return pa.table(
        {"lang": pa.array(langs, pa.string()),
         "doc_id": pa.array(dids, pa.int64()),
         "n_chars": pa.array(ncs, pa.int64())}
    )


# ---------------------------------------------------------------------------
# training-data operators
# ---------------------------------------------------------------------------


def q_exact_dedup(sf_dir: str) -> pa.Table:
    from typesense_ray.functions.dedup import exact_dedup

    out = exact_dedup(_read(sf_dir, "documents", ["doc_id", "text"]),
                      text_col="text", id_col="doc_id")
    ids = sorted(r["doc_id"] for r in out.select_columns(["doc_id"]).take_all())
    return pa.table({"doc_id": pa.array(ids, pa.int64())})


def q_token_counts(sf_dir: str) -> pa.Table:
    from typesense_ray.functions.text import token_count_batch

    out = (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(lambda b: token_count_batch(b, "text"), batch_format="pyarrow")
        .select_columns(["doc_id", "ws_tokens"])
    )
    return pa.Table.from_pandas(out.to_pandas().sort_values(["doc_id"], ignore_index=True)).select(["doc_id", "ws_tokens"])


def q_quality(sf_dir: str) -> pa.Table:
    from typesense_ray.functions.text import quality_batch

    out = (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(lambda b: quality_batch(b, "text"), batch_format="pyarrow")
        .select_columns(["doc_id", "n_tokens", "digit_ratio", "punct_ratio"])
    )
    return pa.Table.from_pandas(out.to_pandas().sort_values(["doc_id"], ignore_index=True)).select(
        ["doc_id", "n_tokens", "digit_ratio", "punct_ratio"]
    )


def q_seq_packing(sf_dir: str) -> pa.Table:
    """Token-offset sequence packing (512-token packs) over the whole
    corpus via the two-level distributed prefix-sum in
    functions/packing.py."""
    import ray.data as rd

    from typesense_ray.functions.packing import pack_sequences

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = pack_sequences(ds, budget=512, group_rows=1024)
    t = pa.Table.from_pandas(out.to_pandas().sort_values(["doc_id"], ignore_index=True))
    return t.select(["doc_id", "n_tokens", "pack_id", "pack_off"]).cast(
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_tokens", pa.int64()),
                ("pack_id", pa.int64()),
                ("pack_off", pa.int64()),
            ]
        )
    )


def q_redact_pii(sf_dir: str) -> pa.Table:
    """PII scrub over the corpus with deterministic PII injected into
    every 10th doc (email + IPv4 derived from doc_id), so the redaction
    pass has real work whose output SQL can reproduce."""
    import ray.data as rd

    from typesense_ray.functions.text import redact_pii_batch

    def inject(t: pa.Table) -> pa.Table:
        import pandas as pd

        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = pd.Series(t["text"].to_pylist()).fillna("")
        suffix = pd.Series(
            " contact user" + pd.Series(ids).astype(str)
            + "@example.com at 10.0."
            + pd.Series(ids % 256).astype(str) + ".1"
        )
        new_text = s.where(ids % 10 != 0, s + suffix)
        return t.drop_columns(["text"]).append_column(
            "text", pa.array(new_text.tolist(), pa.string())
        )

    out = (
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"])
        .map_batches(inject, batch_format="pyarrow")
        .map_batches(lambda b: redact_pii_batch(b, "text"),
                     batch_format="pyarrow")
    )
    t = pa.Table.from_pandas(out.to_pandas().sort_values(["doc_id"], ignore_index=True))
    return pa.table(
        {
            "doc_id": t["doc_id"].cast(pa.int64()),
            "text": t["text"],
            "pii_hits": t["pii_hits"].cast(pa.int64()),
        }
    )


def q_tfidf_topk(sf_dir: str) -> pa.Table:
    """Top-3 TF-IDF terms per doc (tf · ln(N/df)) — two streaming
    passes with a broadcast vocab-df table (functions/text.py)."""
    import ray.data as rd

    from typesense_ray.functions.text import tfidf_topk

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = tfidf_topk(ds, k=3)
    df = out.to_pandas().sort_values(
        ["doc_id", "score", "term"], ascending=[True, False, True],
        ignore_index=True, kind="mergesort",
    )
    return pa.table(
        {
            "doc_id": pa.array(df["doc_id"], pa.int64()),
            "term": pa.array(df["term"], pa.string()),
            "score": pa.array(
                [_round_half_up(s, 6) for s in df["score"]], pa.float64()
            ),
        }
    )


def q_stratified_sample(sf_dir: str) -> pa.Table:
    """Deterministic 5-per-language sample by multiplicative id hash —
    rerun- and oracle-stable without any RNG state."""
    import ray.data as rd

    from typesense_ray.functions.sampling import stratified_sample

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    out = stratified_sample(ds, group_col="lang", k=5, id_col="doc_id")
    df = out.to_pandas().sort_values(["lang", "doc_id"], ignore_index=True)
    return pa.table(
        {
            "lang": pa.array(df["lang"], pa.string()),
            "doc_id": pa.array(df["doc_id"], pa.int64()),
        }
    )


def _bench_texts_30(sf_dir: str) -> list[str]:
    """Texts of the 30 smallest doc_ids, robust to file row order: scan
    ONLY the doc_id column (row-group statistics pruning applies), find
    the 30th-smallest id, then read text with the `doc_id <= threshold`
    predicate pushed into the parquet scan — never the whole text
    column on the driver."""
    import pyarrow.dataset as pds
    import pyarrow.parquet as pq

    bt = _head_by_id(
        f"{sf_dir}/documents.parquet", "doc_id", 30, ["doc_id", "text"]
    )
    return bt["text"].to_pylist()


def q_decontaminate(sf_dir: str) -> pa.Table:
    """Benchmark decontamination: the first-30-docs-by-id stand in for
    the (inherently small, external) eval set; their distinct word
    8-grams are broadcast and every corpus doc with an overlapping
    8-gram occurrence is flagged with its hit count."""
    import ray.data as rd

    from typesense_ray.functions.decontam import (
        benchmark_ngram_set,
        flag_contaminated,
    )

    # Benchmark side: tiny by nature (real use: its own file).
    bench = benchmark_ngram_set(_bench_texts_30(sf_dir), n=8)

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = flag_contaminated(ds, bench, n=8)
    t = pa.Table.from_pandas(out.to_pandas().sort_values(["doc_id"], ignore_index=True))
    return pa.table(
        {
            "doc_id": t["doc_id"].cast(pa.int64()),
            "ngram_hits": t["ngram_hits"].cast(pa.int64()),
        }
    )


def q_rep_filter(sf_dir: str) -> pa.Table:
    """Gopher-style repetition filter: per-doc top-unigram share and
    duplicate-bigram fraction with the standard keep thresholds
    (vectorized map_batches stage, functions/text.py)."""
    import ray.data as rd

    from typesense_ray.functions.text import repetition_stats_batch

    out = (
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"])
        .map_batches(lambda b: repetition_stats_batch(b, "text"),
                     batch_format="pyarrow")
        .select_columns(
            ["doc_id", "top_unigram_frac", "dup_2gram_frac", "keep_rep"]
        )
    )
    t = pa.Table.from_pandas(out.to_pandas().sort_values(["doc_id"], ignore_index=True))
    return pa.table(
        {
            "doc_id": t["doc_id"].cast(pa.int64()),
            "top_unigram_frac": pa.array(
                [_round_half_up(v, 6)
                 for v in t["top_unigram_frac"].to_pylist()],
                pa.float64(),
            ),
            "dup_2gram_frac": pa.array(
                [_round_half_up(v, 6)
                 for v in t["dup_2gram_frac"].to_pylist()],
                pa.float64(),
            ),
            "keep_rep": t["keep_rep"].cast(pa.int64()),
        }
    )


def q_chunk_docs(sf_dir: str) -> pa.Table:
    """Overlapping 64-token / stride-48 context chunking over the
    corpus (functions/text.py chunk_docs_batch)."""
    import ray.data as rd

    from typesense_ray.functions.text import chunk_docs_batch

    out = (
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"])
        .map_batches(
            lambda b: chunk_docs_batch(b, window=64, stride=48),
            batch_format="pyarrow",
        )
    )
    t = pa.Table.from_pandas(out.to_pandas().sort_values(["doc_id", "chunk_id"], ignore_index=True))
    return t.cast(
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("chunk_id", pa.int64()),
                ("n_chunk_tokens", pa.int64()),
                ("chunk_text", pa.string()),
            ]
        )
    )


def q_source_mix(sf_dir: str) -> pa.Table:
    """Deterministic weighted mixture sampling: source srcK keeps a
    (K+1)/20 fraction of its docs by hash threshold — the data-mixing
    pass (functions/sampling.py rate_sample)."""
    import ray.data as rd

    from typesense_ray.functions.sampling import rate_sample

    rates = {f"src{k}": (k + 1) / 20 for k in range(20)}
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    out = rate_sample(ds, rates, group_col="source")
    t = pa.Table.from_pandas(out.to_pandas().sort_values(["doc_id"], ignore_index=True))
    return pa.table(
        {
            "doc_id": t["doc_id"].cast(pa.int64()),
            "source": t["source"],
        }
    )


def q_event_histogram(sf_dir: str) -> pa.Table:
    """20-bin per-event_type histogram of value over the global range
    (functions/relational.py grouped_histogram)."""
    import ray.data as rd

    from typesense_ray.functions.relational import grouped_histogram

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )
    folded, _lo, _hi = grouped_histogram(ds, "event_type", "value", 20)
    return pa.table(
        {
            "event_type": pa.array(folded["event_type"], pa.string()),
            "bin": pa.array(folded["bin"], pa.int64()),
            "c": pa.array(folded["c"], pa.int64()),
        }
    )


def q_knn_filtered(sf_dir: str) -> pa.Table:
    """Filtered vector search: cosine top-10 among label=3 vectors only,
    with the predicate pushed into the parquet scan (no post-hoc
    re-ranking pass over dropped rows)."""
    import pyarrow.dataset as pds
    import pyarrow.parquet as pq
    import ray.data as rd

    from typesense_ray.functions.similarity import knn_bruteforce

    qvec = _query_vec(sf_dir, 0)
    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", filter=(pds.field("label") == 3)
    )
    res = knn_bruteforce(emb, qvec, k=10, vec_col="embedding", id_col="vec_id")
    return pa.table(
        {
            "vec_id": res["vec_id"].cast(pa.int64()),
            "score": pa.array(
                [round(s, 5) for s in res["score"].to_pylist()], pa.float64()
            ),
        }
    )


def q_dup_spans(sf_dir: str) -> pa.Table:
    """Exact duplicate-substring flags (10-token spans occurring ≥2×
    corpus-wide) over the near-dup-injected corpus
    (functions/decontam.py dup_span_flags)."""
    from typesense_ray.functions.decontam import dup_span_flags

    out = dup_span_flags(_augmented_docs(sf_dir), n=10)
    t = pa.Table.from_pandas(out.to_pandas().sort_values(["doc_id"], ignore_index=True))
    return pa.table(
        {
            "doc_id": t["doc_id"].cast(pa.int64()),
            "dup_spans": t["dup_spans"].cast(pa.int64()),
        }
    )


def q_distinct_users(sf_dir: str) -> pa.Table:
    """Exact count(DISTINCT user_id) per event_type with one bucketed
    exchange (functions/relational.py grouped_distinct_count)."""
    import ray.data as rd

    from typesense_ray.functions.relational import grouped_distinct_count

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    out = grouped_distinct_count(ds, "event_type", "user_id")
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "users": pa.array(out["c"], pa.int64()),
        }
    )


def q_hll_users(sf_dir: str) -> pa.Table:
    """HyperLogLog register table over events.user_id (p=8, m=256
    registers): per-batch partial max -> one m-bounded groupby(bucket)
    Max exchange (functions/sketch.py). The registers ARE the sketch —
    integer-exact, so the DuckDB oracle recomputes them bit-for-bit;
    the float estimate (within ~1/sqrt(m) of exact distinct) is covered
    by pytest against the exact count."""
    import ray.data as rd

    from typesense_ray.functions.sketch import hll_register_rows

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    out = hll_register_rows(ds, "user_id", p=8).to_pandas()
    out = out.sort_values("bucket", ignore_index=True)
    return pa.table(
        {
            "bucket": pa.array(out["bucket"], pa.int64()),
            "max_rho": pa.array(out["max_rho"], pa.int64()),
        }
    )


def q_cms_terms(sf_dir: str) -> pa.Table:
    """Count-min sketch registers of term occurrence frequencies over
    documents.text (d=2 rows x m=4096 buckets, functions/sketch.py):
    per-batch partials -> one (d*m)-bounded groupby Sum exchange.
    Integer registers, so the DuckDB oracle recomputes them exactly;
    point-estimate bounds are pytest-checked against exact counts."""
    import ray.data as rd

    from typesense_ray.functions.sketch import cms_register_rows

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )
    out = cms_register_rows(ds, "text", d=2, m=4096).to_pandas()
    out = out.sort_values(["row", "bucket"], ignore_index=True)
    return pa.table(
        {
            "row": pa.array(out["row"], pa.int64()),
            "bucket": pa.array(out["bucket"], pa.int64()),
            "c": pa.array(out["c"], pa.int64()),
        }
    )


def q_bloom_decontaminate(sf_dir: str) -> pa.Table:
    """Bloom-filter benchmark decontamination (the fixed-size-broadcast
    scale path of `decontaminate`): the first-30-docs benchmark n-grams
    set two FNV-derived bits each in a 2^20-bit array; docs are flagged
    by occurrence count of n-grams whose both bits are set.
    Deterministic false positives are mirrored exactly by the oracle."""
    import ray.data as rd

    from typesense_ray.functions.decontam import (
        benchmark_ngram_set,
        bloom_flag_contaminated,
    )

    bench = benchmark_ngram_set(_bench_texts_30(sf_dir), n=8)

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = bloom_flag_contaminated(ds, bench, n=8)
    t = pa.Table.from_pandas(
        out.to_pandas().sort_values(["doc_id"], ignore_index=True)
    )
    return pa.table(
        {
            "doc_id": t["doc_id"].cast(pa.int64()),
            "bloom_hits": t["bloom_hits"].cast(pa.int64()),
        }
    )


def q_kmeans_clusters(sf_dir: str) -> pa.Table:
    """One deterministic Lloyd iteration over the embeddings table
    (seeds = 4 smallest vec_ids, recomputed means rounded to 6dp,
    re-assign) — functions/similarity.kmeans_assign. Broadcast centroid
    matrix + per-batch partial (sum, count) combiner rows; no shuffle."""
    import ray.data as rd

    from typesense_ray.functions.similarity import kmeans_assign

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return kmeans_assign(ds, k=4, vec_col="embedding", id_col="vec_id")


def q_props_stats(sf_dir: str) -> pa.Table:
    """Semi-structured parsing at scale: extract the integer `k` field
    from the events.props JSON-string column (one compiled-regex C scan
    per batch, functions/relational.json_int_field — never per-row
    json.loads), then per-event_type count/sum/min/max over it."""
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min, Sum

    from typesense_ray.functions.relational import json_int_field

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )
    out = (
        json_int_field(ds, col="props", key="k")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n"),
            Sum("k", alias_name="k_sum"),
            Min("k", alias_name="k_min"),
            Max("k", alias_name="k_max"),
        )
        .to_pandas()
        .sort_values("event_type", ignore_index=True)
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "k_sum": pa.array(out["k_sum"], pa.int64()),
            "k_min": pa.array(out["k_min"], pa.int64()),
            "k_max": pa.array(out["k_max"], pa.int64()),
        }
    )


def q_zscore_events(sf_dir: str) -> pa.Table:
    """Per-event_type z-score normalization of value (two-pass moment
    broadcast, functions/relational.zscore_normalize)."""
    import ray.data as rd

    from typesense_ray.functions.relational import zscore_normalize

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "value"],
    )
    out = zscore_normalize(ds)
    t = pa.Table.from_pandas(out.to_pandas().sort_values(["event_id"], ignore_index=True))
    return pa.table(
        {
            "event_id": t["event_id"].cast(pa.int64()),
            "event_type": t["event_type"],
            "z": pa.array(
                [_round_half_up(v, 4) if v >= 0 else -_round_half_up(-v, 4)
                 for v in t["z"].to_pylist()],
                pa.float64(),
            ),
        }
    )


def q_label_centroids(sf_dir: str) -> pa.Table:
    """Per-label embedding centroids (grouped mean pooling,
    functions/similarity.label_centroids), long form (label, dim,
    centroid)."""
    from typesense_ray.functions.similarity import label_centroids

    df = label_centroids(_read(sf_dir, "embeddings", ["label", "embedding"]))
    df = df.sort_values(["label", "dim"], ignore_index=True)
    return pa.table(
        {
            "label": pa.array(df["label"], pa.int64()),
            "dim": pa.array(df["dim"], pa.int64()),
            "centroid": pa.array(
                [_round_half_up(v, 6) if v >= 0 else -_round_half_up(-v, 6)
                 for v in df["centroid"]],
                pa.float64(),
            ),
        }
    )


def q_prepare_corpus(sf_dir: str) -> pa.Table:
    """Flagship composed prep chain (functions/pipeline.prepare_corpus):
    PII redaction → fused repetition+length filter → exact-dedup
    winners → overlapping 64/48 chunking, one streaming pipeline."""
    import ray.data as rd

    from typesense_ray.functions.pipeline import prepare_corpus

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = prepare_corpus(ds)
    t = pa.Table.from_pandas(out.to_pandas().sort_values(["doc_id", "chunk_id"], ignore_index=True))
    return t.cast(
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("chunk_id", pa.int64()),
                ("n_chunk_tokens", pa.int64()),
                ("chunk_text", pa.string()),
            ]
        )
    )


def q_value_quantiles(sf_dir: str) -> pa.Table:
    """Exact per-event_type p25/p50/p75/p95 of value by distributed
    rank selection (functions/relational.py grouped_quantiles) — no
    full sort, no whole-group materialization."""
    import ray.data as rd

    from typesense_ray.functions.relational import grouped_quantiles

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )
    out = grouped_quantiles(ds, "event_type", "value")
    df = out.to_pandas().sort_values(
        ["event_type", "p"], ignore_index=True
    )
    return pa.table(
        {
            "event_type": pa.array(df["event_type"], pa.string()),
            "p": pa.array(df["p"], pa.float64()),
            "value": pa.array(df["value"], pa.float64()),
        }
    )


def q_char_lm_score(sf_dir: str) -> pa.Table:
    """Char-bigram LM mean log-prob per doc, model trained on the
    corpus itself (functions/text.py char_lm_score)."""
    import ray.data as rd

    from typesense_ray.functions.text import char_lm_score

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = char_lm_score(ds)
    t = pa.Table.from_pandas(out.to_pandas().sort_values(["doc_id"], ignore_index=True))
    return pa.table(
        {
            "doc_id": t["doc_id"].cast(pa.int64()),
            "n_bigrams": t["n_bigrams"].cast(pa.int64()),
            "avg_logprob": pa.array(
                [_round_half_up(v, 6) if v >= 0 else -_round_half_up(-v, 6)
                 for v in t["avg_logprob"].to_pylist()],
                pa.float64(),
            ),
        }
    )


def q_global_shuffle(sf_dir: str) -> pa.Table:
    """Deterministic global shuffle: (shard, pos) per doc via grouped
    rank over the multiplicative id hash (functions/sampling.py
    shard_shuffle — two-level distributed prefix-sum, no RNG)."""
    import ray.data as rd

    from typesense_ray.functions.sampling import shard_shuffle

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    out = shard_shuffle(ds, n_shards=8)
    t = pa.Table.from_pandas(out.to_pandas().sort_values(["doc_id"], ignore_index=True))
    return t.select(["doc_id", "shard", "pos"]).cast(
        pa.schema(
            [("doc_id", pa.int64()), ("shard", pa.int64()),
             ("pos", pa.int64())]
        )
    )


def q_knn_cosine(sf_dir: str) -> pa.Table:
    import pyarrow.parquet as pq

    from typesense_ray.functions.similarity import knn_bruteforce

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qvec = _query_vec(sf_dir, 0)
    res = knn_bruteforce(emb, qvec, k=10, vec_col="embedding", id_col="vec_id")
    return pa.table(
        {
            "vec_id": res["vec_id"].cast(pa.int64()),
            "score": pa.array(
                [round(s, 5) for s in res["score"].to_pylist()], pa.float64()
            ),
        }
    )


def _augmented_docs(sf_dir: str):
    """documents ∪ perturbed copies of the 20 smallest-doc_id docs
    (doc_id+10^6) — a deterministic near-dup injection so dedup ops have
    work to do. The corpus never touches the driver: the parquet is read
    distributed, union'd with the 20-row mutated head, MATERIALIZED into
    the object store once per sf_dir and shared by every dedup query
    (multi-pass consumers would otherwise re-execute the read per pass;
    object-store blocks spill under pressure, unlike a driver table).
    Only the 20-row head is read on the driver — distributed min-k over
    the doc_id column + a pushed-down threshold read (robust to file row
    order, matching the oracle's ORDER BY doc_id LIMIT 20)."""
    import ray.data as rd

    dk = f"augds:{sf_dir}"
    if dk in _CACHE:
        return _CACHE[dk]
    ck = f"aughead:{sf_dir}"
    mutated = _CACHE.get(ck)
    if mutated is None:
        head = _head_by_id(
            f"{sf_dir}/documents.parquet", "doc_id", 20, ["doc_id", "text"]
        )
        mut_texts = []
        for t in head["text"].to_pylist():
            words = (t or "").split(" ")
            if len(words) > 3:
                words[len(words) // 2] = "mutatedword"
            mut_texts.append(" ".join(words))
        mutated = pa.table(
            {
                "doc_id": pa.array(
                    [d + 1_000_000 for d in head["doc_id"].to_pylist()],
                    pa.int64(),
                ),
                "text": pa.array(mut_texts, pa.string()),
            }
        )
        _CACHE[ck] = mutated
    base = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    ds = base.union(rd.from_arrow(mutated))
    # a single-file corpus parquet yields only row-group-many blocks
    # (4 at 400k rows), which caps every downstream map_batches at
    # 4-way parallelism; spread once here — the materialized result is
    # shared by every dedup query for this sf_dir. Block count is
    # row-aware (footer metadata only, no data read): ≥5k rows per
    # block, else the per-task overhead of 64 near-empty blocks DOUBLES
    # small-scale op times, capped at 2×CPUs for the big corpora
    import ray as _ray
    import pyarrow.parquet as pq

    n_rows = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    n_cpu = int(_ray.cluster_resources().get("CPU", 8))
    n_blocks = max(8, min(2 * n_cpu, n_rows // 5_000))
    ds = ds.repartition(n_blocks).materialize()
    _CACHE[dk] = ds
    return ds


def q_minhash_dup_pairs(sf_dir: str) -> pa.Table:
    from typesense_ray.functions.dedup import minhash_lsh_pairs

    # 32 bands x 4 rows (num_perm=128): candidate recall at the J=0.7
    # verify threshold is 1-(1-0.7^4)^32 ~= 0.9998 per pair, so the
    # LSH+verify output equals the exact all-pairs char-5-gram oracle on
    # this corpus (the driver checks exactly that); junk candidates cost
    # only verify work, never precision
    pairs = minhash_lsh_pairs(
        _augmented_docs(sf_dir), text_col="text", id_col="doc_id",
        threshold=0.7, num_perm=128, bands=32,
    )
    return pa.table(
        {
            "a": pairs["a"],
            "b": pairs["b"],
            "jaccard": pa.array(
                [_round_half_up(j, 4) for j in pairs["jaccard"].to_pylist()],
                pa.float64(),
            ),
        }
    )


def q_near_dedup(sf_dir: str) -> pa.Table:
    """Composed near-dup corpus cleaning — the full fuzzy-dedup pipeline
    a pre-training run needs: exact word-3-gram Jaccard pairs (>= 0.6)
    over the augmented corpus -> transitive duplicate clusters
    (connected components, min-label) -> DROP every cluster member
    except the minimum id, via a broadcast loser-set filter (the big
    side streams; only cluster members move)."""
    import ray
    import ray.data as rd

    from typesense_ray.functions.dedup import word_ngram_jaccard_pairs
    from typesense_ray.functions.graph import connected_components

    ds = _augmented_docs(sf_dir)
    pairs = word_ngram_jaccard_pairs(
        ds, text_col="text", id_col="doc_id", n=3, threshold=0.6, df_cap=64
    )
    cc = connected_components(
        rd.from_arrow(pairs), a_col="a", b_col="b"
    ).to_pandas()
    losers = cc.loc[cc["node"] != cc["cluster"], "node"].to_numpy(np.int64)
    ref = ray.put(pa.array(losers, pa.int64()))

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        drop = pc.is_in(batch["doc_id"], value_set=ray.get(ref))
        return batch.filter(pc.invert(drop)).select(["doc_id"])

    out = ds.map_batches(keep, batch_format="pyarrow").to_pandas()
    out = out.sort_values("doc_id", ignore_index=True)
    return pa.table({"doc_id": pa.array(out["doc_id"], pa.int64())})


def q_clean_corpus(sf_dir: str) -> pa.Table:
    """Composed cleaning pipeline: exact-dedup winners → fused
    langid + token-count actor-pool pass → keep en docs with ≥10
    tokens (functions/pipeline.py)."""
    import ray.data as rd

    from typesense_ray.functions.pipeline import clean_corpus

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = clean_corpus(ds, keep_langs=("en",), min_tokens=10)
    df = out.select_columns(["doc_id", "lang_pred", "n_tokens"]).to_pandas()
    if len(df) == 0:
        # a Dataset with zero surviving rows loses its schema in
        # to_pandas(); a corpus where nothing passes the language
        # filter is a legitimate outcome, not an error
        return pa.table({
            "doc_id": pa.array([], pa.int64()),
            "lang_pred": pa.array([], pa.string()),
            "n_tokens": pa.array([], pa.int64()),
        })
    df = df.sort_values("doc_id", ignore_index=True)
    return pa.table(
        {
            "doc_id": pa.array(df["doc_id"], pa.int64()),
            "lang_pred": pa.array(df["lang_pred"], pa.string()),
            "n_tokens": pa.array(df["n_tokens"], pa.int64()),
        }
    )


def q_dup_clusters(sf_dir: str) -> pa.Table:
    """Near-dup pairs → transitive duplicate CLUSTERS (connected
    components by min-label propagation, functions/graph.py), the step
    that turns pairwise dedup output into keep/drop decisions."""
    import ray.data as rd

    from typesense_ray.functions.dedup import word_ngram_jaccard_pairs
    from typesense_ray.functions.graph import connected_components

    pairs = word_ngram_jaccard_pairs(
        _augmented_docs(sf_dir), text_col="text", id_col="doc_id",
        n=3, threshold=0.6, df_cap=64,
    )
    out = connected_components(rd.from_arrow(pairs), a_col="a", b_col="b")
    return out.sort_by([("node", "ascending")]).select(["node", "cluster"])


def q_phrase_search(sf_dir: str) -> pa.Table:
    """Positional phrase match: all docs containing 'merge group' as
    strictly consecutive tokens (conjunctive match alone is ~4x larger)."""
    coll = _docs_index(sf_dir)
    return coll.phrase_ids("merge group")


def q_ngram_jaccard_pairs(sf_dir: str) -> pa.Table:
    """Exact word-trigram Jaccard near-dup pairs over the augmented docs."""
    from typesense_ray.functions.dedup import word_ngram_jaccard_pairs

    pairs = word_ngram_jaccard_pairs(
        _augmented_docs(sf_dir), text_col="text", id_col="doc_id",
        n=3, threshold=0.6, df_cap=64,
    )
    return pa.table(
        {
            "a": pairs["a"],
            "b": pairs["b"],
            "jaccard": pa.array(
                [_round_half_up(j, 4) for j in pairs["jaccard"].to_pylist()],
                pa.float64(),
            ),
        }
    )


def q_simhash_groups(sf_dir: str) -> pa.Table:
    from typesense_ray.functions.dedup import simhash_groups

    out = simhash_groups(_augmented_docs(sf_dir), text_col="text", id_col="doc_id")
    rows = sorted(
        (r["doc_id"], int(r["simhash"]), r["group_size"]) for r in out.take_all()
    )
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "simhash": pa.array([r[1] for r in rows], pa.uint64()),
            "group_size": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def q_langid(sf_dir: str) -> pa.Table:
    from typesense_ray.functions.text import LangId

    out = (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(LangId, batch_format="pyarrow", concurrency=(2, 8))
        .select_columns(["doc_id", "lang_pred", "lang_conf"])
    )
    return pa.Table.from_pandas(out.to_pandas().sort_values(["doc_id"], ignore_index=True)).select(
        ["doc_id", "lang_pred", "lang_conf"]
    )


def q_fingerprints(sf_dir: str) -> pa.Table:
    from typesense_ray.functions.text import fingerprint_batch

    out = (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(lambda b: fingerprint_batch(b, "text"), batch_format="pyarrow")
        .select_columns(["doc_id", "fingerprint"])
    )
    return pa.Table.from_pandas(out.to_pandas().sort_values(["doc_id"], ignore_index=True)).select(["doc_id", "fingerprint"])


def q_typo_search(sf_dir: str) -> pa.Table:
    """Typo-tolerant search (deletion-neighborhood + OSA verify): a typo'd
    query recovers the clean query's full match set (uncapped id view, so
    the DuckDB oracle can mirror it with damerau_levenshtein)."""
    from typesense_ray.typo import build_typo_table

    coll = _docs_index(sf_dir)
    if not _CACHE.get(f"typo:{sf_dir}"):
        build_typo_table(coll._local.index_dir)
        coll._typo_resolver = None
        _CACHE[f"typo:{sf_dir}"] = True
    return coll.matching_ids("strean jion", num_typos=2)


def q_multifield_ids(sf_dir: str) -> pa.Table:
    """Cross-field match set: a doc hits when SOME query_by field contains
    every query token (text tokens vs the source keyword field)."""
    _multifield_coll(sf_dir)  # ensure the two-field index exists
    return _CACHE[f"mf:{sf_dir}"].matching_ids(
        "src8", query_by=["text", "source"]
    )


def q_prefix_search(sf_dir: str) -> pa.Table:
    """Prefix expansion with an uncapped result set: expand 'wind' to its
    vocabulary completions, union the matching ids per completion."""
    coll = _docs_index(sf_dir)
    ids: set[int] = set()
    # uncapped completion list: the id-set oracle (term LIKE 'wind%') has
    # no top-N cap, so neither does this view (the top-k search path keeps
    # the reference's 10-completion cap)
    for term in coll.typo_resolver.prefix("wind", max_candidates=1 << 30):
        ids.update(coll.matching_ids(term)["doc_id"].to_pylist())
    return pa.table({"doc_id": pa.array(sorted(ids), pa.int64())})


def q_reference_rank(sf_dir: str) -> pa.Table:
    """Reference-semantics ranking (packed proximity match score +
    n_chars desc + doc_id desc) — the conformance scorer exercised on the
    documents table (oracle: the pure-python engine, checked in tests)."""
    coll = _docs_index(sf_dir)
    r = coll.search("data stream", mode="reference", per_page=20, highlight=False)
    return pa.table(
        {
            "doc_id": pa.array(
                [h["document"]["doc_id"] for h in r["hits"]], pa.int64()
            ),
            "text_match": pa.array([h["text_match"] for h in r["hits"]], pa.int64()),
        }
    )


def q_embedding_dup_pairs(sf_dir: str) -> pa.Table:
    """Embedding-cosine near-dup over embeddings ∪ two injected
    near-copies (deterministic)."""
    import ray.data as rd
    import pyarrow.parquet as pq

    from typesense_ray.functions.dedup import embedding_dup_pairs

    # only the two injected-source rows leave storage (predicate pushed,
    # mirrors the oracle's WHERE vec_id < 2)
    import pyarrow.dataset as pds

    base = (
        pds.dataset(f"{sf_dir}/embeddings.parquet")
        .to_table(columns=["vec_id", "embedding"],
                  filter=pds.field("vec_id") < 2)
        .sort_by("vec_id")
    )
    emb0 = np.array(base["embedding"].to_pylist()[:2], dtype=np.float32)
    inject = pa.table(
        {
            "vec_id": pa.array([10_000_000, 10_000_001], pa.int64()),
            "embedding": pa.array(
                [(v + 0.001).tolist() for v in emb0],
                pa.list_(pa.float32()),
            ),
        }
    )
    ds = rd.from_arrow(pa.concat_tables([
        base.cast(inject.schema), inject
    ])).repartition(8)
    pairs = embedding_dup_pairs(ds, threshold=0.99)
    rows = sorted(
        (r["a"], r["b"], round(r["cosine"], 4)) for r in pairs.take_all()
    )
    return pa.table(
        {"a": pa.array([r[0] for r in rows], pa.int64()),
         "b": pa.array([r[1] for r in rows], pa.int64()),
         "cosine": pa.array([r[2] for r in rows], pa.float64())}
    )


def q_ann_ivf(sf_dir: str) -> pa.Table:
    """IVF ANN correctness gate: build the centroid-partitioned layout and
    probe ALL 8 lists — full-probe IVF must be EXACTLY the brute-force
    top-10 (assignment, per-list scan and merge verified against the SQL
    oracle). The approximate regime (nprobe < n_centroids) is covered by
    the recall pytest (tests/test_functions.py::test_ivf_recall)."""
    import pyarrow.parquet as pq

    from typesense_ray.functions.similarity import IVFIndex

    key = f"ivf:{sf_dir}"
    idx = _CACHE.get(key)
    if idx is None:
        emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        idx = IVFIndex(n_centroids=8, n_iter=4).fit(emb)
        _CACHE[key] = idx  # built once per sf_dir, like _docs_index
    qvec = _query_vec(sf_dir, 0)
    best = idx.search(qvec, k=10, nprobe=idx.n_centroids)
    return pa.table(
        {"vec_id": pa.array([i for _, i in best], pa.int64()),
         "score": pa.array([round(s, 5) for s, _ in best], pa.float64())}
    )


def _multifield_coll(sf_dir: str):
    """Collection over documents with ``source`` as a secondary indexed
    field (built once per sf_dir)."""
    from typesense_ray.collection import RayCollection
    from typesense_ray.index_build import IndexConfig, build_index

    key = f"mf:{sf_dir}"
    coll = _CACHE.get(key)
    if coll is None:
        tag = hashlib.blake2b(sf_dir.encode(), digest_size=6).hexdigest()
        out = f"/tmp/tsray_cache/mfidx-{tag}"
        cfg = IndexConfig(
            text_field="text", id_field="doc_id", sha_field=None,
            batch_docs=4096,
            meta_fields=("doc_id", "text", "lang", "source", "n_chars"),
            indexed_fields=("source",),
        )
        build_index(f"{sf_dir}/documents.parquet", out, cfg)
        coll = _CACHE[key] = RayCollection(out, default_sorting_field="n_chars")
    return coll


def q_multifield_search(sf_dir: str) -> pa.Table:
    """query_by over two fields (text + source) with weights — built on a
    dedicated small index with source as a secondary indexed field.
    Reference per-field token-erase semantics (src/index.cpp:1722-1731):
    the source field doesn't know 'data' (its query reduces to ['src8'],
    every src8-source doc matches) and the text field doesn't know
    'src8' (its query reduces to ['data']); result = union. Multi-field
    queries cap their fetch window at ``max_hits`` (reference parity,
    src/collection.cpp:746-751), so the query raises max_hits above the
    corpus size and paginates — at sf0.1 the filtered union is 581 docs,
    past the 250-hit default window."""
    coll = _multifield_coll(sf_dir)
    ids: list[int] = []
    page = 1
    while True:
        r = coll.search(
            "src8 data", query_by=["text", "source"],
            query_by_weights=[1, 2], filter_by="lang:= fr",
            per_page=250, page=page, highlight=False,
            drop_tokens_threshold=1, max_hits=1 << 30,
        )
        ids += [h["document"]["doc_id"] for h in r["hits"]]
        if len(ids) >= r["found"] or not r["hits"]:
            break
        page += 1
    return pa.table({"doc_id": pa.array(sorted(ids), pa.int64())})


def q_multimodal_decode(sf_dir: str) -> pa.Table:
    """Multimodal plumbing: binary payload column (the first 64 documents'
    utf-8 bytes) through the ImageDecode actor pool (small batches, decode
    state per actor, payload dropped after decode). The deterministic fake
    kernel derives dims from the payload length, so the DuckDB oracle can
    recompute them from strlen(text)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from typesense_ray.functions.multimodal import ImageDecode

    base = _head_by_id(
        f"{sf_dir}/documents.parquet", "doc_id", 64, ["doc_id", "text"]
    )
    n = base.num_rows
    media = pa.table(
        {
            "media_id": base["doc_id"],
            "kind": pa.array(["image"] * n),
            "payload": pa.array(
                [t.encode("utf-8") for t in base["text"].to_pylist()],
                pa.large_binary(),
            ),
            "mime": pa.array(["image/fake"] * n),
            "meta_json": pa.array(["{}"] * n),
        }
    )
    out = (
        rd.from_arrow(media)
        .map_batches(
            ImageDecode(), batch_format="pyarrow", batch_size=8, concurrency=2,
        )
        .select_columns(["media_id", "height", "width", "channels"])
    )
    return pa.Table.from_pandas(out.to_pandas().sort_values(["media_id"], ignore_index=True))


def q_image_decode_real(sf_dir: str) -> pa.Table:
    """REAL image pipeline, oracle-checkable: per doc_id, encode an
    actual 24-bit BMP whose dims derive from doc_id (content = a
    deterministic gradient), push the payloads through the real BMP
    decoder actor pool, and emit the measured (height, width,
    channels). DuckDB recomputes the expected dims in closed form —
    the hash compare proves the BMP bytes (stride padding, BGR,
    bottom-up rows) round-trip through a genuine decoder at corpus
    scale, not a length-derived fake."""
    import ray.data as rd

    from typesense_ray.functions.multimodal import ImageDecode, encode_bmp

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        payloads = []
        for did in ids:
            h = 8 + int(did) % 32
            w = 8 + (int(did) * 7) % 32
            # cheap deterministic content: a row-index gradient
            img = np.broadcast_to(
                (np.arange(h, dtype=np.uint8) * 5)[:, None, None], (h, w, 3)
            )
            payloads.append(encode_bmp(np.ascontiguousarray(img)))
        n = len(ids)
        return pa.table(
            {
                "media_id": pa.array(ids.astype(np.int64), pa.int64()),
                "kind": pa.array(["image"] * n),
                "payload": pa.array(payloads, pa.large_binary()),
                "mime": pa.array(["image/bmp"] * n),
                "meta_json": pa.array(["{}"] * n),
            }
        )

    out = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        .map_batches(synth, batch_format="pyarrow", batch_size=512)
        .map_batches(
            ImageDecode(backend="real"),
            batch_format="pyarrow", batch_size=256, concurrency=4,
        )
        .select_columns(["media_id", "height", "width", "channels"])
    )
    return pa.Table.from_pandas(
        out.to_pandas().sort_values(["media_id"], ignore_index=True)
    )


def q_audio_features(sf_dir: str) -> pa.Table:
    """REAL audio pipeline, oracle-checkable end-to-end: per doc_id,
    synthesize a deterministic on-FFT-bin sine WAV (SynthToneWav), run
    the real AudioFeatures actor pool (stdlib wave decode + numpy-FFT
    spectral peak), and emit the measured features. Because every tone
    sits exactly on a bin, dominant_hz equals the synthesized frequency
    bit-for-bit and DuckDB recomputes the whole expected table in
    closed form from doc_id — a hash-matched oracle over a genuine
    DSP pipeline (decode state per actor; payloads never leave the
    stage)."""
    import ray.data as rd

    from typesense_ray.functions.multimodal import AudioFeatures, SynthToneWav

    out = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        .map_batches(SynthToneWav(), batch_format="pyarrow", batch_size=512)
        .map_batches(
            AudioFeatures(backend="real"),
            batch_format="pyarrow", batch_size=256, concurrency=4,
        )
        .select_columns(
            ["media_id", "sample_rate", "n_samples", "duration_s",
             "dominant_hz"]
        )
    )
    return pa.Table.from_pandas(
        out.to_pandas().sort_values(["media_id"], ignore_index=True)
    )


# ---------------------------------------------------------------------------
# relational aggregates over the TPC-H-ish tables (facet-stats machinery)
# ---------------------------------------------------------------------------


def q_tpch_q5ish(sf_dir: str) -> pa.Table:
    """Revenue per nation: TWO distributed shuffle hash joins
    (orders ⋈ customer on custkey, then lineitem ⋈ that on orderkey,
    functions/relational.hash_join), a broadcast nation-name lookup
    (25 rows — never shuffled), and per-batch revenue combiners so the
    final exchange moves ≤|nations| rows per block."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from typesense_ray.agg import combiner_aggregate
    from typesense_ray.functions.relational import hash_join

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    # size-aware plan (what a cost-based engine does): the customer side
    # and the orders⋈customer product are both ≤ the broadcast threshold
    # at bench scale → map-side broadcast probes, NO exchange; past the
    # threshold (real TPC-H scale) the same call degrades gracefully to
    # the bucket-co-partitioned shuffle join.
    bcast = 300_000
    j1 = hash_join(
        orders, cust, left_on="o_custkey", right_on="c_custkey",
        left_cols=("o_orderkey",), right_cols={"c_nationkey": "nationkey"},
        broadcast_threshold=bcast,
    ).materialize()
    # partial-aggregate pushdown: revenue per orderkey BEFORE the join —
    # the second exchange then moves ~orders-many partials instead of the
    # 4×-larger raw lineitem rows (sum-before-inner-join is sound here:
    # o_orderkey is unique on the right, so each partial matches ≤ once)
    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def rev_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(rev=df["l_extendedprice"] * (1.0 - df["l_discount"]))
        return df.groupby("l_orderkey", as_index=False).agg(
            revenue=("rev", "sum")
        )

    line_rev = line.map_batches(rev_partial, batch_format="pandas")
    j2 = hash_join(
        line_rev, j1, left_on="l_orderkey", right_on="o_orderkey",
        left_cols=("revenue",),
        right_cols={"nationkey": "nationkey"},
        broadcast_threshold=bcast,
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("nationkey", as_index=False).agg(
            revenue=("revenue", "sum")
        )

    out = combiner_aggregate(j2, partial, ["nationkey"], {"revenue": "sum"})
    names = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    out = out.merge(
        names, left_on="nationkey", right_on="n_nationkey", how="inner"
    )
    out["revenue"] = [_round_half_up(v, 2) for v in out["revenue"]]
    out = out.sort_values(
        ["revenue", "n_name"], ascending=[False, True], ignore_index=True
    )
    return pa.table(
        {
            "n_name": pa.array(out["n_name"], pa.string()),
            "revenue": pa.array(out["revenue"], pa.float64()),
        }
    )


def q_tpch_q1ish(sf_dir: str) -> pa.Table:
    """Pricing-summary aggregate with per-batch combiners: each batch
    pre-aggregates to ≤|groups| rows inside map_batches, so the shuffle
    moves partials, not the 600k-row table."""
    import pandas as pd
    import ray.data as rd

    from typesense_ray.agg import combiner_aggregate

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(disc_price=df["l_extendedprice"] * (1.0 - df["l_discount"]))
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_disc_price=("disc_price", "sum"),
            count_order=("l_quantity", "size"),
        )
        return g

    out = combiner_aggregate(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=[
                "l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount",
            ],
        ),
        partial, ["l_returnflag", "l_linestatus"],
        {"sum_qty": "sum", "sum_disc_price": "sum", "count_order": "sum"},
    )
    tbl = pa.Table.from_pandas(out.reset_index(drop=True))
    avg = [
        s / c
        for s, c in zip(tbl["sum_qty"].to_pylist(), tbl["count_order"].to_pylist())
    ]
    tbl = tbl.append_column("avg_qty", pa.array(avg, pa.float64()))
    return pa.table(
        {
            "l_returnflag": tbl["l_returnflag"],
            "l_linestatus": tbl["l_linestatus"],
            "sum_qty": pa.array(
                [round(float(x), 2) for x in tbl["sum_qty"].to_pylist()], pa.float64()
            ),
            "sum_disc_price": pa.array(
                [round(float(x), 2) for x in tbl["sum_disc_price"].to_pylist()],
                pa.float64(),
            ),
            "avg_qty": pa.array(
                [round(float(x), 6) for x in tbl["avg_qty"].to_pylist()], pa.float64()
            ),
            "count_order": tbl["count_order"].cast(pa.int64()),
        }
    )


def q_join_priority(sf_dir: str) -> pa.Table:
    """Broadcast hash join, the 100 TB join shape for a small build side:
    filtered customer keys are ray.put once, probed vectorized inside
    map_batches over orders (no shuffle of the big side; c_custkey is
    unique so the semi-join IS the inner join), then a combiner
    aggregate."""
    import pandas as pd
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from typesense_ray.agg import combiner_aggregate
    from typesense_ray.functions.relational import broadcast_semi_join

    # broadcast-side key build with the segment predicate pushed into the
    # scan — only matching row groups decode, and only c_custkey rides out
    import pyarrow.dataset as pds

    keys = (
        pds.dataset(f"{sf_dir}/customer.parquet")
        .to_table(columns=["c_custkey"],
                  filter=pds.field("c_mktsegment") == "BUILDING")
    )["c_custkey"].to_numpy()
    joined = broadcast_semi_join(
        _read(sf_dir, "orders",
              ["o_custkey", "o_orderkey", "o_orderpriority", "o_totalprice"]),
        keys, "o_custkey")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_orderpriority", as_index=False).agg(
            n_orders=("o_orderkey", "size"), sum_total=("o_totalprice", "sum")
        )

    out = combiner_aggregate(
        joined, partial, ["o_orderpriority"],
        {"n_orders": "sum", "sum_total": "sum"},
    )
    tbl = pa.Table.from_pandas(out.reset_index(drop=True))
    return pa.table(
        {
            "o_orderpriority": tbl["o_orderpriority"],
            "n_orders": tbl["n_orders"].cast(pa.int64()),
            "sum_total": pa.array(
                [round(float(x), 2) for x in tbl["sum_total"].to_pylist()],
                pa.float64(),
            ),
        }
    )


def q_sessionize(sf_dir: str) -> pa.Table:
    """Gap-based sessionization (30 min) per user over events — one
    groupby(user_id) exchange, vectorized per-group session splitting."""
    import pandas as pd

    from typesense_ray.functions.relational import sessionize

    out = sessionize(
        _read(sf_dir, "events", ["user_id", "ts", "value"]),
        key_col="user_id", ts_col="ts", gap_s=1800.0
    ).to_pandas()
    out = out.sort_values(["user_id", "session_idx"]).reset_index(drop=True)
    return pa.table(
        {
            "user_id": pa.array(out["user_id"], pa.int64()),
            "session_idx": pa.array(out["session_idx"], pa.int64()),
            "n_events": pa.array(out["n_events"], pa.int64()),
            "start_ts": pa.array(
                pd.to_datetime(out["start_ts"]).dt.strftime("%Y-%m-%d %H:%M:%S.%f"),
                pa.string(),
            ),
            "end_ts": pa.array(
                pd.to_datetime(out["end_ts"]).dt.strftime("%Y-%m-%d %H:%M:%S.%f"),
                pa.string(),
            ),
            "sum_value": pa.array(
                [round(float(x), 6) for x in out["sum_value"]], pa.float64()
            ),
        }
    )


def q_asof_join(sf_dir: str) -> pa.Table:
    """Point-in-time attribution join: every click gets the latest
    prior-or-equal view by the same user (functions/relational.py
    asof_join — DuckDB ASOF LEFT JOIN semantics)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from typesense_ray.functions.relational import asof_join

    import pyarrow.dataset as pds

    cols = ["event_id", "ts", "user_id", "value"]
    clicks = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=cols,
        filter=(pds.field("event_type") == "click"),
    )
    views = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=cols,
        filter=(pds.field("event_type") == "view"),
    )
    out = asof_join(
        clicks, views, key_col="user_id", ts_col="ts",
        left_cols=("event_id",),
        right_cols={"event_id": "view_event_id", "value": "view_value"},
    )
    t = pa.Table.from_pandas(
        out.to_pandas().sort_values("event_id", ignore_index=True)
    )
    return pa.table(
        {
            "event_id": t["event_id"].cast(pa.int64()),
            "user_id": t["user_id"].cast(pa.int64()),
            "view_event_id": t["view_event_id"].cast(pa.int64()),
            "view_value": pc.round(t["view_value"].cast(pa.float64()), 6),
        }
    )


def q_events_hopping(sf_dir: str) -> pa.Table:
    """Hopping windows (1 h size, 30 min hop): each event contributes to
    exactly two windows — the window fan-out happens inside the combiner
    partial (vectorized, two grid points per event), so the merge still
    moves ≤ |windows × types| partial rows."""
    import numpy as np
    import pandas as pd

    from typesense_ray.agg import combiner_aggregate

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        epoch_s = df["ts"].values.astype("datetime64[s]").astype(np.int64)
        w0 = (epoch_s // 1800) * 1800
        frames = [
            pd.DataFrame(
                {"wstart": w0 - off, "event_type": df["event_type"],
                 "value": df["value"]}
            )
            for off in (0, 1800)
        ]
        allf = pd.concat(frames, ignore_index=True)
        return allf.groupby(["wstart", "event_type"], as_index=False).agg(
            sum_value=("value", "sum"), cnt=("value", "size")
        )

    out = combiner_aggregate(
        _read(sf_dir, "events", ["ts", "event_type", "value"]),
        partial, ["wstart", "event_type"],
        {"sum_value": "sum", "cnt": "sum"},
    )
    return pa.table(
        {
            "window": pa.array(
                pd.to_datetime(out["wstart"], unit="s").dt.strftime(
                    "%Y-%m-%d %H:%M:%S"
                ),
                pa.string(),
            ),
            "event_type": pa.array(out["event_type"], pa.string()),
            "sum_value": pa.array(
                [round(float(x), 6) for x in out["sum_value"]], pa.float64()
            ),
            "cnt": pa.array(out["cnt"], pa.int64()),
        }
    )


def q_events_tumbling(sf_dir: str) -> pa.Table:
    """Tumbling 1-hour windows per event_type (count + sum(value)) —
    the streaming-shaped aggregate expressed as groupby over an
    event-time window key."""
    import pandas as pd

    def window_partials(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            window=df["ts"].dt.floor("h").dt.strftime("%Y-%m-%d %H:00:00")
        )
        return df.groupby(["window", "event_type"], as_index=False).agg(
            sum_value=("value", "sum"), cnt=("value", "size")
        )

    from typesense_ray.agg import combiner_aggregate

    out = combiner_aggregate(
        _read(sf_dir, "events", ["ts", "event_type", "value"]),
        window_partials, ["window", "event_type"],
        {"sum_value": "sum", "cnt": "sum"},
    )
    tbl = pa.Table.from_pandas(out.reset_index(drop=True))
    return pa.table(
        {
            "window": tbl["window"],
            "event_type": tbl["event_type"],
            "sum_value": pa.array(
                [round(float(x), 6) for x in tbl["sum_value"].to_pylist()],
                pa.float64(),
            ),
            "cnt": tbl["cnt"].cast(pa.int64()),
        }
    )


def q_user_deltas(sf_dir: str) -> pa.Table:
    """Per-user lag features (inter-arrival seconds + value delta) —
    functions/relational.windowed_lag: one groupby(user) exchange,
    vectorized diff per group; first-event rows (no predecessor)
    dropped."""
    from typesense_ray.functions.relational import windowed_lag

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    out = windowed_lag(ds)
    t = pa.Table.from_pandas(out.to_pandas().sort_values(["event_id"], ignore_index=True))
    return pa.table(
        {
            "event_id": t["event_id"].cast(pa.int64()),
            "user_id": t["user_id"].cast(pa.int64()),
            "dt_s": t["dt_s"].cast(pa.float64()),
            "dv": t["dv"].cast(pa.float64()),
        }
    )


def q_rolling_events(sf_dir: str) -> pa.Table:
    """Per-user rolling mean of value over the trailing 4 rows —
    functions/relational.rolling_mean (in-frame-order windowed sum so
    floats match SQL's windowed AVG)."""
    from typesense_ray.functions.relational import rolling_mean

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    out = rolling_mean(ds, window=4)
    t = pa.Table.from_pandas(out.to_pandas().sort_values(["event_id"], ignore_index=True))
    return pa.table(
        {
            "event_id": t["event_id"].cast(pa.int64()),
            "user_id": t["user_id"].cast(pa.int64()),
            "rmean": pa.array(
                [_round_half_up(v, 4) if v >= 0 else -_round_half_up(-v, 4)
                 for v in t["rmean"].to_pylist()],
                pa.float64(),
            ),
        }
    )


def q_customers_without_orders(sf_dir: str) -> pa.Table:
    """Distributed anti-join (SQL NOT EXISTS): customers with no URGENT
    order, via functions/relational.hash_join(how='anti') — both sides
    co-partition in ONE bucket exchange; no side is ever broadcast, so
    the shape survives a build side too big for one node. The priority
    predicate is pushed into the parquet scan."""
    import pyarrow.dataset as pds

    from typesense_ray.functions.relational import hash_join

    cust = _read(sf_dir, "customer").select_columns(["c_custkey", "c_name"])
    import ray.data as rd

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey"],
        filter=pds.field("o_orderpriority") == "1-URGENT",
    )
    out = hash_join(
        cust, orders, left_on="c_custkey", right_on="o_custkey",
        left_cols=("c_name",), right_cols={}, how="anti",
    )
    t = pa.Table.from_pandas(out.to_pandas().sort_values(["c_custkey"], ignore_index=True))
    return pa.table(
        {"c_custkey": t["c_custkey"].cast(pa.int64()), "c_name": t["c_name"]}
    )


def q_orders_rollup(sf_dir: str) -> pa.Table:
    """GROUP BY ROLLUP(priority, status) over orders — agg.rollup_aggregate:
    leaf cells from one combiner pass, super-aggregate levels re-merged
    from the leaf grid (input scanned once). Revenue summed in exact
    integer cents so every level is order-independent."""
    import pandas as pd
    import ray.data as rd

    from typesense_ray.agg import rollup_aggregate

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            cents=np.round(df["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
        )
        return df.groupby(
            ["o_orderpriority", "o_orderstatus"], as_index=False
        ).agg(n=("cents", "size"), revenue_cents=("cents", "sum"))

    out = rollup_aggregate(
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderpriority", "o_orderstatus", "o_totalprice"],
        ),
        partial,
        ["o_orderpriority", "o_orderstatus"],
        {"n": "sum", "revenue_cents": "sum"},
    )
    out = out.rename(
        columns={"o_orderpriority": "priority", "o_orderstatus": "status"}
    ).sort_values(["priority", "status"], ignore_index=True)
    return pa.table(
        {
            "priority": pa.array(out["priority"], pa.string()),
            "status": pa.array(out["status"], pa.string()),
            "n": pa.array(out["n"].astype(np.int64), pa.int64()),
            "revenue_cents": pa.array(
                out["revenue_cents"].astype(np.int64), pa.int64()
            ),
        }
    )


def q_oov_rate(sf_dir: str) -> pa.Table:
    """Per-doc OOV token rate vs the corpus top-50-df vocabulary —
    functions/text.oov_rate (broadcast vocab, C-hash isin probe over
    the flattened occurrence stream)."""
    import ray.data as rd

    from typesense_ray.functions.text import oov_rate

    vocab = q_term_df_top50(sf_dir)["term"].to_pylist()
    out = oov_rate(
        rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ),
        vocab,
    )
    t = pa.Table.from_pandas(out.to_pandas().sort_values(["doc_id"], ignore_index=True))
    return pa.table(
        {
            "doc_id": t["doc_id"].cast(pa.int64()),
            "n_toks": t["n_toks"].cast(pa.int64()),
            "oov_rate": pa.array(
                [_round_half_up(v, 6) for v in t["oov_rate"].to_pylist()],
                pa.float64(),
            ),
        }
    )


def q_bigram_top30(sf_dir: str) -> pa.Table:
    """Corpus word-bigram top-30 — functions/text.top_bigrams
    (per-batch shifted-concat combiners, vocab-bounded merge)."""
    import ray.data as rd

    from typesense_ray.functions.text import top_bigrams

    out = top_bigrams(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"]),
        k=30,
    )
    return pa.table(
        {
            "bigram": pa.array(out["bigram"], pa.string()),
            "cnt": pa.array(out["cnt"].astype(np.int64), pa.int64()),
        }
    )


def q_trim_outliers(sf_dir: str) -> pa.Table:
    """Keep events inside the per-type exact [p05, p95] value band —
    functions/relational.quantile_trim (distributed rank selection for
    the bounds, broadcast filter; no value arithmetic so floats match
    SQL exactly)."""
    from typesense_ray.functions.relational import quantile_trim

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    out = quantile_trim(ds, lo=0.05, hi=0.95)
    t = pa.Table.from_pandas(
        out.to_pandas().sort_values(["event_id"], ignore_index=True)[["event_id", "event_type", "value"]]
    )
    return pa.table(
        {
            "event_id": t["event_id"].cast(pa.int64()),
            "event_type": t["event_type"],
            "value": t["value"].cast(pa.float64()),
        }
    )


def q_lang_pivot(sf_dir: str) -> pa.Table:
    """Docs-per-source × language crosstab — agg.pivot_counts (one
    combiner pass to the |sources|×|langs| grid, driver-side widen)."""
    import ray.data as rd

    from typesense_ray.agg import pivot_counts

    out = pivot_counts(
        rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["source", "lang"]
        ),
        "source", "lang", ("de", "en", "es", "fr", "zh"),
    )
    cols = {"source": pa.array(out["source"], pa.string())}
    for lang in ("de", "en", "es", "fr", "zh"):
        cols[f"n_{lang}"] = pa.array(out[f"n_{lang}"], pa.int64())
    return pa.table(cols)


def q_synonym_search(sf_dir: str) -> pa.Table:
    """Synonym expansion under the hard oracle: query 'data join' with
    the one-way synonym join→merge returns the UNION of both variants'
    conjunctive id sets (reference searches variants identically,
    src/collection.cpp:767-787)."""
    from typesense_ray.collection import RayCollection, SynonymIndex

    coll = _docs_index(sf_dir)
    syn = SynonymIndex()
    syn.add_synonym("join", ["merge"])
    c2 = RayCollection(
        coll._local.index_dir, default_sorting_field="n_chars", synonyms=syn
    )
    return c2.matching_ids("data join", apply_synonyms=True)


def q_override_search(sf_dir: str) -> pa.Table:
    """Curation rules under the hard oracle: a matching override
    force-includes ids {1, 2} and hides {5, 6} on the final id set
    (reference include/exclude weave, src/collection.cpp:532-588)."""
    from typesense_ray.collection import Override, RayCollection

    coll = _docs_index(sf_dir)
    ov = Override(
        rule_query="window", match="exact",
        includes=[(1, 1), (2, 2)], excludes=[5, 6],
    )
    c2 = RayCollection(
        coll._local.index_dir, default_sorting_field="n_chars", overrides=[ov]
    )
    return c2.matching_ids("window", apply_overrides=True)


def q_facet_query_counts(sf_dir: str) -> pa.Table:
    """facet_query filtering (reference Index::do_facets facet_query
    path): facet counts for lang restricted to values prefix-matching
    'e' over the docs matching the main query."""
    coll = _docs_index(sf_dir)
    r = coll.search(
        "data", facet_by="lang", facet_query="lang: e", per_page=1,
        highlight=False, max_facet_values=100,
    )
    counts = r["facet_counts"][0]["counts"]
    return pa.table(
        {"value": pa.array([c["value"] for c in counts], pa.string()),
         "cnt": pa.array([c["count"] for c in counts], pa.int64())}
    )


def q_weighted_sample(sf_dir: str) -> pa.Table:
    """Deterministic weighted sampling (Efraimidis–Spirakis keys from a
    hash-derived uniform; inclusion ∝ n_chars) — functions/sampling.
    weighted_sample: per-block partial top-k, k×blocks driver merge."""
    import ray.data as rd

    from typesense_ray.functions.sampling import weighted_sample

    out = weighted_sample(
        rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
        ),
        weight_col="n_chars", k=20,
    ).sort_values("doc_id", ignore_index=True)
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"].astype(np.int64), pa.int64()),
            "n_chars": pa.array(out["n_chars"].astype(np.int64), pa.int64()),
        }
    )


def q_running_total(sf_dir: str) -> pa.Table:
    """Per-user running total of value in (ts, id) order —
    functions/relational.running_total (sequential cumsum matches the
    SQL window's in-order accumulation)."""
    from typesense_ray.functions.relational import running_total

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    out = running_total(ds)
    t = pa.Table.from_pandas(out.to_pandas().sort_values(["event_id"], ignore_index=True))
    return pa.table(
        {
            "event_id": t["event_id"].cast(pa.int64()),
            "user_id": t["user_id"].cast(pa.int64()),
            "cum": pa.array(
                [_round_half_up(v, 4) if v >= 0 else -_round_half_up(-v, 4)
                 for v in t["cum"].to_pylist()],
                pa.float64(),
            ),
        }
    )


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: build the inverted
    index over documents.parquet (segment writers + global df shuffle),
    run a BM25 top-10 search, and return the hydrated hits."""
    sf_dir = "/root/testdata/sf0.001"
    coll = _docs_index(sf_dir)
    res = coll._local.search(_BM25_QUERY, k=10, mode="bm25")
    ids = np.array(res["doc_id"].to_pylist(), dtype=np.uint64)
    docs = coll._local.hydrate(ids, columns=["doc_id", "lang", "source", "n_chars"])
    return docs.append_column(
        "score", pa.array(res["score"].to_pylist(), pa.float64())
    )


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "term_df_top50": q_term_df_top50,
        "top_terms_per_lang": q_top_terms_per_lang,
        "bm25_topk": q_bm25_topk,
        "bm25_or_topk": q_bm25_or_topk,
        "exact_and_search": q_exact_and_search,
        "more_like_this": q_more_like_this,
        "hybrid_search": q_hybrid_search,
        "filter_dsl": q_filter_dsl,
        "facet_lang_counts": q_facet_lang_counts,
        "facet_stats_by_lang": q_facet_stats_by_lang,
        "sort_topk": q_sort_topk,
        "group_top2_per_lang": q_group_top2_per_lang,
        "exact_dedup": q_exact_dedup,
        "token_counts": q_token_counts,
        "seq_packing": q_seq_packing,
        "stratified_sample": q_stratified_sample,
        "tfidf_topk": q_tfidf_topk,
        "redact_pii": q_redact_pii,
        "quality": q_quality,
        "decontaminate": q_decontaminate,
        "rep_filter": q_rep_filter,
        "chunk_docs": q_chunk_docs,
        "char_lm_score": q_char_lm_score,
        "global_shuffle": q_global_shuffle,
        "dup_spans": q_dup_spans,
        "source_mix": q_source_mix,
        "event_histogram": q_event_histogram,
        "knn_filtered": q_knn_filtered,
        "distinct_users": q_distinct_users,
        "hll_users": q_hll_users,
        "cms_terms": q_cms_terms,
        "props_stats": q_props_stats,
        "bloom_decontaminate": q_bloom_decontaminate,
        "kmeans_clusters": q_kmeans_clusters,
        "prepare_corpus": q_prepare_corpus,
        "zscore_events": q_zscore_events,
        "label_centroids": q_label_centroids,
        "value_quantiles": q_value_quantiles,
        "knn_cosine": q_knn_cosine,
        "phrase_search": q_phrase_search,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "dup_clusters": q_dup_clusters,
        "near_dedup": q_near_dedup,
        "clean_corpus": q_clean_corpus,
        "minhash_dup_pairs": q_minhash_dup_pairs,
        "simhash_groups": q_simhash_groups,
        "langid": q_langid,
        "fingerprints": q_fingerprints,
        "multimodal_decode": q_multimodal_decode,
        "audio_features": q_audio_features,
        "image_decode_real": q_image_decode_real,
        "tpch_q1ish": q_tpch_q1ish,
        "tpch_q5ish": q_tpch_q5ish,
        "join_priority": q_join_priority,
        "sessionize": q_sessionize,
        "asof_join": q_asof_join,
        "user_deltas": q_user_deltas,
        "rolling_events": q_rolling_events,
        "customers_without_orders": q_customers_without_orders,
        "orders_rollup": q_orders_rollup,
        "oov_rate": q_oov_rate,
        "bigram_top30": q_bigram_top30,
        "trim_outliers": q_trim_outliers,
        "lang_pivot": q_lang_pivot,
        "synonym_search": q_synonym_search,
        "override_search": q_override_search,
        "facet_query_counts": q_facet_query_counts,
        "weighted_sample": q_weighted_sample,
        "running_total": q_running_total,
        "events_tumbling": q_events_tumbling,
        "events_hopping": q_events_hopping,
        "typo_search": q_typo_search,
        "prefix_search": q_prefix_search,
        "reference_rank": q_reference_rank,
        "embedding_dup_pairs": q_embedding_dup_pairs,
        "ann_ivf": q_ann_ivf,
        "multifield_search": q_multifield_search,
        "multifield_ids": q_multifield_ids,
    }


_TOKS_CTE = """
WITH toks AS (
  SELECT doc_id,
         lower(regexp_replace(u.tok, '[^a-zA-Z0-9]', '', 'g')) AS term
  FROM documents,
       unnest(string_split(replace(text, chr(10), ' '), ' ')) AS u(tok)
), toks2 AS (SELECT doc_id, term FROM toks WHERE term <> '')
"""


_TOKLIST_CTE = """
WITH lt AS (
  SELECT doc_id,
         list_filter(
           list_transform(string_split(replace(text, chr(10), ' '), ' '),
             t -> lower(regexp_replace(t, '[^a-zA-Z0-9]', '', 'g'))),
           t -> t <> '') AS toks
  FROM documents
)
"""


_AUG_CTE = """
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         CASE WHEN len(string_split(text, ' ')) > 3 THEN
           array_to_string(
             list_concat(list_concat(
               string_split(text, ' ')[1:len(string_split(text, ' ')) // 2],
               ['mutatedword']),
               string_split(text, ' ')[len(string_split(text, ' ')) // 2 + 2:]),
             ' ')
         ELSE text END AS text
  FROM (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 20)
)
"""


def oracle_sql() -> dict[str, str]:
    bm25_terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    from typesense_ray.functions.text import _LANG_PROFILES

    prof_rows = ", ".join(
        f"('{lang}','{tok}')"
        for lang in sorted(_LANG_PROFILES)
        for tok in sorted(_LANG_PROFILES[lang])
    )
    d = {
        "term_df_top50": _TOKS_CTE
        + """
SELECT term, count(DISTINCT doc_id) AS df
FROM toks2 GROUP BY term
ORDER BY df DESC, term ASC LIMIT 50
""",
        "bm25_topk": _TOKS_CTE
        + f"""
, tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks2
  WHERE term IN ({bm25_terms}) GROUP BY doc_id, term
), dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT sum(dl) FROM dl) * 1.0 / (SELECT count(*) FROM documents) AS avgdl
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
cand AS (SELECT doc_id FROM tf GROUP BY doc_id HAVING count(*) = {len(_BM25_TERMS)}),
scores AS (
  SELECT c.doc_id,
         sum(
           ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * (1.2 + 1.0))
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl))
         ) AS raw_score
  FROM cand c
  JOIN tf ON tf.doc_id = c.doc_id
  JOIN df ON df.term = tf.term
  JOIN dl ON dl.doc_id = c.doc_id
  CROSS JOIN stats s
  GROUP BY c.doc_id
)
SELECT doc_id, round(raw_score, 4) AS score
FROM scores ORDER BY raw_score DESC, doc_id DESC LIMIT 10
""",
        # hybrid retrieval: BM25 top-100 (same scores CTE as bm25_topk)
        # -> cosine rerank against vec 0's embedding -> top-10
        "hybrid_search": _TOKS_CTE
        + f"""
, tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks2
  WHERE term IN ({bm25_terms}) GROUP BY doc_id, term
), dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT sum(dl) FROM dl) * 1.0 / (SELECT count(*) FROM documents) AS avgdl
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
cand AS (SELECT doc_id FROM tf GROUP BY doc_id HAVING count(*) = {len(_BM25_TERMS)}),
scores AS (
  SELECT c.doc_id,
         sum(
           ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * (1.2 + 1.0))
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl))
         ) AS raw_score
  FROM cand c
  JOIN tf ON tf.doc_id = c.doc_id
  JOIN df ON df.term = tf.term
  JOIN dl ON dl.doc_id = c.doc_id
  CROSS JOIN stats s
  GROUP BY c.doc_id
),
cand100 AS (
  SELECT doc_id, raw_score FROM scores
  ORDER BY raw_score DESC, doc_id DESC LIMIT 100
),
qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0)
SELECT c.doc_id, round(c.raw_score, 4) AS bm25,
       round(list_cosine_similarity(e.embedding::DOUBLE[], (SELECT q::DOUBLE[] FROM qv)), 5)
         AS cosine
FROM cand100 c JOIN embeddings e ON e.vec_id = c.doc_id
ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], (SELECT q::DOUBLE[] FROM qv)) DESC,
         c.doc_id DESC
LIMIT 10
""",
        "bm25_or_topk": _TOKS_CTE
        + f"""
, tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks2
  WHERE term IN ({bm25_terms}) GROUP BY doc_id, term
), dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT sum(dl) FROM dl) * 1.0 / (SELECT count(*) FROM documents) AS avgdl
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scores AS (
  SELECT tf.doc_id,
         sum(
           ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * (1.2 + 1.0))
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl))
         ) AS raw_score
  FROM tf
  JOIN df ON df.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT doc_id, round(raw_score, 4) AS score
FROM scores ORDER BY raw_score DESC, doc_id DESC LIMIT 10
""",
        "exact_and_search": _TOKS_CTE
        + """
SELECT doc_id FROM toks2 WHERE term IN ('window','merge')
GROUP BY doc_id HAVING count(DISTINCT term) = 2
ORDER BY doc_id
""",
        "phrase_search": """
-- slot-adjacency phrase match == containment in the normalized string
-- (tokenizer: lower, newline to space, drop non-alnum within slots)
SELECT doc_id FROM documents
WHERE ' ' || regexp_replace(replace(lower(text), chr(10), ' '), '[^a-z0-9 ]', '', 'g') || ' '
      LIKE '% merge group %'
ORDER BY doc_id
""",
        "ngram_jaccard_pairs": """
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         CASE WHEN len(string_split(text, ' ')) > 3 THEN
           array_to_string(
             list_concat(list_concat(
               string_split(text, ' ')[1:len(string_split(text, ' ')) // 2],
               ['mutatedword']),
               string_split(text, ' ')[len(string_split(text, ' ')) // 2 + 2:]),
             ' ')
         ELSE text END AS text
  FROM (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 20)
),
norm AS (
  SELECT doc_id,
         list_filter(
           string_split(
             regexp_replace(replace(lower(text), chr(10), ' '), '[^a-z0-9 ]', '', 'g'),
             ' '),
           x -> x <> '') AS toks
  FROM aug
),
idx AS (
  SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i FROM norm
),
tri AS (
  SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS sh
  FROM idx
),
grp AS (SELECT sh, count(*) AS df FROM tri GROUP BY sh),
kept AS (SELECT t.doc_id, t.sh FROM tri t JOIN grp USING (sh) WHERE grp.df <= 64),
sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
common AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
  FROM kept x JOIN kept y USING (sh)
  WHERE x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
)
SELECT a, b, round(c * 1.0 / (sa.n + sb.n - c), 4) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = a
JOIN sizes sb ON sb.doc_id = b
WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.6
ORDER BY a, b
""",
        "filter_dsl": """
SELECT doc_id FROM documents
WHERE n_chars >= 300 AND lang IN ('en','de')
ORDER BY doc_id
""",
        "facet_lang_counts": _TOKS_CTE
        + """
SELECT d.lang AS value, count(*) AS cnt
FROM documents d
WHERE EXISTS (SELECT 1 FROM toks2 t WHERE t.doc_id = d.doc_id AND t.term = 'data')
GROUP BY d.lang
""",
        # CAST sum to BIGINT (DuckDB sums ints into HUGEINT, which
        # hash-mismatches the engine's int64) and compute avg as
        # sum*1.0/count — the same associativity as the engine side.
        "facet_stats_by_lang": """
SELECT lang, min(n_chars) AS min_nc, max(n_chars) AS max_nc,
       CAST(sum(n_chars) AS BIGINT) AS sum_nc,
       round(CAST(sum(n_chars) AS BIGINT) * 1.0 / count(*), 6) AS avg_nc,
       count(*) AS cnt
FROM documents GROUP BY lang
""",
        "sort_topk": """
SELECT doc_id, n_chars FROM documents
ORDER BY n_chars DESC, doc_id DESC LIMIT 20
""",
        "group_top2_per_lang": """
SELECT lang, doc_id, n_chars FROM (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id DESC) AS rn
  FROM documents
) WHERE rn <= 2
""",
        "exact_dedup": """
SELECT min(doc_id) AS doc_id FROM documents GROUP BY text ORDER BY doc_id
""",
        "token_counts": """
SELECT doc_id,
       len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS ws_tokens
FROM documents ORDER BY doc_id
""",
        "tfidf_topk": _TOKS_CTE
        + """
, tf AS (SELECT doc_id, term, count(*) AS tf FROM toks2 GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS c FROM documents),
s AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * ln((SELECT c FROM n) * 1.0 / df.df) AS raw
  FROM tf JOIN df USING (term)
)
SELECT doc_id, term, round(raw, 6) AS score FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY raw DESC, term ASC) AS rn
  FROM s
) WHERE rn <= 3
ORDER BY doc_id, raw DESC, term ASC
""",
        "stratified_sample": """
SELECT lang, doc_id FROM (
  SELECT lang, doc_id,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rn
  FROM documents
) WHERE rn <= 5 ORDER BY lang, doc_id
""",
        "seq_packing": """
WITH tok AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
           AS n_tokens
  FROM documents
), cum AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM tok
)
SELECT doc_id, n_tokens,
       CAST(cum_before // 512 AS BIGINT) AS pack_id,
       CAST(cum_before % 512 AS BIGINT) AS pack_off
FROM cum ORDER BY doc_id
""",
        "quality": """
SELECT doc_id,
       len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS n_tokens,
       CASE WHEN length(text) = 0 THEN 0.0
            ELSE round(length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0
                       / length(text), 6) END AS digit_ratio,
       CASE WHEN length(text) = 0 THEN 0.0
            ELSE round(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) * 1.0
                       / length(text), 6) END AS punct_ratio
FROM documents ORDER BY doc_id
""",
        "decontaminate": _TOKLIST_CTE
        + """
, ng AS (
  SELECT doc_id, array_to_string(toks[i : i + 7], ' ') AS ng
  FROM lt, unnest(CASE WHEN len(toks) >= 8
                       THEN range(1, len(toks) - 6) ELSE [] END) AS u(i)
), bench AS (
  SELECT DISTINCT ng FROM ng
  WHERE doc_id IN (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 30)
)
SELECT g.doc_id, count(*) AS ngram_hits
FROM ng g JOIN bench b USING (ng)
GROUP BY g.doc_id ORDER BY g.doc_id
""",
        "rep_filter": _TOKLIST_CTE
        + """
, uni AS (
  SELECT doc_id, max(c) * 1.0 / sum(c) AS tf_top
  FROM (SELECT doc_id, term, count(*) AS c
        FROM (SELECT doc_id, unnest(toks) AS term FROM lt)
        GROUP BY doc_id, term)
  GROUP BY doc_id
), ng AS (
  SELECT doc_id, array_to_string(toks[i : i + 1], ' ') AS g
  FROM lt, unnest(CASE WHEN len(toks) >= 2
                       THEN range(1, len(toks)) ELSE [] END) AS u(i)
), big AS (
  SELECT doc_id, 1.0 - count(DISTINCT g) * 1.0 / count(*) AS dup2
  FROM ng GROUP BY doc_id
)
SELECT d.doc_id,
       round(coalesce(uni.tf_top, 0.0), 6) AS top_unigram_frac,
       round(coalesce(big.dup2, 0.0), 6) AS dup_2gram_frac,
       CAST(coalesce(uni.tf_top, 0.0) <= 0.3
            AND coalesce(big.dup2, 0.0) <= 0.2 AS BIGINT) AS keep_rep
FROM documents d
LEFT JOIN uni USING (doc_id)
LEFT JOIN big ON big.doc_id = d.doc_id
ORDER BY d.doc_id
""",
        "chunk_docs": _TOKLIST_CTE
        + """
SELECT doc_id,
       CAST((i - 1) / 48 AS BIGINT) AS chunk_id,
       CAST(least(i + 63, len(toks)) - i + 1 AS BIGINT) AS n_chunk_tokens,
       array_to_string(toks[i : least(i + 63, len(toks))], ' ') AS chunk_text
FROM lt, unnest(CASE WHEN len(toks) >= 1
                     THEN range(1, len(toks) + 1, 48) ELSE [] END) AS u(i)
ORDER BY doc_id, chunk_id
""",
        "char_lm_score": """
WITH ch AS (
  SELECT doc_id, substr(text, i, 2) AS bg, substr(text, i, 1) AS c1
  FROM documents,
       unnest(CASE WHEN length(text) >= 2
                   THEN range(1, length(text)) ELSE [] END) AS u(i)
),
bgc AS (SELECT bg, count(*) AS c FROM ch GROUP BY bg),
c1c AS (SELECT c1, count(*) AS c1n FROM ch GROUP BY c1),
sc AS (
  SELECT ch.doc_id, count(*) AS n_bigrams,
         avg(ln(bgc.c * 1.0 / c1c.c1n)) AS lp
  FROM ch JOIN bgc USING (bg) JOIN c1c USING (c1)
  GROUP BY ch.doc_id
)
SELECT d.doc_id,
       coalesce(sc.n_bigrams, 0) AS n_bigrams,
       round(coalesce(sc.lp, 0.0), 6) AS avg_logprob
FROM documents d LEFT JOIN sc USING (doc_id)
ORDER BY d.doc_id
""",
        "global_shuffle": """
SELECT doc_id,
       CAST(hkey % 8 AS BIGINT) AS shard,
       CAST(row_number() OVER (
              PARTITION BY hkey % 8 ORDER BY hkey, doc_id) - 1
            AS BIGINT) AS pos
FROM (SELECT doc_id,
             (doc_id * 2654435761) % 4294967296 AS hkey
      FROM documents)
ORDER BY doc_id
""",
        "more_like_this": _TOKS_CTE
        + """
, seed AS (SELECT DISTINCT term FROM toks2 WHERE doc_id = 0),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks2 GROUP BY term),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks2 GROUP BY doc_id, term),
sc AS (
  SELECT tf.doc_id,
         sum(tf.tf * ln((SELECT count(*) FROM documents) * 1.0 / df.df)) AS s
  FROM tf JOIN seed USING (term) JOIN df USING (term)
  WHERE tf.doc_id <> 0
  GROUP BY tf.doc_id
)
SELECT doc_id, round(s, 4) AS score FROM sc
ORDER BY s DESC, doc_id DESC LIMIT 20
""",
        "tpch_q5ish": """
SELECT n_name,
       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
        "top_terms_per_lang": """
WITH toks AS (
  SELECT doc_id, lang,
         lower(regexp_replace(u.tok, '[^a-zA-Z0-9]', '', 'g')) AS term
  FROM documents,
       unnest(string_split(replace(text, chr(10), ' '), ' ')) AS u(tok)
), toks2 AS (SELECT doc_id, lang, term FROM toks WHERE term <> '')
SELECT lang, term, df FROM (
  SELECT lang, term, count(DISTINCT doc_id) AS df,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY count(DISTINCT doc_id) DESC, term) AS rn
  FROM toks2 GROUP BY lang, term
) WHERE rn <= 10 ORDER BY lang, df DESC, term
""",
        "source_mix": f"""
SELECT doc_id, source FROM documents
JOIN (VALUES {", ".join(f"('src{k}', {(k + 1) / 20!r})" for k in range(20))})
     r(source, rate) USING (source)
WHERE (doc_id * 2654435761) % 4294967296
      < CAST(floor(r.rate * 4294967296.0) AS BIGINT)
ORDER BY doc_id
""",
        "event_histogram": """
WITH mm AS (SELECT min(value) AS lo, max(value) AS hi FROM events)
SELECT event_type,
       CAST(least(floor((value - mm.lo) / (mm.hi - mm.lo) * 20), 19)
            AS BIGINT) AS bin,
       count(*) AS c
FROM events, mm
GROUP BY event_type, bin
ORDER BY event_type, bin
""",
        "knn_filtered": """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       round(list_cosine_similarity(embedding::DOUBLE[], (SELECT qv::DOUBLE[] FROM q)), 5) AS score
FROM embeddings
WHERE label = 3
ORDER BY list_cosine_similarity(embedding::DOUBLE[], (SELECT qv::DOUBLE[] FROM q)) DESC, vec_id DESC
LIMIT 10
""",
        "dup_spans": _AUG_CTE
        + """
, lt AS (
  SELECT doc_id,
         list_filter(
           list_transform(string_split(replace(text, chr(10), ' '), ' '),
             t -> lower(regexp_replace(t, '[^a-zA-Z0-9]', '', 'g'))),
           t -> t <> '') AS toks
  FROM aug
), ng AS (
  SELECT doc_id, array_to_string(toks[i : i + 9], ' ') AS g
  FROM lt, unnest(CASE WHEN len(toks) >= 10
                       THEN range(1, len(toks) - 8) ELSE [] END) AS u(i)
), dup AS (SELECT g FROM ng GROUP BY g HAVING count(*) >= 2)
SELECT ng.doc_id, count(*) AS dup_spans
FROM ng JOIN dup USING (g)
GROUP BY ng.doc_id ORDER BY ng.doc_id
""",
        "zscore_events": """
WITH m AS (
  SELECT event_type, avg(value) AS mu, stddev_pop(value) AS sd
  FROM events GROUP BY event_type
)
SELECT event_id, e.event_type, round((value - mu) / sd, 4) AS z
FROM events e JOIN m USING (event_type)
ORDER BY event_id
""",
        "label_centroids": """
SELECT label,
       i AS dim,
       round(avg(embedding[i]), 6) AS centroid
FROM embeddings, unnest(range(1, 65)) AS u(i)
GROUP BY label, i
ORDER BY label, i
""",
        "distinct_users": """
SELECT event_type, count(DISTINCT user_id) AS users
FROM events GROUP BY event_type ORDER BY event_type
""",
        # HLL registers: bucket = low 8 bits of the 32-bit Knuth hash,
        # rho = rank of first 1-bit of the 24-bit suffix (floor(log2) is
        # exact for integers < 2^24 in IEEE double on both engines)
        "hll_users": """
WITH h AS (SELECT (user_id * 2654435761) % 4294967296 AS h FROM events),
r AS (SELECT h % 256 AS bucket,
             CASE WHEN h // 256 = 0 THEN 25
                  ELSE 24 - CAST(floor(log2(h // 256)) AS BIGINT) END AS rho
      FROM h)
SELECT bucket, MAX(rho) AS max_rho FROM r GROUP BY bucket ORDER BY bucket
""",
        # Count-min registers: d=2 rows, both bucket positions from ONE
        # FNV-1a per distinct term (row_i = (h // m^i) mod m); registers
        # are occurrence-count sums, integer-exact on both engines
        "cms_terms": _TOKS_CTE
        + """
, tf AS (SELECT term, count(*) AS c FROM toks2 GROUP BY term),
hv AS (
  SELECT c,
    list_reduce(
      list_prepend(14695981039346656037::UBIGINT,
        list_transform(regexp_split_to_array(term, ''),
                       ch -> unicode(ch)::UBIGINT)),
      (h, b) -> CAST((CAST(xor(h, b) AS HUGEINT) * 1099511628211)
                % 18446744073709551616 AS UBIGINT)) AS h
  FROM tf
), r0 AS (
  SELECT 0 AS "row", CAST(h % 4096 AS BIGINT) AS bucket, c FROM hv
  UNION ALL
  SELECT 1 AS "row", CAST((h // 4096) % 4096 AS BIGINT) AS bucket, c FROM hv
)
SELECT "row", bucket, CAST(SUM(c) AS BIGINT) AS c FROM r0
GROUP BY "row", bucket ORDER BY "row", bucket
""",
        "props_stats": """
WITH kk AS (
  SELECT event_type,
         CAST(regexp_extract(props, '"k"\\s*:\\s*(-?\\d+)', 1) AS BIGINT) AS k
  FROM events
)
SELECT event_type, count(*) AS n, CAST(SUM(k) AS BIGINT) AS k_sum,
       MIN(k) AS k_min, MAX(k) AS k_max
FROM kk GROUP BY event_type ORDER BY event_type
""",
        # Bloom decontamination: both bit positions derive from ONE
        # FNV-1a of the n-gram (p1 = h mod 2^20, p2 = (h // 2^20) mod
        # 2^20); the bench bitset is the union of both positions of every
        # benchmark n-gram. Deterministic false positives match the
        # engine's by construction.
        "bloom_decontaminate": """
WITH lt AS (
  SELECT doc_id,
         list_filter(
           list_transform(string_split(replace(text, chr(10), ' '), ' '),
             t -> lower(regexp_replace(t, '[^a-zA-Z0-9]', '', 'g'))),
           t -> t <> '') AS toks
  FROM documents
), ng AS (
  SELECT doc_id, array_to_string(toks[i : i + 7], ' ') AS ng
  FROM lt, unnest(CASE WHEN len(toks) >= 8
                       THEN range(1, len(toks) - 6) ELSE [] END) AS u(i)
), hv AS (
  SELECT doc_id,
    list_reduce(
      list_prepend(14695981039346656037::UBIGINT,
        list_transform(regexp_split_to_array(ng, ''),
                       c -> unicode(c)::UBIGINT)),
      (h, b) -> CAST((CAST(xor(h, b) AS HUGEINT) * 1099511628211)
                % 18446744073709551616 AS UBIGINT)) AS h
  FROM ng
), pos AS (
  SELECT doc_id, h % 1048576 AS p1, (h // 1048576) % 1048576 AS p2 FROM hv
), bbits AS (
  SELECT DISTINCT p FROM (
    SELECT p1 AS p FROM pos
    WHERE doc_id IN (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 30)
    UNION ALL
    SELECT p2 AS p FROM pos
    WHERE doc_id IN (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 30))
)
SELECT doc_id, count(*) AS bloom_hits
FROM pos
WHERE p1 IN (SELECT p FROM bbits) AND p2 IN (SELECT p FROM bbits)
GROUP BY doc_id ORDER BY doc_id
""",
        # One deterministic Lloyd iteration (seeds = 4 smallest vec_ids,
        # means rounded to 6dp, re-assign; ties -> lower cluster id)
        "kmeans_clusters": f"""
WITH seeds AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
         embedding::DOUBLE[] AS c
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 4)
), a0 AS (
  SELECT e.vec_id, e.embedding::DOUBLE[] AS x,
         (SELECT s.cid FROM seeds s
          ORDER BY list_distance(e.embedding::DOUBLE[], s.c), s.cid
          LIMIT 1) AS cid
  FROM embeddings e
), g AS (
  SELECT cid,
         [{", ".join(f"round(avg(x[{i}]), 6)" for i in range(1, 65))}]
           ::DOUBLE[] AS c
  FROM a0 GROUP BY cid
), m AS (
  -- empty cluster keeps its seed centroid (engine's seed fallback)
  SELECT s.cid, coalesce(g.c, s.c) AS c
  FROM seeds s LEFT JOIN g USING (cid)
)
SELECT e.vec_id,
       (SELECT m.cid FROM m
        ORDER BY list_distance(e.embedding::DOUBLE[], m.c), m.cid
        LIMIT 1) AS cluster
FROM embeddings e ORDER BY e.vec_id
""",
        "value_quantiles": """
WITH n AS (SELECT event_type, count(*) AS n FROM events GROUP BY event_type),
r AS (SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn
      FROM events)
SELECT r.event_type, p.p, r.value
FROM r
JOIN n USING (event_type)
JOIN (VALUES (0.25), (0.5), (0.75), (0.95)) p(p)
  ON r.rn = CAST(ceil(p.p * n.n) AS BIGINT)
ORDER BY r.event_type, p.p
""",
        "knn_cosine": """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       round(list_cosine_similarity(embedding::DOUBLE[], (SELECT qv::DOUBLE[] FROM q)), 5) AS score
FROM embeddings
ORDER BY list_cosine_similarity(embedding::DOUBLE[], (SELECT qv::DOUBLE[] FROM q)) DESC, vec_id DESC
LIMIT 10
""",
        "tpch_q1ish": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_quantity) / count(*), 6) AS avg_qty,
       count(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
        "prefix_search": _TOKS_CTE
        + """
SELECT DISTINCT doc_id FROM toks2 WHERE term LIKE 'wind%' ORDER BY doc_id
""",
        # typo semantics: per token, accept vocabulary terms within OSA
        # distance <= 2 (DuckDB's damerau_levenshtein matches OSA on this
        # vocab); a doc hits when it contains one accepted term per token.
        "typo_search": _TOKS_CTE
        + """
, vocab AS (SELECT DISTINCT term FROM toks2),
c1 AS (SELECT term FROM vocab WHERE damerau_levenshtein('strean', term) <= 2),
c2 AS (SELECT term FROM vocab WHERE damerau_levenshtein('jion', term) <= 2)
SELECT DISTINCT a.doc_id FROM toks2 a
WHERE a.term IN (SELECT term FROM c1)
  AND EXISTS (
    SELECT 1 FROM toks2 b
    WHERE b.doc_id = a.doc_id AND b.term IN (SELECT term FROM c2)
  )
ORDER BY doc_id
""",
        "multifield_ids": _TOKS_CTE
        + """
SELECT doc_id FROM documents WHERE source = 'src8'
UNION
SELECT doc_id FROM toks2 WHERE term = 'src8'
ORDER BY doc_id
""",
        "join_priority": """
SELECT o_orderpriority, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS sum_total
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderpriority
""",
        "asof_join": """
SELECT c.event_id, c.user_id,
       v.event_id AS view_event_id,
       round(v.value, 6) AS view_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id AND c.ts >= v.ts
ORDER BY c.event_id
""",
        "synonym_search": _TOKS_CTE
        + """
, m1 AS (SELECT doc_id FROM toks2 WHERE term IN ('data', 'join')
         GROUP BY doc_id HAVING count(DISTINCT term) = 2),
m2 AS (SELECT doc_id FROM toks2 WHERE term IN ('data', 'merge')
       GROUP BY doc_id HAVING count(DISTINCT term) = 2)
SELECT doc_id FROM (SELECT doc_id FROM m1 UNION SELECT doc_id FROM m2)
ORDER BY doc_id
""",
        "override_search": _TOKS_CTE
        + """
, base AS (SELECT DISTINCT doc_id FROM toks2 WHERE term = 'window'),
curated AS (
  SELECT doc_id FROM base
  UNION SELECT * FROM (VALUES (1), (2)) v(doc_id)
)
SELECT doc_id FROM curated WHERE doc_id NOT IN (5, 6) ORDER BY doc_id
""",
        "facet_query_counts": _TOKS_CTE
        + """
SELECT lang AS value, count(*) AS cnt FROM documents
WHERE doc_id IN (SELECT doc_id FROM toks2 WHERE term = 'data')
  AND lang LIKE 'e%'
GROUP BY lang ORDER BY value
""",
        "oov_rate": _TOKS_CTE
        + """
, df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks2 GROUP BY term),
vocab AS (SELECT term FROM df ORDER BY df DESC, term LIMIT 50)
SELECT doc_id, count(*) AS n_toks,
       round(count(*) FILTER (WHERE term NOT IN (SELECT term FROM vocab))
             * 1.0 / count(*), 6) AS oov_rate
FROM toks2 GROUP BY doc_id ORDER BY doc_id
""",
        "bigram_top30": _TOKLIST_CTE
        + """
SELECT lt.toks[i] || ' ' || lt.toks[i + 1] AS bigram, count(*) AS cnt
FROM lt, unnest(range(1, len(toks))) AS u(i)
GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 30
""",
        "trim_outliers": """
WITH n AS (SELECT event_type, count(*) AS n FROM events GROUP BY event_type),
r AS (SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn
      FROM events),
b AS (SELECT r.event_type,
             max(CASE WHEN rn = CAST(ceil(0.05 * n) AS BIGINT)
                 THEN value END) AS lo,
             max(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
                 THEN value END) AS hi
      FROM r JOIN n USING (event_type) GROUP BY r.event_type)
SELECT e.event_id, e.event_type, e.value
FROM events e JOIN b USING (event_type)
WHERE e.value >= b.lo AND e.value <= b.hi
ORDER BY e.event_id
""",
        "lang_pivot": """
SELECT source,
       count(*) FILTER (WHERE lang = 'de') AS n_de,
       count(*) FILTER (WHERE lang = 'en') AS n_en,
       count(*) FILTER (WHERE lang = 'es') AS n_es,
       count(*) FILTER (WHERE lang = 'fr') AS n_fr,
       count(*) FILTER (WHERE lang = 'zh') AS n_zh
FROM documents GROUP BY source ORDER BY source
""",
        "weighted_sample": """
SELECT doc_id, n_chars FROM (
  SELECT doc_id, n_chars,
         pow((((doc_id * 2654435761) % 4294967296) + 1) / 4294967296.0,
             1.0 / n_chars) AS key
  FROM documents
  ORDER BY key DESC, doc_id LIMIT 20
) ORDER BY doc_id
""",
        "running_total": """
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING), 4) AS cum
FROM events ORDER BY event_id
""",
        "user_deltas": """
WITH d AS (
  SELECT event_id, user_id,
         epoch_us(ts - lag(ts) OVER w) / 1000000.0 AS dt_s,
         value - lag(value) OVER w AS dv
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id, user_id, dt_s, dv FROM d
WHERE dt_s IS NOT NULL ORDER BY event_id
""",
        "rolling_events": """
SELECT event_id, user_id,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
             4) AS rmean
FROM events ORDER BY event_id
""",
        "customers_without_orders": """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
ORDER BY c_custkey
""",
        "orders_rollup": """
SELECT coalesce(o_orderpriority, 'ALL') AS priority,
       coalesce(o_orderstatus, 'ALL') AS status,
       count(*) AS n,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM orders
GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
ORDER BY priority, status
""",
        "sessionize": """
WITH e AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 1800 SECOND
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts, value,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
  FROM e
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS start_ts,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS end_ts,
       round(sum(value), 6) AS sum_value
FROM s GROUP BY user_id, session_idx
ORDER BY user_id, session_idx
""",
        "events_tumbling": """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS window,
       event_type,
       round(sum(value), 6) AS sum_value,
       count(*) AS cnt
FROM events GROUP BY 1, 2
""",
        "events_hopping": """
WITH e AS (
  SELECT make_timestamp(
           CAST((floor(epoch(ts) / 1800) * 1800 - o.off) * 1000000 AS BIGINT)
         ) AS wstart,
         event_type, value
  FROM events, (VALUES (0), (1800)) AS o(off)
)
SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window, event_type,
       round(sum(value), 6) AS sum_value, count(*) AS cnt
FROM e GROUP BY 1, 2
""",
        # stopword-profile language ID: token = maximal [a-z0-9]+ run;
        # score = profile-token occurrences / tokens; argmax with ties to
        # the lexicographically largest language (the engine's
        # max(score, lang) key)
        "langid": f"""
WITH tk AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
  FROM documents
),
cnt AS (SELECT doc_id, count(*) AS n FROM tk GROUP BY doc_id),
prof(lang, tok) AS (VALUES {prof_rows}),
langs AS (SELECT DISTINCT lang FROM prof),
hits AS (
  SELECT t.doc_id, p.lang, count(*) AS h
  FROM tk t JOIN prof p ON t.tok = p.tok GROUP BY t.doc_id, p.lang
),
scored AS (
  SELECT c.doc_id, l.lang, coalesce(h.h, 0) * 1.0 / c.n AS score
  FROM cnt c CROSS JOIN langs l
  LEFT JOIN hits h ON h.doc_id = c.doc_id AND h.lang = l.lang
),
best AS (
  SELECT doc_id, lang, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, lang DESC) AS rn
  FROM scored
)
SELECT d.doc_id,
       CASE WHEN b.score > 0 THEN b.lang ELSE 'und' END AS lang_pred,
       round(coalesce(b.score, 0), 6) AS lang_conf
FROM documents d
LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)
ORDER BY doc_id
""",
        # full simhash recomputed in SQL: the engine's token hash is the
        # first 8 bytes of sha256 (chosen so DuckDB — which has sha256()
        # but not blake2b — can reproduce it bit-exactly), then the
        # tf-weighted ±1 bit-lane majority over 64 bits, grouped hamming-0
        "simhash_groups": _AUG_CTE
        + r"""
, occ AS (
  SELECT doc_id,
         unnest(list_filter(
           string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' '),
           t -> t != '')) AS tok
  FROM aug
),
th AS (
  SELECT doc_id, ('0x' || substr(sha256(tok), 1, 16))::UBIGINT AS h FROM occ
),
bits AS (
  SELECT doc_id, b.b,
    CASE WHEN sum(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) > 0
         THEN (1::UBIGINT << b.b) ELSE 0::UBIGINT END AS bit
  FROM th CROSS JOIN (SELECT unnest(range(64)) AS b) b
  GROUP BY doc_id, b.b
),
sh AS (
  SELECT a.doc_id, coalesce(s.simhash, 0::UBIGINT) AS simhash
  FROM aug a LEFT JOIN (
    SELECT doc_id, sum(bit)::UBIGINT AS simhash FROM bits GROUP BY doc_id
  ) s USING (doc_id)
),
g AS (
  SELECT simhash, count(*) AS group_size
  FROM sh GROUP BY simhash HAVING count(*) > 1
)
SELECT sh.doc_id, sh.simhash, g.group_size
FROM sh JOIN g USING (simhash)
ORDER BY doc_id
""",
        # FNV-1a rolling fingerprint recomputed in SQL: byte-exact fold of
        # the normalized token stream ("tok tok ... tok ") through
        # h := ((h XOR byte) * 1099511628211) mod 2^64 via HUGEINT
        # arithmetic (ASCII corpus: unicode(char) == utf-8 byte)
        "fingerprints": r"""
SELECT doc_id,
  CASE WHEN text IS NULL OR trim(text) = '' THEN 14695981039346656037::UBIGINT
  ELSE list_reduce(
    list_prepend(14695981039346656037::UBIGINT,
      list_transform(
        regexp_split_to_array(
          regexp_replace(trim(lower(text)), '\s+', ' ', 'g') || ' ', ''),
        c -> unicode(c)::UBIGINT)),
    (h, b) -> CAST((CAST(xor(h, b) AS HUGEINT) * 1099511628211)
              % 18446744073709551616 AS UBIGINT)
  ) END AS fingerprint
FROM documents ORDER BY doc_id
""",
        # exact all-pairs char-5-gram Jaccard ground truth over the
        # augmented docs — the engine's LSH(128 perms, 32 bands)+verify
        # output must equal it (recall ~0.9998/pair at the threshold)
        "minhash_dup_pairs": _AUG_CTE
        + """
, norm AS (
  SELECT doc_id,
         trim(regexp_replace(lower(replace(text, chr(10), ' ')),
                             '\\s+', ' ', 'g')) AS t
  FROM aug
),
idx AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t) - 4)) AS i
  FROM norm WHERE len(t) >= 5
),
sh AS (
  SELECT DISTINCT doc_id, substr(t, i, 5) AS s FROM idx
  UNION
  SELECT DISTINCT doc_id, t AS s FROM norm WHERE len(t) BETWEEN 1 AND 4
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
  FROM sh x JOIN sh y USING (s) WHERE x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
)
SELECT a, b, round(c * 1.0 / (sa.n + sb.n - c), 4) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = a
JOIN sizes sb ON sb.doc_id = b
WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.7
ORDER BY a, b
""",
        # cosine near-dup ground truth over embeddings + the two injected
        # near-copies (vec_id+10^7, every component +0.001)
        "embedding_dup_pairs": """
WITH aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 10000000 AS vec_id,
         list_transform(embedding, x -> x + 0.001) AS embedding
  FROM embeddings WHERE vec_id < 2
),
pairs AS (
  SELECT x.vec_id AS a, y.vec_id AS b,
         list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[]) AS c
  FROM aug x JOIN aug y ON x.vec_id < y.vec_id
)
SELECT a, b, round(c, 4) AS cosine FROM pairs
WHERE c >= 0.99 ORDER BY a, b
""",
        # full-probe IVF == exact brute force (same oracle as knn_cosine)
        "ann_ivf": """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       round(list_cosine_similarity(embedding::DOUBLE[], (SELECT qv::DOUBLE[] FROM q)), 5) AS score
FROM embeddings
ORDER BY list_cosine_similarity(embedding::DOUBLE[], (SELECT qv::DOUBLE[] FROM q)) DESC, vec_id DESC
LIMIT 10
""",
        # cross-field match for 'src8 data' under the reference's
        # per-field token-erase (src/index.cpp:1722-1731): neither field
        # knows the other's token, so the text query reduces to ['data']
        # and the source query to ['src8']; result = union, intersected
        # with the lang filter that keeps it inside the result window
        "multifield_search": _TOKS_CTE
        + """
, h AS (
  SELECT doc_id FROM toks2 WHERE term = 'data'
  UNION
  SELECT doc_id FROM documents WHERE source = 'src8'
)
SELECT h.doc_id FROM h
JOIN documents d ON d.doc_id = h.doc_id
WHERE d.lang = 'fr'
ORDER BY h.doc_id
""",
        # reference proximity ranking for the 2-token query 'data stream':
        # the sliding-window Match algorithm (include/match_score.h:106-216)
        # reduces, for two distinct tokens, to the min cross-position
        # distance: words=2 & distance=100-mindiff when mindiff<=10, else
        # words=1 & distance=100; packed (words<<16)|(255<<8)|distance,
        # ranked by (text_match desc, n_chars desc, doc_id desc)
        "reference_rank": """
WITH raw AS (
  SELECT doc_id, n_chars,
         string_split(replace(text, chr(10), ' '), ' ') AS slots
  FROM documents
),
idx AS (
  SELECT doc_id, slots, unnest(generate_series(1, len(slots))) AS i FROM raw
),
pos AS (
  SELECT doc_id,
         lower(regexp_replace(slots[i], '[^a-zA-Z0-9]', '', 'g')) AS term,
         i - 1 AS p
  FROM idx
),
md AS (
  SELECT a.doc_id, min(abs(a.p - b.p)) AS mindiff
  FROM (SELECT doc_id, p FROM pos WHERE term = 'data') a
  JOIN (SELECT doc_id, p FROM pos WHERE term = 'stream') b USING (doc_id)
  GROUP BY a.doc_id
)
SELECT d.doc_id,
       CAST(CASE WHEN m.mindiff <= 10
            THEN 2 * 65536 + 255 * 256 + (100 - m.mindiff)
            ELSE 1 * 65536 + 255 * 256 + 100 END AS BIGINT) AS text_match
FROM md m JOIN documents d USING (doc_id)
ORDER BY text_match DESC, d.n_chars DESC, d.doc_id DESC
LIMIT 20
""",
        # fake-decode dims are a pure function of payload length; payload
        # is the doc's utf-8 text, so strlen(text) recomputes them
        "multimodal_decode": """
SELECT doc_id AS media_id,
       CAST(16 + (strlen(text) * 31) % 992 AS INTEGER) AS height,
       CAST(16 + (strlen(text) * 7919) % 992 AS INTEGER) AS width,
       CAST(3 AS INTEGER) AS channels
FROM (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 64)
ORDER BY media_id
""",
        # the real audio pipeline's closed-form expectation: SynthToneWav
        # puts each tone exactly on an FFT bin (step = sr/n_samples = 2 Hz),
        # so the measured dominant_hz equals the synthesized frequency and
        # duration/sample counts are constants of the synthesizer
        "audio_features": """
SELECT doc_id AS media_id,
       CAST(8000 AS INTEGER) AS sample_rate,
       CAST(4000 AS BIGINT) AS n_samples,
       CAST(0.5 AS DOUBLE) AS duration_s,
       CAST(100.0 + 2.0 * (doc_id % 100) AS DOUBLE) AS dominant_hz
FROM documents
ORDER BY media_id
""",
        # real BMP decode: the synthesizer's dims are closed-form in
        # doc_id; a hash match proves the encoder→decoder byte round-trip
        "image_decode_real": """
SELECT doc_id AS media_id,
       CAST(8 + doc_id % 32 AS INTEGER) AS height,
       CAST(8 + (doc_id * 7) % 32 AS INTEGER) AS width,
       CAST(3 AS INTEGER) AS channels
FROM documents
ORDER BY media_id
""",
    }
    # dup_clusters: connected components over the EXACT same near-dup
    # pair derivation as ngram_jaccard_pairs, closed transitively with a
    # recursive CTE (reach = reflexive-transitive closure; cluster id =
    # min reachable node)
    _pairs_sql = d["ngram_jaccard_pairs"].strip().removesuffix("ORDER BY a, b")
    d["dup_clusters"] = f"""
WITH RECURSIVE pairs AS (
{_pairs_sql}
),
edges AS (
  SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs
),
reach(src, dst) AS (
  SELECT a, a FROM edges
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst
)
SELECT src AS node, MIN(dst) AS cluster FROM reach GROUP BY src ORDER BY node
"""
    # near_dedup: the same clusters, but emitting the CLEANED corpus —
    # every augmented doc except non-minimum cluster members
    _aug_body = _AUG_CTE.strip().removeprefix("WITH ")
    d["near_dedup"] = f"""
WITH RECURSIVE pairs AS (
{_pairs_sql}
),
edges AS (
  SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs
),
reach(src, dst) AS (
  SELECT a, a FROM edges
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst
),
cc AS (SELECT src AS node, MIN(dst) AS cluster FROM reach GROUP BY src),
{_aug_body}
SELECT g.doc_id FROM aug g
WHERE g.doc_id NOT IN (SELECT node FROM cc WHERE node > cluster)
ORDER BY g.doc_id
"""
    # redact_pii: the SAME compiled patterns, applied in the same order;
    # per-stage hit counts replicate python's count-then-replace sequence
    from typesense_ray.functions.text import PII_PATTERNS

    (_pe, _re_), (_pi, _ri), (_pp, _rp) = PII_PATTERNS
    d["redact_pii"] = f"""
WITH inj AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0 THEN
           text || ' contact user' || CAST(doc_id AS VARCHAR)
                || '@example.com at 10.0.'
                || CAST(doc_id % 256 AS VARCHAR) || '.1'
         ELSE text END AS t0
  FROM documents
),
s1 AS (SELECT doc_id, t0,
              regexp_replace(t0, '{_pe}', '{_re_}', 'g') AS t1 FROM inj),
s2 AS (SELECT *, regexp_replace(t1, '{_pi}', '{_ri}', 'g') AS t2 FROM s1)
SELECT doc_id,
       regexp_replace(t2, '{_pp}', '{_rp}', 'g') AS text,
       len(regexp_extract_all(t0, '{_pe}'))
         + len(regexp_extract_all(t1, '{_pi}'))
         + len(regexp_extract_all(t2, '{_pp}')) AS pii_hits
FROM s2 ORDER BY doc_id
"""
    # prepare_corpus: the full prep chain composed from the SAME verified
    # fragments — redaction regexps (redact_pii), repetition fractions
    # (rep_filter), min-doc-per-text winners (exact_dedup), token-window
    # chunking (chunk_docs) — applied in pipeline order
    d["prepare_corpus"] = f"""
WITH s1 AS (SELECT doc_id,
                   regexp_replace(text, '{_pe}', '{_re_}', 'g') AS t1
            FROM documents),
s2 AS (SELECT doc_id, regexp_replace(t1, '{_pi}', '{_ri}', 'g') AS t2
       FROM s1),
red AS (SELECT doc_id, regexp_replace(t2, '{_pp}', '{_rp}', 'g') AS text
        FROM s2),
lt0 AS (
  SELECT doc_id, text,
         list_filter(
           list_transform(string_split(replace(text, chr(10), ' '), ' '),
             t -> lower(regexp_replace(t, '[^a-zA-Z0-9]', '', 'g'))),
           t -> t <> '') AS toks
  FROM red
),
uni AS (
  SELECT doc_id, max(c) * 1.0 / sum(c) AS tf_top
  FROM (SELECT doc_id, term, count(*) AS c
        FROM (SELECT doc_id, unnest(toks) AS term FROM lt0)
        GROUP BY doc_id, term)
  GROUP BY doc_id
),
ng2 AS (
  SELECT doc_id, array_to_string(toks[i : i + 1], ' ') AS g
  FROM lt0, unnest(CASE WHEN len(toks) >= 2
                        THEN range(1, len(toks)) ELSE [] END) AS u(i)
),
big AS (SELECT doc_id, 1.0 - count(DISTINCT g) * 1.0 / count(*) AS dup2
        FROM ng2 GROUP BY doc_id),
tok AS (SELECT doc_id,
               len(list_filter(string_split_regex(text, '\\s+'),
                               x -> x <> '')) AS ws
        FROM red),
surv AS (
  SELECT r.doc_id, r.text, lt0.toks
  FROM red r
  JOIN lt0 ON lt0.doc_id = r.doc_id
  LEFT JOIN uni ON uni.doc_id = r.doc_id
  LEFT JOIN big ON big.doc_id = r.doc_id
  JOIN tok ON tok.doc_id = r.doc_id
  WHERE coalesce(uni.tf_top, 0.0) <= 0.3
    AND coalesce(big.dup2, 0.0) <= 0.2
    AND tok.ws BETWEEN 10 AND 100000
),
win AS (SELECT min(doc_id) AS doc_id FROM surv GROUP BY text),
wdocs AS (SELECT s.doc_id, s.toks FROM surv s JOIN win USING (doc_id))
SELECT doc_id,
       CAST((i - 1) / 48 AS BIGINT) AS chunk_id,
       CAST(least(i + 63, len(toks)) - i + 1 AS BIGINT) AS n_chunk_tokens,
       array_to_string(toks[i : least(i + 63, len(toks))], ' ') AS chunk_text
FROM wdocs,
     unnest(CASE WHEN len(toks) >= 1
                 THEN range(1, len(toks) + 1, 48) ELSE [] END) AS u(i)
ORDER BY doc_id, chunk_id
"""
    # clean_corpus: exact-dedup winners ∩ langid == 'en' ∩ ws tokens >= 10,
    # composed from the SAME langid derivation the langid oracle uses
    _lang_sql = d["langid"].strip().removesuffix("ORDER BY doc_id")
    d["clean_corpus"] = f"""
WITH pred AS (
{_lang_sql}
),
win AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
q AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
           AS n_tokens
  FROM documents
)
SELECT p.doc_id, p.lang_pred, q.n_tokens
FROM pred p
JOIN win USING (doc_id)
JOIN q USING (doc_id)
WHERE p.lang_pred = 'en' AND q.n_tokens >= 10
ORDER BY p.doc_id
"""
    return d
