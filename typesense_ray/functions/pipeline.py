"""Composed corpus-cleaning pipeline — the shape a real training-data
prep run takes: exact dedup → per-row scoring (language ID + token
count fused into ONE actor-pool pass, so the corpus is read and
decoded once) → vectorized keep/drop filter.

Everything streams: exact_dedup's winner semi-join is a broadcast
(`ray.put` + ``pc.is_in``), and the scoring stage is a callable class
(`LangId` patterns compiled once per actor) that appends its columns
and filters within the same batch — no second pass, no shuffle after
the dedup aggregate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class _ScoreAndFilter:
    """Actor-pool stage: langid + whitespace token count on one decoded
    batch, then the keep predicate applied vectorized."""

    def __init__(self, keep_langs: tuple[str, ...], min_tokens: int):
        from typesense_ray.functions.text import LangId

        self.langid = LangId()
        self.keep_langs = set(keep_langs)
        self.min_tokens = min_tokens

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from typesense_ray.functions.text import ws_token_counts

        scored = self.langid(batch)
        # ASCII-gated Arrow count (RE2) with a Unicode-exact fallback —
        # same kernel as token_counts; no to_pylist on the hot path
        ntok = ws_token_counts(batch["text"])
        scored = scored.append_column("n_tokens", pa.array(ntok, pa.int64()))
        keep = pc.and_(
            pc.is_in(
                scored["lang_pred"],
                value_set=pa.array(sorted(self.keep_langs)),
            ),
            pc.greater_equal(scored["n_tokens"], self.min_tokens),
        )
        return scored.filter(keep)


def clean_corpus(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_langs: tuple[str, ...] = ("en",),
    min_tokens: int = 10,
    concurrency: int = 8,
):
    # the pool autoscales from ONE actor so it can never reserve every
    # logical CPU and starve the upstream read tasks (a fixed pool of
    # size == num_cpus deadlocks the pipeline on small machines)
    """Exact-dedup winners that pass language + length filters.

    Returns a Dataset with (id_col, text, lang_pred, lang_conf,
    n_tokens) for the surviving rows.
    """
    from typesense_ray.functions.dedup import exact_dedup

    survivors = exact_dedup(ds, text_col=text_col, id_col=id_col)
    return survivors.map_batches(
        _ScoreAndFilter,
        fn_constructor_kwargs={
            "keep_langs": keep_langs,
            "min_tokens": min_tokens,
        },
        batch_format="pyarrow",
        concurrency=(1, concurrency),
    )


def _redact_score_filter(
    batch: pa.Table, min_tokens: int, max_tokens: int
) -> pa.Table:
    """Stateless stage fusing three per-row passes over ONE decoded
    batch: PII redaction, repetition stats, token count — then the
    vectorized keep predicate. One read, one decode, no intermediate
    materialization between passes. A plain task (not an actor pool):
    the regexes are compiled once per worker process at module import,
    so there is no per-actor state to justify spawn latency."""
    import pyarrow.compute as pc

    from typesense_ray.functions.text import (
        redact_pii_batch,
        repetition_stats_batch,
        token_count_batch,
    )

    red = redact_pii_batch(batch, "text")
    scored = repetition_stats_batch(red, "text")
    scored = token_count_batch(scored, "text")
    keep = pc.and_(
        pc.equal(scored["keep_rep"], 1),
        pc.and_(
            pc.greater_equal(scored["ws_tokens"], min_tokens),
            pc.less_equal(scored["ws_tokens"], max_tokens),
        ),
    )
    return scored.filter(keep).select(["doc_id", "text"])


def prepare_corpus(
    ds,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    window: int = 64,
    stride: int = 48,
    concurrency: int = 8,
):
    """The full training-data prep chain as ONE streaming pipeline:

        redact PII → repetition + length filter (fused actor-pool
        pass) → exact-dedup winners (two-stage aggregate + broadcast
        semi-join) → overlapping token-window chunking

    Returns a Dataset of (doc_id, chunk_id, n_chunk_tokens, chunk_text)
    ready for packing/sharding. Every stage is a batch transform; the
    only exchange is exact_dedup's hash aggregate."""
    from typesense_ray.functions.dedup import exact_dedup
    from typesense_ray.functions.text import chunk_docs_batch

    filtered = ds.map_batches(
        _redact_score_filter,
        fn_kwargs={"min_tokens": min_tokens, "max_tokens": max_tokens},
        batch_format="pyarrow",
    )
    # exact_dedup consumes its input three times (row count for the
    # auto reduce, the hash pass, the winner semi-join). For a SOURCE
    # dataset that's three cheap parquet re-reads; for this computed
    # stage it would re-run the regex-heavy redaction 3× — materialize
    # once instead (object-store blocks, spills at scale).
    filtered = filtered.materialize()
    winners = exact_dedup(filtered, text_col="text", id_col="doc_id")
    return winners.map_batches(
        lambda b: chunk_docs_batch(b, window=window, stride=stride),
        batch_format="pyarrow",
    )
