"""Sequence packing for LLM training-data pipelines: assign every
document a (pack_id, pack_off) position in a stream of fixed
token-budget packs, deterministically, at any scale.

Semantics — *token-offset sharding*: documents are laid out in
``id_col`` order as one contiguous token stream; a pack is a
``budget``-token slice of that stream, and a document belongs to the
pack containing its FIRST token (so a pack can overrun by at most one
document's length — the contiguous variant used for corpus sharding,
as opposed to first-fit bin packing whose bin state is inherently
sequential and neither distributable nor SQL-expressible).

Distributed shape (the classic two-level prefix-sum — no stage ever
sees more than one range's rows):

1. ``map_batches``: vectorized token count per doc + coarse range key
   ``part = doc_id // group_rows`` (monotonic in doc_id, so ranges
   respect the global order; ids only need to be non-negative, not
   dense). The text column is DROPPED here — everything downstream
   moves (int64 × 3) rows, ~24 B/doc, which is why materializing this
   reduced table (consumed twice: range sums + final groupby) is cheap
   even when the input corpus is 100 TB.
2. Per-range token sums: per-block partials (≤ ranges × blocks tiny
   rows) folded on the driver into an EXCLUSIVE prefix over ranges,
   broadcast via ``ray.put``.
3. ``groupby(part).map_groups``: the one shuffle; each range sorts by
   id, local exclusive cumsum + its broadcast range offset →
   ``pack_id = off // budget``, ``pack_off = off % budget``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def pack_sequences(
    ds,
    budget: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_col: str | None = None,
    group_rows: int = 8192,
    stream_max_rows: int = 5_000_000,
):
    """Return a Dataset of (id_col, n_tokens, pack_id, pack_off).

    ``token_col``: use a precomputed token-count column instead of
    counting whitespace tokens of ``text_col``. ``stream_max_rows``:
    range-sum partials beyond this count reduce through a distributed
    groupby Sum instead of the driver fold.
    """
    import ray

    def count_tokens(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if token_col is not None:
            ntok = batch[token_col].to_numpy(zero_copy_only=False)
            ntok = ntok.astype(np.int64)
        else:
            import pandas as pd

            s = pd.Series(batch[text_col].to_pylist()).fillna("")
            ntok = s.str.count(r"\S+").to_numpy(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "n_tokens": pa.array(ntok, pa.int64()),
                "part": pa.array(ids // group_rows, pa.int64()),
            }
        )

    tok = ds.map_batches(count_tokens, batch_format="pyarrow").materialize()

    # stage 2: per-range sums → driver exclusive prefix (≤ parts×blocks
    # partial rows; the per-part table itself is |docs| / group_rows)
    def part_sums(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {"part": batch["part"].to_numpy(), "s": batch["n_tokens"].to_numpy()}
        )
        g = df.groupby("part", as_index=False)["s"].sum()
        return pa.table(
            {"part": pa.array(g["part"], pa.int64()),
             "s": pa.array(g["s"], pa.int64())}
        )

    # auto reduce, same contract as dedup.py: the per-(block, part)
    # partial count is bounded by blocks × parts only when ids arrive
    # block-contiguous; on shuffled ids it can approach the row count,
    # so past the stream bound the fold goes through a distributed
    # single-key Sum and the driver only ever sees |parts| rows.
    import pandas as pd

    partials_ds = tok.map_batches(
        part_sums, batch_format="pyarrow"
    ).materialize()
    if partials_ds.count() > stream_max_rows:
        from ray.data.aggregate import Sum

        psums = (
            partials_ds.groupby("part")
            .aggregate(Sum("s", alias_name="s"))
            .to_pandas()
            .sort_values("part")
        )
    else:
        psums = (
            pd.DataFrame(partials_ds.take_all())
            .groupby("part", as_index=False)["s"]
            .sum()
            .sort_values("part")
        )
    offs = np.concatenate(([0], np.cumsum(psums["s"].to_numpy())[:-1]))
    part_off = dict(zip(psums["part"].to_numpy().tolist(), offs.tolist()))
    off_ref = ray.put(part_off)

    def place(g: "pd.DataFrame") -> "pd.DataFrame":
        import ray as _ray

        g = g.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        ntok = g["n_tokens"].to_numpy(np.int64)
        base = _ray.get(off_ref)[int(g["part"].iloc[0])]
        off = base + np.cumsum(ntok) - ntok
        return pd.DataFrame(
            {
                id_col: g[id_col],
                "n_tokens": g["n_tokens"],
                "pack_id": off // budget,
                "pack_off": off % budget,
            }
        )

    return tok.groupby("part").map_groups(place, batch_format="pandas")
