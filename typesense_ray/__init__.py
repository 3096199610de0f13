"""typesense_ray — a Ray-Data-native full-text index + BM25 query engine.

A from-scratch rebuild of the capabilities of the reference engine
(voldyman/typesense, C++; see SURVEY.md) expressed idiomatically on
``ray.data.Dataset``:

- tokenize/validate/triple-emit as vectorized ``map_batches`` stages over
  zero-copy Arrow batches,
- posting-list construction in stateful SegmentWriter actor pools producing
  durable, content-addressed Parquet segments (delta+varbyte doc ids,
  block-max skip metadata, per-partition manifests → checkpoint-resume),
- global term statistics via the only wide shuffle in the build
  (a ``groupby("term")`` over tiny (term, df) rows),
- BM25 (k1=1.2, b=0.75) top-k queries fanned out over segments with a
  small driver-side merge, plus a reference-semantics scorer for
  rank-identity conformance (SURVEY.md §7.0).
"""

from typesense_ray.auth import ApiKey, AuthManager, generate_scoped_key
from typesense_ray.tokenizer import tokenize, normalize_token, doc_term_positions
from typesense_ray.codec import (
    varbyte_encode,
    varbyte_decode,
    delta_encode,
    delta_decode,
)

__all__ = [
    "ApiKey",
    "AuthManager",
    "generate_scoped_key",
    "tokenize",
    "normalize_token",
    "doc_term_positions",
    "varbyte_encode",
    "varbyte_decode",
    "delta_encode",
    "delta_decode",
]

__version__ = "0.1.0"
