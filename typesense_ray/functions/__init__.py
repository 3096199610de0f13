"""Large-scale training-data pipeline operators (dedup, similarity,
text analysis, multimodal plumbing) — Ray-Data-first, Arrow batches."""
