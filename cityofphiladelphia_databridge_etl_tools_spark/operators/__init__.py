"""DataFrame-level operators: merge/upsert, dedup, similarity, text
analysis, transforms, diffs. All set-oriented — no per-row Python in
any hot path (Arrow-vectorized pandas UDFs only where built-ins can't
express the semantics)."""
