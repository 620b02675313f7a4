"""Text analysis operators: language-ID heuristic, quality scoring,
token counting, document fingerprinting. All built-in column
expressions (codegen'd, no UDFs) and integer/exact arithmetic where
possible so every op is DuckDB-oracle-checkable."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny function-word lists for the n-gram language heuristic
LANG_MARKERS = {
    "en": ["the", "of", "and"],
    "de": ["der", "die", "und"],
    "fr": ["le", "la", "et"],
    "es": ["el", "los", "que"],
}
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is"]


def _count_token(text_col, word: str) -> F.Column:
    """Occurrences of a whole token (space-delimited) in the text."""
    padded = F.concat(F.lit(" "), text_col, F.lit(" "))
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(f" {word} "), F.lit(" "))))
        / (F.length(F.lit(f"{word} ")))
    ).cast("int")


def token_count(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish subword pieces (alnum runs /
    punctuation as separate tokens) — the two standard size metrics."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        F.size(F.split(t, " ")).alias("ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit("[a-zA-Z0-9]+|[^a-zA-Z0-9 ]"), 0)).alias("bpe_ish_tokens"),
        F.length(t).alias("n_chars"),
    )


def _quality_exprs(t) -> dict[str, F.Column]:
    """The quality-feature column expressions over a text column —
    shared by :func:`quality_score` and :func:`quality_lang` so the
    fused one-pass form is identical by construction."""
    n_tokens = F.size(F.split(t, " "))
    n_chars = F.length(t)
    stop_hits = None
    for wrd in STOPWORDS:
        c = _count_token(t, wrd)
        stop_hits = c if stop_hits is None else stop_hits + c
    stop_ratio = F.round(stop_hits / n_tokens, 4)
    mean_tok_len = F.round((n_chars - (n_tokens - 1)) / n_tokens, 4)
    score = F.round(
        F.when(n_tokens < 5, 0.0).otherwise(
            F.least(F.lit(1.0), n_tokens / F.lit(100.0)) * (F.lit(1.0) - stop_ratio)
        ),
        4,
    )
    return {
        "n_tokens": n_tokens,
        "stopword_ratio": stop_ratio,
        "mean_token_len": mean_tok_len,
        "quality_score": score,
    }


def _predicted_lang(t) -> F.Column:
    """Marker-hit argmax with fixed precedence (shared expression
    builder — see :func:`_quality_exprs`)."""
    scores = {lang: None for lang in LANG_MARKERS}
    for lang, words in LANG_MARKERS.items():
        s = None
        for wrd in words:
            c = _count_token(t, wrd)
            s = c if s is None else s + c
        scores[lang] = s
    best = F.lit("und")
    best_score = F.lit(0)
    # fixed precedence: earlier language wins ties (strictly-greater test)
    for lang in ["en", "de", "fr", "es"]:
        cond = scores[lang] > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return best


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality features: length, mean token length, stopword
    ratio, and a composite score. Mirrors the common pretraining-data
    quality filters (Gopher/C4-style rules)."""
    q = _quality_exprs(F.col(text_col))
    return docs.select(
        F.col(id_col), *[expr.alias(name) for name, expr in q.items()]
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """N-gram(word)-marker language heuristic: argmax of marker-token
    hits, ties broken by a fixed language order, 'und' (undetermined)
    when nothing hits."""
    return docs.select(
        F.col(id_col),
        F.col("lang").alias("labeled_lang"),
        _predicted_lang(F.col(text_col)).alias("predicted_lang"),
    )


def quality_lang(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """quality_score + predicted_lang in ONE projection pass — for
    composed pipelines that otherwise self-join the two operators'
    outputs on the id (two scans of the same input + a join for
    column expressions that are independent per row). Exactly the
    same expressions as the two operators (shared builders)."""
    t = F.col(text_col)
    q = _quality_exprs(t)
    return docs.select(
        F.col(id_col),
        *[expr.alias(name) for name, expr in q.items()],
        _predicted_lang(t).alias("predicted_lang"),
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Content fingerprint: md5 over the whitespace/caseness-normalized
    text (the cheap rolling-hash analogue), 16-hex truncated."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), " +", " ")
    return docs.select(
        F.col(id_col),
        F.substring(F.md5(norm), 1, 16).alias("fp"),
    )


# PII patterns kept to syntax shared by Java regex (Spark) and RE2
# (DuckDB): character classes, bounded repetition, alternation — no
# backreferences or lookaround, so both engines redact identically.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def redact_pii(
    docs: DataFrame, text_col: str = "text", kinds: list[str] | None = None
) -> DataFrame:
    """Pretraining-corpus PII scrub: emails, phone numbers, and IPv4
    addresses become ``<KIND>`` placeholders, with per-kind hit counts
    for audit (the counts are computed BEFORE redaction from the same
    pattern, so count==0 iff the text is untouched for that kind).
    Vectorized regexp_replace — JVM codegen, no UDF; order of
    application is the dict order (email first, so phone/ip patterns
    never see address-like digit runs inside emails)."""
    t = F.col(text_col)
    out = docs
    for kind in kinds or list(PII_PATTERNS):
        pat = PII_PATTERNS[kind]
        out = out.withColumn(
            f"n_{kind}", F.size(F.regexp_extract_all(t, F.lit(pat), 0))
        )
    redacted = t
    for kind in kinds or list(PII_PATTERNS):
        redacted = F.regexp_replace(redacted, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return out.withColumn(text_col, redacted)


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition features for corpus filtering: the
    fraction of bigrams taken by the single most frequent bigram, and
    the distinct-token ratio. Boilerplate / degenerate generations
    score high top_bigram_frac and low distinct_token_ratio. Exact
    integer counts → cross-engine-reproducible after one ROUND."""
    t = F.split(F.col(text_col), " ")
    bigrams = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat_ws(" ", F.element_at(t, i), F.element_at(t, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    per_bigram = (
        docs.select(F.col(id_col).alias("id"), F.explode(bigrams).alias("bg"))
        .groupBy("id", "bg")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rep = per_bigram.groupBy("id").agg(
        F.max("n").alias("top_n"), F.sum("n").alias("total_n")
    )
    base = docs.select(
        F.col(id_col).alias("id"),
        F.size(t).alias("n_tokens"),
        F.round(F.size(F.array_distinct(t)) / F.size(t), 4).alias("distinct_token_ratio"),
    )
    return (
        base.join(rep, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            "distinct_token_ratio",
            F.round(
                F.coalesce(F.col("top_n") / F.col("total_n"), F.lit(0.0)), 4
            ).alias("top_bigram_frac"),
        )
    )
