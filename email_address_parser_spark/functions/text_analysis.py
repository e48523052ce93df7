"""Text-analysis operators for the training-data pipeline over `documents`.

Everything here is pure Catalyst (builtin `pyspark.sql.functions`, JVM-side,
whole-stage-codegen) — no Python UDFs in any hot path. Each operator has a
dialect-neutral formulation so the DuckDB oracles in `__spark_entry__` can
replay it verbatim:

  * token counting       — whitespace tokens, word tokens, BPE-ish subtokens
  * quality scoring      — char-class ratios + stopword ratio + length prior
  * language ID          — marker-stopword counting (en/de/fr/es) + CJK chars
  * fingerprinting       — md5 over whitespace-normalized text, plus a
                           winnowing fingerprint (k-gram rolling hashes,
                           window minima) for near-dup detection at scale

Reference anchor: the reference repo is a string-processing kernel
(`rust-lib/src/nom_parser.rs`) — the same "precompile the pattern, stream the
corpus through it" discipline applies; here the "patterns" are Catalyst regex
expressions evaluated inside codegen, so a 1000-executor scan parallelizes
with zero Python worker traffic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# -- shared regexes (keep in sync with the oracle SQL in __spark_entry__) -------

TOKEN_RE = r"\S+"
WORD_RE = r"[A-Za-z0-9]+"
SUBTOKEN_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"
STOPWORD_RE = r"\b(the|a|an|and|or|of|to|in|is|it)\b"

LANG_MARKERS = {
    "en": r"\b(the|and|is|of|to|in|that)\b",
    "de": r"\b(der|die|und|das|ist|nicht|ein)\b",
    "fr": r"\b(le|les|et|est|une|dans|pour)\b",
    "es": r"\b(el|los|las|y|es|una|que)\b",
}
CJK_RE = "[一-鿿]"

# winnowing parameters (fixed: part of the fingerprint definition)
WINNOW_K = 8  # k-gram length in chars
WINNOW_W = 4  # window size in grams


def normalized_text(col: Column) -> Column:
    """Lowercased, whitespace-collapsed, trimmed text (matching canon)."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n_tokens (whitespace), n_words (alnum runs), n_subtokens (BPE-ish:
    letter runs + single digits + single punctuation)."""
    t = F.col(text_col)
    return (
        df.withColumn("n_tokens", F.regexp_count(t, F.lit(TOKEN_RE)))
        .withColumn("n_words", F.regexp_count(t, F.lit(WORD_RE)))
        .withColumn("n_subtokens", F.regexp_count(t, F.lit(SUBTOKEN_RE)))
    )


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Char-class ratios + stopword ratio + a length prior, combined into
    quality_score ∈ [0,1]. All ratios rounded to 6 decimals at the output."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_ws = F.regexp_count(t, F.lit(r"\s"))
    n_alpha = F.regexp_count(t, F.lit("[A-Za-z]"))
    n_digit = F.regexp_count(t, F.lit("[0-9]"))
    n_tokens = F.regexp_count(t, F.lit(TOKEN_RE))
    n_stop = F.regexp_count(F.lower(t), F.lit(STOPWORD_RE))

    denom_c = F.greatest(n_chars, F.lit(1)).cast("double")
    denom_t = F.greatest(n_tokens, F.lit(1)).cast("double")
    alpha_ratio = n_alpha.cast("double") / denom_c
    other_ratio = (n_chars - n_ws - n_alpha - n_digit).cast("double") / denom_c
    stop_ratio = n_stop.cast("double") / denom_t
    avg_token_len = (n_chars - n_ws).cast("double") / denom_t
    length_prior = F.least(n_tokens.cast("double") / F.lit(100.0), F.lit(1.0))
    score = (
        F.lit(0.4) * alpha_ratio
        + F.lit(0.3) * (F.lit(1.0) - other_ratio)
        + F.lit(0.3) * length_prior
    )
    return (
        df.withColumn("n_chars_m", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn("alpha_ratio", F.round(alpha_ratio, 6))
        .withColumn("other_ratio", F.round(other_ratio, 6))
        .withColumn("stop_ratio", F.round(stop_ratio, 6))
        .withColumn("avg_token_len", F.round(avg_token_len, 6))
        .withColumn("quality_score", F.round(score, 6))
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-stopword language ID. Scores = marker hits per language (CJK =
    han char count); prediction = first max in fixed order en>de>fr>es>zh,
    'und' when all scores are zero. Deterministic, oracle-replayable."""
    low = F.lower(F.col(text_col))
    s = {k: F.regexp_count(low, F.lit(p)) for k, p in LANG_MARKERS.items()}
    s["zh"] = F.regexp_count(F.col(text_col), F.lit(CJK_RE))
    order = ["en", "de", "fr", "es", "zh"]
    best = F.greatest(*[s[k] for k in order])
    pred = F.when(best == 0, F.lit("und"))
    for k in order:
        pred = pred.when(s[k] == best, F.lit(k))
    out = df
    for k in order:
        out = out.withColumn(f"score_{k}", s[k])
    return out.withColumn("lang_pred", pred)


def with_md5_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact-dup fingerprint: md5 of the normalized text."""
    return df.withColumn("fp_md5", F.md5(normalized_text(F.col(text_col))))


def _gram_hash(gram: Column) -> Column:
    """Deterministic 60-bit integer hash of a k-gram, identical in Spark and
    DuckDB: first 15 hex chars of md5, parsed base-16."""
    return F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long")


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> DataFrame:
    """Winnowing document fingerprint (Schleimer et al., SIGMOD'03): hash all
    k-char grams of the normalized text, keep the minimum of each w-gram
    window, emit distinct selected hashes as (id, gram_hash) rows.

    Two near-duplicate documents share most fingerprints, so a groupBy on
    gram_hash is a scalable (shuffle-once) near-dup candidate generator.
    Entirely Catalyst higher-order functions — no Python.

    Each intermediate (norm, grams) is materialized as a real column before
    the next higher-order function consumes it: Catalyst inlines lambda-free
    subexpressions into every element evaluation otherwise (no CSE inside
    HOF lambdas), which turns O(n) into O(n·cost(norm))."""
    norm_col = F.col("_winnow_norm")
    n_grams = F.greatest(F.length(norm_col) - F.lit(k - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), n_grams), lambda i: _gram_hash(norm_col.substr(i, F.lit(k)))
    )
    grams_col = F.col("_winnow_grams")
    n_wins = F.greatest(F.size(grams_col) - F.lit(w - 1), F.lit(1))
    wins = F.transform(
        F.sequence(F.lit(1), n_wins),
        lambda j: F.array_min(F.slice(grams_col, j, w)),
    )
    fp = F.array_sort(F.array_distinct(wins))
    return (
        df.withColumn("_winnow_norm", normalized_text(F.col(text_col)))
        .withColumn("_winnow_grams", grams)
        .select(F.col(id_col), F.explode(fp).alias("gram_hash"))
    )
