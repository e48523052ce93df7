"""Benchmark decontamination: word n-gram overlap between a training corpus
and an evaluation/benchmark set.

Standard LLM training-data hygiene (GPT-3 appendix C, PaLM §7, The Pile):
a training document is contaminated when it shares enough word n-grams with
any benchmark document. Expressed Spark-first:

  * tokenize + n-gram both sides with Catalyst-only expressions
    (regexp_extract_all → transform/slice/array_join — no Python hop);
  * the benchmark gram set is DISTINCT and **broadcast**: real benchmark
    suites are a few million grams against a 100 TB corpus, so the probe is
    a map-side hash semi-join — the corpus is never shuffled;
  * per-doc overlap is one groupBy(doc_id) count after the broadcast join;
    zero-overlap (and zero-gram) docs are preserved via a final left join
    against the training keys.

Every expression is DuckDB-replayable (same regex class, same slice/join
semantics), so the driver query `doc_decontam` carries a full SQL oracle
(oracles.doc_decontam_oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_N = 8
DEFAULT_THRESHOLD = 0.5

# lowercase alnum word runs — the tokenizer both engines evaluate identically
_TOKEN_SQL = "regexp_extract_all(lower({col}), '[a-z0-9]+', 0)"


def word_ngrams(text_col: str, n: int = DEFAULT_N) -> Column:
    """Array of space-joined word n-grams of `text_col` (empty when the doc
    has fewer than n word tokens). sequence(1, k) is guarded because Spark's
    sequence DESCENDS when k < 1 rather than returning empty."""
    toks = _TOKEN_SQL.format(col=text_col)
    return F.expr(
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"transform(sequence(1, size({toks}) - {n} + 1), "
        f"i -> array_join(slice({toks}, i, {n}), ' ')) "
        f"ELSE array() END"
    )


def ngram_decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = DEFAULT_N,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = DEFAULT_THRESHOLD,
    broadcast_grams: bool = None,
    broadcast_max_grams: int = 5_000_000,
) -> DataFrame:
    """→ (doc_id, n_grams, n_shared, contamination, contaminated) per train
    doc: distinct n-gram count, distinct grams also present anywhere in the
    benchmark set, their ratio (6 dp), and the flag `contamination >=
    threshold`.

    broadcast_grams gates the probe strategy. A typical benchmark suite is a
    few million distinct grams — broadcastable, so the corpus side never
    shuffles before its one groupBy(doc_id). But the dim is DATA, not config:
    a 10M-example benchmark's gram dim can exceed executor memory, so above
    `broadcast_max_grams` (None = measure with one cheap count over the
    already-distinct dim) the probe falls back to a shuffled left join —
    identical result, one extra exchange of the corpus gram stream on `gram`.
    Plan-tested both ways (tests/test_decontam.py)."""
    grams = word_ngrams(text_col, n)
    train_grams = (
        train.select(F.col(id_col), F.explode(grams).alias("gram"))
        .dropDuplicates([id_col, "gram"])
    )
    bench_grams = benchmark.select(F.explode(grams).alias("gram")).distinct()
    if broadcast_grams is None:
        broadcast_grams = bench_grams.count() <= broadcast_max_grams
    probe = bench_grams.withColumn("_hit", F.lit(1))
    # above the gate the hint must actively FORBID broadcast (Spark's size
    # estimator would otherwise still pick BroadcastHashJoin from stats and
    # build the over-sized hash table on every executor); merge = sort-merge,
    # the safe strategy for a build side that cannot be assumed to fit
    probe = F.broadcast(probe) if broadcast_grams else probe.hint("merge")

    # one probe + ONE groupBy(doc_id) produces both counts — the corpus-side
    # gram stream is shuffled at most once before doc_id (zero times when the
    # probe is broadcast)
    counts = (
        train_grams.join(probe, "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_shared"),
        )
    )

    contamination = F.round(
        F.col("n_shared") / F.greatest(F.col("n_grams"), F.lit(1)).cast("double"), 6
    )
    return (
        train.select(id_col)
        .join(counts, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            F.coalesce(F.col("n_shared"), F.lit(0)).alias("n_shared"),
        )
        .withColumn("contamination", contamination)
        .withColumn("contaminated", contamination >= F.lit(threshold))
    )
