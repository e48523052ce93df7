"""Structured Streaming surface (F18).

The reference is a pure batch kernel (no streaming exists in
Sayan751/email-address-parser — SURVEY.md §2F F18), but a transcripts feed at
10^12-turn scale is naturally a stream: new conversation turns land
continuously. This module re-uses the SAME batch operators on an unbounded
DataFrame — `extract_mentions` is stateless/narrow (filter → posexplode →
ArrowEvalPython → project), so it is streaming-safe unchanged; only the
aggregation needs watermark + window semantics.

Deployment shape at scale: readStream from the Iceberg/Kafka landing zone →
mentions → (a) append sink of parsed mentions (the ER pipeline's incremental
input; the batch blocking/scoring/CC stages then run on checkpointed
micro-batch outputs), (b) watermarked per-domain windowed counts for
monitoring/skew detection (feeds the hot-domain salting threshold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..operators.extract import extract_mentions, with_canonical

TRANSCRIPTS_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("text", StringType()),
        StructField("tool", StringType()),
        StructField("ts", TimestampType()),
    ]
)


def read_transcript_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 8
) -> DataFrame:
    """File-based streaming source over a transcripts directory (sandbox
    analog of the Kafka/Iceberg landing zone; schema is the driver's
    input_hint contract)."""
    return (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_mentions(transcripts: DataFrame) -> DataFrame:
    """Unbounded mentions stream: identical operator chain as batch — the
    whole point of declaring the plan with the DataFrame API (Catalyst plans
    it incrementally; the pandas UDF runs per micro-batch)."""
    with_ts = transcripts.withColumn("_ts", F.col("ts"))
    return with_canonical(extract_mentions(with_ts, passthrough=("_ts",)))


def windowed_domain_counts(
    mentions: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-domain mention counts in event-time windows with late-data
    tolerance = watermark; state is bounded (windows older than the
    watermark are finalized and evicted)."""
    return (
        mentions.withWatermark("_ts", watermark)
        .where(F.col("valid_lax"))
        .groupBy(F.window(F.col("_ts"), window), F.col("domain_canon"))
        .agg(
            F.count(F.lit(1)).alias("n_mentions"),
            F.approx_count_distinct("email").alias("approx_distinct_emails"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "domain_canon",
            "n_mentions",
            "approx_distinct_emails",
        )
    )


def conversation_state_counts(
    mentions: DataFrame,
    timeout_minutes: int = None,
) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-conversation
    running totals of mentions / valid mentions / distinct domains, emitted
    as an update row per micro-batch that touches the conversation.

    timeout_minutes: on a continuous deployment pass an inactivity timeout —
    state for quiet conversations is evicted (bounded state, the requirement
    for an unbounded 10^12-turn stream). Leave None for availableNow /
    drain-style runs: with a ProcessingTimeTimeout pending, an availableNow
    trigger keeps firing empty "cleaning up state" micro-batches until the
    timeout elapses and never terminates.

    This is the pattern for ER-adjacent streaming accumulators that
    windowed aggregation can't express (distinct-set state carried across
    windows, per-key custom eviction)."""
    import pandas as pd  # noqa: F401 (used by the worker closure)
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    state_schema = StructType(
        [
            StructField("n_mentions", LongType()),
            StructField("n_valid", LongType()),
            StructField("domains", StringType()),  # '\x1f'-joined distinct set
        ]
    )
    output_schema = StructType(
        [
            StructField("conv_id", StringType()),
            StructField("n_mentions", LongType()),
            StructField("n_valid", LongType()),
            StructField("n_distinct_domains", IntegerType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (conv_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        n_mentions, n_valid, domains = 0, 0, set()
        if state.exists:
            n_mentions, n_valid, joined = state.get
            domains = set(joined.split("\x1f")) if joined else set()
        for pdf in pdfs:
            n_mentions += len(pdf)
            n_valid += int(pdf["valid_lax"].fillna(False).sum())
            domains |= set(pdf.loc[pdf["valid_lax"].fillna(False), "domain_canon"].dropna())
        state.update((n_mentions, n_valid, "\x1f".join(sorted(domains))))
        if timeout_minutes is not None:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame(
            [
                {
                    "conv_id": conv_id,
                    "n_mentions": n_mentions,
                    "n_valid": n_valid,
                    "n_distinct_domains": len(domains),
                }
            ]
        )

    return (
        mentions.select("conv_id", "valid_lax", "domain_canon")
        .groupBy("conv_id")
        .applyInPandasWithState(
            update,
            outputStructType=output_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if timeout_minutes is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def run_once_to_memory(
    stream_df: DataFrame, query_name: str, output_mode: str = "append"
) -> None:
    """Drain all available input into an in-memory sink (test/driver helper;
    prod uses format('iceberg')/'parquet' with checkpointLocation)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Continuous-ingestion exact dedup: emit each normalized-text
    fingerprint ONCE across micro-batches (G1's streaming twin).

    State is bounded by `dropDuplicatesWithinWatermark`: fingerprints whose
    event time falls behind the watermark are EVICTED (plain
    dropDuplicates(["fp_md5"]) would keep every fingerprint ever seen —
    unbounded state on a continuous stream). State size is therefore
    (unique docs per watermark horizon), not (all docs ever); a duplicate
    arriving after its original left the horizon is re-emitted, which is
    exactly the contract of dedup-at-the-door — the periodic batch dedup
    (operators/dedup.py) remains the ground-truth compactor behind it.
    Fingerprint = md5(normalized text), identical to exact_dedup's."""
    from ..functions.text_analysis import normalized_text

    fp = docs.select(
        F.col(id_col),
        F.col(ts_col),
        F.md5(normalized_text(F.col(text_col))).alias("fp_md5"),
    )
    return fp.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["fp_md5"]
    )
