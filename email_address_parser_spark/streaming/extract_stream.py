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
