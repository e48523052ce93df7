"""Continuous identity-resolution ingestion: the G24 state-maintained fold
(`operators/incremental.fold_batch`) as a Structured Streaming
`foreachBatch` consumer.

This is the production shape of 10^12-turn maintenance: transcripts land on
a stream (Kafka/Iceberg; file source in-sandbox), every micro-batch is
folded into the persisted cluster state — extraction, banding, and scoring
run over the micro-batch only; derived dims (key reps, domain counts, LSH
bucket counts) are merged, never re-aggregated — and the updated state is
committed back. Exactly-once comes from composing two mechanisms:

  * the streaming checkpoint replays a micro-batch after a crash;
  * the fold is idempotent under replay — already-folded emails drain
    through the new-email anti-join (`tests/test_incremental.py::
    test_fold_batch_refold_is_noop`) — so a replayed batch is a no-op.

State here is one parquet directory per table, rewritten per fold (the
sandbox analog; prod uses Iceberg tables bucketed by join key with
batch-sized MERGE writes — see `sources/iceberg.py` for the catalog seam).
`localCheckpoint` materializes the new state BEFORE the overwrite so the
lazy plans never read a directory they are replacing.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import DataFrame, SparkSession

from ..operators.incremental import STATE_TABLES, build_incremental_state, fold_batch
from ..operators.incremental_dedup import (
    DEDUP_STATE_TABLES,
    build_dedup_state,
    fold_docs,
)


def write_state(
    state: Dict[str, DataFrame], state_dir: str, tables=STATE_TABLES
) -> None:
    """Materialize EVERY state table, then persist (prod: Iceberg MERGE).

    The two phases must not interleave: the tables share lazy subtrees that
    read the CURRENT state directories (e.g. the new-email anti-join against
    state.uniq feeds reps/bucket_counts/clusters too), so overwriting any
    directory before every table is materialized would make later tables
    re-evaluate against the already-updated state — the batch would drain
    through the anti-join and the fold would silently no-op. localCheckpoint
    is eager, so phase one pins all values first."""
    materialized = {
        name: state[name].localCheckpoint()
        for name in tables
        if state.get(name) is not None
    }
    for name, df in materialized.items():
        df.write.mode("overwrite").parquet(f"{state_dir}/{name}")


def read_state(
    spark: SparkSession, state_dir: str, tables=STATE_TABLES
) -> Dict[str, DataFrame]:
    return {name: spark.read.parquet(f"{state_dir}/{name}") for name in tables}


def bootstrap_state(
    spark: SparkSession,
    transcripts: DataFrame,
    state_dir: str,
    **fold_kwargs,
) -> None:
    """Initialize the state directory from a (possibly EMPTY) corpus — an
    empty bootstrap makes the stream self-contained: the first micro-batch
    folds into empty tables."""
    write_state(
        build_incremental_state(spark, transcripts, **fold_kwargs), state_dir
    )


def streaming_cluster_maintenance(
    transcript_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    **fold_kwargs,
):
    """writeStream query folding each transcript micro-batch into
    `state_dir`. Returns the started StreamingQuery (availableNow trigger:
    drain what exists, then stop — swap for a processingTime trigger in a
    long-running deployment)."""

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        out = fold_batch(spark, batch_df, read_state(spark, state_dir), **fold_kwargs)
        write_state(out["state"], state_dir)

    return (
        transcript_stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def bootstrap_dedup_state(
    spark: SparkSession,
    docs: DataFrame,
    state_dir: str,
    **fold_kwargs,
) -> None:
    write_state(
        build_dedup_state(spark, docs, **fold_kwargs),
        state_dir,
        tables=DEDUP_STATE_TABLES,
    )


def streaming_dedup_maintenance(
    doc_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    **fold_kwargs,
):
    """G26's fold as a foreachBatch consumer: each document micro-batch is
    deduplicated against the persisted keep-best state and folded in — same
    exactly-once composition (checkpoint replay × re-fold idempotency) as
    `streaming_cluster_maintenance`."""

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        out = fold_docs(
            spark,
            batch_df,
            read_state(spark, state_dir, tables=DEDUP_STATE_TABLES),
            **fold_kwargs,
        )
        write_state(out["state"], state_dir, tables=DEDUP_STATE_TABLES)

    return (
        doc_stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
