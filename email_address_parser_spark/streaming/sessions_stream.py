"""Streaming twin of G32 sessionization: Spark's built-in `session_window`
(merging event-time session windows) + watermark, so session state for a key
is finalized and EVICTED once the watermark passes its last event + gap —
bounded state on an unbounded stream, the same contract as the batch
operator's one-shuffle shape.

Semantics note, pinned by the parity test: the batch rule keeps an event in
the session when the gap is <= gap_s (inclusive), while `session_window`
extends a window by [ts, ts+gap) (exclusive at exactly gap). The two differ
only for events separated by EXACTLY gap_s down to the microsecond —
measure-zero in real event streams; the parity test uses off-boundary data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_sessions(
    events: DataFrame,
    gap: str = "12 hours",
    watermark: str = "1 day",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """→ one row per finalized/updated session: (key, session_start,
    session_last_ts, n_events, sum_value_e4). `session_window.end` is
    last-event + gap, so `session_last_ts = end - gap` aligns with the batch
    rollup's `end_us`. Money values summed in 1e-4 long units, same as
    session_stats."""
    win = F.session_window(F.col(ts_col), gap)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col), win)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col(value_col) * 1e4).cast("long")).alias("sum_value_e4"),
        )
        .select(
            key_col,
            F.col("session_window.start").alias("session_start"),
            F.expr(f"session_window.end - INTERVAL {gap}").alias("session_last_ts"),
            "n_events",
            "sum_value_e4",
        )
    )
