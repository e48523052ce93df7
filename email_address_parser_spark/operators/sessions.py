"""Gap-based sessionization of an event stream (G32).

The canonical clickstream / transcript-activity primitive: two events of the
same key belong to the same session iff they are separated by at most
`gap_s` seconds. Pure window algebra — `lag` marks session starts, a running
sum of start flags numbers the sessions — so the whole operator is one
shuffle on the key column and then in-partition sorted windows; no UDF, no
iteration, exactly replayable in SQL.

Scale shape (100 TB): the only exchange is `hashpartitioning(key)`, the same
partitioning both windows and the rollup reuse (a single Window node after
Catalyst collapses the shared spec, and the groupBy arrives pre-partitioned).
Per-key event history must fit one task — inherent to session semantics
(every sessionizer from Flink's session windows to BigQuery's gap fill has
this shape); a pathological hot key is capped upstream by the events
source's per-key retention, not here. All timestamp math is integer
microseconds (`unix_micros`), so the DuckDB oracle (`epoch_us`) replays it
bit-exactly with no float-formatting hazards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _ts_micros(col: F.Column) -> F.Column:
    """Epoch microseconds. The parquet testdata stores TIMESTAMP_NTZ; with
    the session pinned to UTC (session.py) the cast reads the naive value
    as UTC wall time, so this equals DuckDB's epoch_us on the same column."""
    return F.unix_micros(col.cast("timestamp"))


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_s: float = 12 * 3600,
) -> DataFrame:
    """→ events + (ts_us long, is_session_start boolean, session_idx int,
    session_id string). session_idx is 1-based per key in time order; ties
    on ts break on the event id so the numbering is deterministic under any
    partitioning. session_id = '<key>:<idx>' is the stable join key for the
    session-level rollup."""
    gap_us = int(round(float(gap_s) * 1_000_000))
    w = Window.partitionBy(key_col).orderBy(F.asc(ts_col), F.asc(id_col))
    ts_us = _ts_micros(F.col(ts_col))
    prev_us = F.lag(ts_us).over(w)
    is_start = prev_us.isNull() | ((ts_us - prev_us) > F.lit(gap_us))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess_idx = F.sum(is_start.cast("int")).over(run).cast("int")
    return (
        events.withColumn("ts_us", ts_us)
        .withColumn("is_session_start", is_start)
        .withColumn("session_idx", sess_idx)
        .withColumn(
            "session_id",
            F.concat_ws(":", F.col(key_col).cast("string"), F.col("session_idx")),
        )
    )


def session_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_s: float = 12 * 3600,
    value_col: str | None = "value",
) -> DataFrame:
    """→ one row per session: (key, session_idx, session_id, n_events,
    start_us, end_us, duration_s, sum_value_e4). The groupBy key contains
    the window partition key, so the aggregation reuses the sessionizer's
    exchange — one shuffle for the whole operator. Money-ish values are
    summed in 1e-4 units (long) to keep the oracle comparison exact."""
    sess = sessionize(events, key_col, ts_col, id_col, gap_s)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
    ]
    if value_col is not None:
        aggs.append(
            F.sum(F.round(F.col(value_col) * 1e4).cast("long")).alias("sum_value_e4")
        )
    out = sess.groupBy(key_col, "session_idx", "session_id").agg(*aggs)
    return out.withColumn(
        "duration_s",
        F.round((F.col("end_us") - F.col("start_us")) / F.lit(1e6), 6),
    )
