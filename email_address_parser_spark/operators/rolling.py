"""Rolling event-time window aggregates (G35): for every event, aggregates
over the key's trailing `window_s` seconds — rate counters ("purchases in
the last 7 days"), trailing spend, velocity features for fraud/abuse
scoring. The moving-window sibling of G32's disjoint sessions.

Spark-first shape: a RANGE window frame over integer microseconds —
`partitionBy(key).orderBy(ts_us).rangeBetween(-window_us, 0)` — which the
engine evaluates with a sliding two-pointer pass over each key's sorted
run: one shuffle on the key, one in-partition sort, O(events) work, zero
UDFs. The frame bound is data (event-time), not row count, so late/dense
bursts are handled exactly, and the RANGE frame includes same-timestamp
peers identically in Spark and DuckDB (both implement the SQL standard), so
the oracle replays it bit-exactly on epoch_us longs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .sessions import _ts_micros


def rolling_agg(
    events: DataFrame,
    window_s: float = 7 * 86400,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """→ events + (ts_us, n_trailing, sum_value_e4_trailing): count and
    1e-4-unit value sum over [ts - window_s, ts], inclusive both ends
    (the SQL-standard RANGE frame). Money summed in longs so the oracle
    comparison is exact."""
    window_us = int(round(float(window_s) * 1_000_000))
    w = (
        Window.partitionBy(key_col)
        .orderBy("ts_us")
        .rangeBetween(-window_us, 0)
    )
    return (
        events.withColumn("ts_us", _ts_micros(F.col(ts_col)))
        .withColumn("n_trailing", F.count(F.lit(1)).over(w))
        .withColumn(
            "sum_value_e4_trailing",
            F.sum(F.round(F.col(value_col) * 1e4).cast("long")).over(w),
        )
    )
