"""As-of join (G33): attach to each left row the most recent right row at or
before its timestamp, per key — "last touch" attribution, point-in-time
feature lookup, trade-vs-quote style alignment.

Spark has no ASOF JOIN operator; the naive encodings are a range join
(quadratic blow-up per key) or a per-key collect (driver-bound). The
scalable encoding is the union-and-fill trick: tag both inputs, union them,
sort per key by (ts, tag, right-id) and carry the right side's columns
forward with `last(..., ignorenulls=True)` over a running ROWS frame. One
shuffle on the key, one in-partition sort, zero UDFs — the same shape Flink
uses for event-time temporal joins.

Tie rules, fixed and replayed exactly by the oracle:
  * a right row AT the left row's timestamp matches (at-or-before, not
    strictly-before): right rows sort before left rows at equal ts.
  * several right rows at the same (key, ts): the greatest right id wins
    (they sort ascending; `last` takes the latest in frame).
All ordering columns are integer microseconds / longs, so DuckDB replays the
window bit-exactly (`epoch_us`, `NULLS FIRST` spelled out on both sides).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .sessions import _ts_micros


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    right_id: str = "event_id",
    value_cols: Sequence[str] = ("event_id", "ts"),
    prefix: str = "asof_",
) -> DataFrame:
    """→ left + one `<prefix><col>` column per value_cols entry, null when
    the key has no right row at or before the left row's ts. `right_id`
    must be unique within (key, ts) on the right; it is both the tie-break
    and (by default) a carried value column."""
    key, lcols = F.col(on), list(left.columns)
    ts_us = _ts_micros(F.col(ts_col))

    r = right.select(
        key.alias("_k"),
        ts_us.alias("_ts_us"),
        F.lit(0).alias("_tag"),
        F.col(right_id).cast("long").alias("_rid"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    l = left.select(
        key.alias("_k"),
        ts_us.alias("_ts_us"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast("long").alias("_rid"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}") for c in value_cols],
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    # null _rid on left rows: asc_nulls_first so both engines agree without
    # relying on either's default null ordering
    w = (
        Window.partitionBy("_k")
        .orderBy(F.asc("_ts_us"), F.asc("_tag"), F.col("_rid").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = r.unionByName(l, allowMissingColumns=True).select(
        "*",
        *[
            F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in value_cols
        ],
    )
    return filled.where(F.col("_tag") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[F.col(f"_f_{c}").alias(f"{prefix}{c}") for c in value_cols],
    )
