"""Ordered multi-step funnel over an event stream (G38).

The product-analytics primitive behind conversion dashboards: for an ordered
list of step event types, step k's timestamp for a key is the EARLIEST event
of that type STRICTLY AFTER the key's step-(k-1) timestamp. A key that never
reaches step k has NULL for it and every later step (monotone by
construction), so `steps_completed` is simply the count of non-NULL steps.

Plan shape (the 100 TB story): one `min`-aggregate per step, every one of
them hashed on the SAME key column, plus type-equality filters that push to
the parquet scan (each step's input is the type-pruned slice of the events
scan, not the full table). After the first exchange the per-step joins and
aggregates all arrive pre-partitioned on the key, so Catalyst reuses the
partitioning instead of re-shuffling; AQE handles key skew. No window over
the full per-key history is needed — unlike sessionization, the funnel only
tracks one frontier timestamp per step, so a hot key costs O(its events),
never O(events²). All timestamp math is integer microseconds
(`unix_micros` / DuckDB `epoch_us`), bit-exact between engines.

Reference anchor: beyond the reference's scalar scope
(`rust-lib/src/email_address.rs` has no dataflow); included because the
transcript/events corpus a 100 TB ER deployment feeds also drives funnel
analytics off the same table.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: Sequence[str] = ("view", "click", "purchase"),
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """→ (key, <step>_us long per step, steps_completed int), one row per key
    that completed at least step 1. Strict `>` between consecutive steps: two
    step events on the same microsecond do NOT chain (same rule the DuckDB
    oracle replays)."""
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    e = events.select(
        F.col(key_col),
        F.col(type_col),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
    )
    step_cols = [f"{s}_us" for s in steps]
    out = (
        e.where(F.col(type_col) == steps[0])
        .groupBy(key_col)
        .agg(F.min("ts_us").alias(step_cols[0]))
    )
    for prev_col, step, col in zip(step_cols, steps[1:], step_cols[1:]):
        nxt = (
            e.where(F.col(type_col) == step)
            # inner join on the frontier: keys that never reached the previous
            # step are absent here and re-attach as NULL via the left join
            .join(out.select(key_col, prev_col), key_col)
            .where(F.col("ts_us") > F.col(prev_col))
            .groupBy(key_col)
            .agg(F.min("ts_us").alias(col))
        )
        out = out.join(nxt, key_col, "left")
    completed = sum(
        (F.col(c).isNotNull().cast("int") for c in step_cols[1:]),
        F.lit(1),
    )
    return out.select(key_col, *step_cols, completed.cast("int").alias("steps_completed"))


def funnel_oracle(
    steps: Sequence[str] = ("view", "click", "purchase"),
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    table: str = "events",
) -> str:
    """DuckDB replay of `funnel`: identical per-step min-after-frontier CTEs."""
    step_cols = [f"{s}_us" for s in steps]
    ctes = [
        f"""s1 AS (
    SELECT {key_col}, min(epoch_us({ts_col})) AS {step_cols[0]}
    FROM {table} WHERE {type_col} = '{steps[0]}' GROUP BY 1
)"""
    ]
    for i, (step, col) in enumerate(zip(steps[1:], step_cols[1:]), start=2):
        prev = step_cols[i - 2]
        ctes.append(
            f"""s{i} AS (
    SELECT e.{key_col}, min(epoch_us(e.{ts_col})) AS {col}
    FROM {table} e JOIN s{i - 1} USING ({key_col})
    WHERE e.{type_col} = '{step}' AND epoch_us(e.{ts_col}) > s{i - 1}.{prev}
    GROUP BY 1
)"""
        )
    joins = " ".join(
        f"LEFT JOIN s{i} USING ({key_col})" for i in range(2, len(steps) + 1)
    )
    completed = " + ".join(
        f"(CASE WHEN {c} IS NOT NULL THEN 1 ELSE 0 END)" for c in step_cols[1:]
    )
    cols = ", ".join(step_cols)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT s1.{key_col}, {cols},
    CAST(1 + {completed} AS INT) AS steps_completed
FROM s1 {joins}"""
    )
