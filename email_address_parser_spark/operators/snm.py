"""G57 — Sorted Neighborhood blocking (Hernández & Stolfo, SIGMOD 1995).

The third classic candidate-generation family next to key blocking (F6) and
LSH (F7): sort all entities by a fuzzy sort key, slide a window of w over
the sorted sequence, and emit every pair within the window. Near-identical
strings adjoin after sorting, so a typo'd local lands next to its original
REGARDLESS of domain — a complementary recall mechanism to both the exact
and the minhash channels, at linear candidate cost (w-1 pairs per entity).

Spark-first shape — the textbook formulation needs a GLOBAL rank, which a
naive `row_number() OVER (ORDER BY ...)` computes on a single partition.
This implementation keeps the rank exact AND distributed:

1. `repartitionByRange(sort_key, email)` range-partitions the dim (the
   scalable sort — partition i holds strictly smaller keys than i+1);
2. a per-partition window (partitionBy spark_partition_id) computes local
   row numbers in parallel;
3. partition row-counts — a #partitions-sized dim — prefix-sum on a single
   partition (bounded: one row per partition, thousands at most), and the
   offsets broadcast back: global_rank = partition_offset + local_rank.

Because (sort_key, email) is a STRICT total order (email is unique), the
global rank is a pure function of the data — range boundaries can move
without changing any rank, so the result is deterministic under any
partitioning and any sampling the range partitioner does.

4. window pairs ride an `explode(sequence(1, w-1))` + equi-join on the rank
   (fan-out exactly w-1 per entity, no self-join blow-up, no window over
   the full dim).

The DuckDB twin replays it as the textbook single-node form —
`row_number() OVER (ORDER BY sort_key, email)` + a rank-distance self-join —
which is exactly the equality the distributed rank must reproduce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_WINDOW = 8


def with_global_rank(
    keyed: DataFrame, order_cols: list, n_partitions: int = None
) -> DataFrame:
    """Add `rn`: the exact 1-based global rank under ORDER BY order_cols.

    order_cols must be a strict total order (no ties) — ranks are then
    boundary-independent (see module docstring). Distributed: range
    repartition + per-partition window + prefix-summed partition offsets."""
    if n_partitions is None:
        n_partitions = keyed.sparkSession.sparkContext.defaultParallelism
    ranged = keyed.repartitionByRange(n_partitions, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    local = ranged.withColumn(
        "_lrn",
        F.row_number().over(Window.partitionBy("_pid").orderBy(*order_cols)),
    )
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    offsets = counts.withColumn(
        "_off",
        F.coalesce(
            F.sum("_n").over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("_pid", "_off")
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn("rn", (F.col("_off") + F.col("_lrn")).cast("long"))
        .drop("_pid", "_lrn", "_off")
    )


def snm_pairs(uniq: DataFrame, window: int = DEFAULT_WINDOW) -> DataFrame:
    """Sorted-neighborhood candidate pairs: (email_a, email_b, dist).

    Sort key = dotless local (the identity-bearing token; domains sort last
    so a cross-domain typo pair still adjoins), tie-broken by email for a
    strict total order. Every pair with 1 <= rank distance <= window-1 is a
    candidate; email_a is the rank-lower side. dist is the rank distance
    (1 = immediate neighbors)."""
    keyed = uniq.select(
        "email",
        F.concat(
            F.regexp_replace("local_canon", r"\.", ""),
            F.lit("|"),
            F.col("domain_canon"),
        ).alias("sort_key"),
    )
    # both join sides reference the ranked dim; pin it (lazy localCheckpoint,
    # the repo-wide pattern) so the rank chain — range exchange, two windows,
    # offsets prefix sum — runs ONCE instead of once per side
    ranked = with_global_rank(keyed, ["sort_key", "email"]).localCheckpoint(
        eager=False
    )
    probes = ranked.select(
        F.col("email").alias("email_a"),
        F.col("rn").alias("_rn_a"),
        F.explode(F.sequence(F.lit(1), F.lit(window - 1))).alias("_off"),
    ).select(
        "email_a", "_rn_a", (F.col("_rn_a") + F.col("_off")).alias("rn_b")
    )
    right = ranked.select(F.col("email").alias("email_b"), F.col("rn").alias("rn_b"))
    return (
        probes.join(right, "rn_b")
        .select(
            "email_a",
            "email_b",
            (F.col("rn_b") - F.col("_rn_a")).cast("int").alias("dist"),
        )
    )
