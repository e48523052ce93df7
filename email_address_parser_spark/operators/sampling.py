"""Training-data assembly operators: deterministic splits, sequence packing,
and cardinality sketches.

All three are everyday needs of a 100 TB training pipeline, expressed so the
DuckDB oracle replays them exactly:

  * split_assign    — stratified train/val/test assignment from an md5-based
                      uniform draw per row key (no RNG state, no shuffle;
                      adding executors or reordering input cannot move a row
                      between splits).
  * pack_sequences  — sequential token packing: a running token-count window
                      per source assigns each doc to a fixed-budget bin
                      (training shard). Partitioned by `source`, so the sort
                      is per-stratum, never a global single-partition sort.
  * kmv_sketch      — K-minimum-values distinct-count sketch per group
                      (Bar-Yossef et al. 2002): keep the k smallest md5
                      draws; estimate = (k-1)/u_k. Mergeable (min-merge) —
                      the shape used for distinct counts at 100 TB where an
                      exact countDistinct shuffle is unaffordable. Exact
                      below k by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# 2^32 and 16^15 as doubles (exact in IEEE754)
_SCALE32 = float(1 << 32)
_SCALE60 = float(1 << 60)


def _uniform_hash(col: F.Column) -> F.Column:
    """Deterministic u ~ [0,1): first 8 md5 hex chars / 2^32. Exactly
    replayable in DuckDB (same md5, same integer parse, same division)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")
        / F.lit(_SCALE32)
    )


def split_assign(
    df: DataFrame,
    key_col: str = "doc_id",
    weights: tuple = (("train", 0.8), ("val", 0.1), ("test", 0.1)),
    salt: str = "split",
) -> DataFrame:
    """→ df + (u double, split string). Assignment is a pure function of
    (salt, key): stable under re-partitioning, resumable, and disjoint
    across salts (use a different salt for a fresh re-split)."""
    u = _uniform_hash(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string")))
    expr = None
    acc = 0.0
    for name, w in weights[:-1]:
        acc += w
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = expr.otherwise(F.lit(weights[-1][0]))
    return df.withColumn("u", F.round(u, 9)).withColumn("split", expr)


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int = 2048,
    part_col: str = "source",
    order_col: str = "doc_id",
) -> DataFrame:
    """→ df + (cum_before bigint, bin_id bigint): doc d goes to bin
    floor(cum_before / budget) where cum_before is the running token total of
    earlier docs in its stratum (ORDER BY order_col). The window partitions
    by `part_col`, so at scale each stratum sorts independently — no global
    ordering bottleneck."""
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum(F.col(token_col)).over(w), F.lit(0)).cast("long")
    return df.withColumn("cum_before", cum).withColumn(
        "bin_id", F.floor(F.col("cum_before") / F.lit(budget)).cast("long")
    )


def kmv_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """→ (group, n_exact, kmv_estimate): per group, the exact distinct count
    (for the oracle comparison; at 100 TB you would drop this column) and
    the KMV estimate from the k smallest 60-bit md5 draws of the DISTINCT
    values. estimate = (k-1)/u_k when ≥ k values, else the exact count.

    collect_list is bounded: the input to the aggregate is the per-group
    distinct value set hashed to 60-bit longs; on a real deployment the k
    minima are maintained with a partial aggregate (min-merge of sorted
    arrays) so nothing unbounded crosses the shuffle — here array_sort +
    slice expresses the same result in a form DuckDB replays verbatim."""
    h = F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    per_value = df.select(F.col(group_col).alias("grp"), F.col(value_col)).distinct()
    hashed = per_value.select("grp", h.alias("_h"))
    agg = hashed.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.slice(F.array_sort(F.collect_list("_h")), 1, k).alias("_mins"),
    )
    u_k = F.element_at("_mins", k) / F.lit(_SCALE60)
    est = F.when(F.col("n_exact") < F.lit(k), F.col("n_exact").cast("double")).otherwise(
        F.round(F.lit(float(k - 1)) / u_k, 6)
    )
    return agg.select(
        F.col("grp").alias(group_col),
        F.col("n_exact"),
        est.alias("kmv_estimate"),
    )
