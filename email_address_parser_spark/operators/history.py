"""G43 — SCD2 cluster-membership history: when did an email join / leave a
cluster?

Entity resolution over a growing corpus is not a single clustering but a
TIMELINE of clusterings: each fold can re-assign an email (a new variant
lowers the cluster's canonical id, two clusters merge through a new bridge
mention). Production consumers — auditing "which identity did we bill this
address under in March", training-data lineage ("this example was labeled
under cluster X at snapshot 12") — need the history, not the latest view.

This module maintains that history as a classic slowly-changing-dimension
type-2 (SCD2) table keyed by email:

    (email, cluster_id, valid_from: long, valid_to: long | null,
     is_current: boolean)

one OPEN row (valid_to null, is_current true) per email, plus closed rows
for every assignment it ever held. `fold_history` folds one epoch's
assignments in with cost proportional to |assignments| + |touched current
rows|:

  * `assignments` may be the fold's DELTA (batch-sized) or the full current
    view — emails ABSENT from it keep their rows untouched (the
    ER-semantics choice: corpus growth never removes an email from its
    cluster, so absence means "unchanged", which is exactly what makes the
    delta form correct);
  * unchanged assignments (same email, same cluster_id) are no-ops — the
    open row passes through with its original valid_from;
  * changed/new assignments close the previous open row (valid_to = epoch)
    and open a new one (valid_from = epoch);
  * CLOSED rows are never read or rewritten: the fold touches only the
    is_current slice, so at 10^12 turns the historical majority of the
    table is never in any shuffle. In prod the table is an Iceberg table
    bucketed by email and partitioned by is_current, so the fold's join
    prunes to the current partition and co-locates on the bucket; the
    `updates` frame it returns is the batch-sized MERGE payload
    (streaming.incremental_stream.write_state_mor appends it per fold).

Scale shape: one equi-join current-slice × assignments on email (both
bucketed in prod), one anti-join to pass untouched current rows through,
plus a union with the untouched closed slice — no window functions, no
global sort, no driver collect.

Oracle: the driver query `er_membership_history` replays two epochs (the
~80% conv split, then the fold) and DuckDB recomputes the SCD2 table from
the two match-key clusterings directly (__spark_entry__._ORACLE_HISTORY) —
a full-SQL triple-match, certifying fold_history == from-scratch history.

Reference tie-in: per-address identity semantics remain the Rust crate's
parse/canonicalize contract (rust-lib/src/email_address.rs getters); this
module only adds the time dimension over the engine's cluster assignments.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HISTORY_COLUMNS = ["email", "cluster_id", "valid_from", "valid_to", "is_current"]


def snapshot_history(clusters: DataFrame, epoch: int) -> DataFrame:
    """Bootstrap: every (email, cluster_id) assignment becomes an open SCD2
    row valid from `epoch`."""
    return clusters.select(
        "email",
        "cluster_id",
        F.lit(epoch).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def fold_history(
    history: DataFrame, assignments: DataFrame, epoch: int
) -> Dict[str, DataFrame]:
    """Fold one epoch of (email, cluster_id) assignments into the SCD2
    `history`. Emails absent from `assignments` are unchanged (so a fold
    DELTA and the full current view produce identical histories — pinned by
    tests/test_history.py). Returns {"history": full updated table,
    "updates": the batch-sized closed+opened rows a MERGE writer appends}.

    Re-applying the same assignments at a later epoch is a no-op (every row
    drains through the unchanged filter) — the restart-safety contract
    shared with the other folds."""
    cur = history.where(F.col("is_current"))
    closed = history.where(~F.col("is_current"))

    a = assignments.select("email", F.col("cluster_id").alias("_new_cid"))
    j = cur.join(a, "email", "full_outer")
    # changed = open row exists with a different cid; new = no open row
    touched = j.where(
        F.col("_new_cid").isNotNull()
        & (F.col("cluster_id").isNull() | (F.col("cluster_id") != F.col("_new_cid")))
    )
    closures = touched.where(F.col("cluster_id").isNotNull()).select(
        "email",
        "cluster_id",
        "valid_from",
        F.lit(epoch).cast("long").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    opens = touched.select(
        "email",
        F.col("_new_cid").alias("cluster_id"),
        F.lit(epoch).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    updates = closures.unionByName(opens)
    untouched_cur = cur.join(
        touched.select("email"), "email", "left_anti"
    ).select(*HISTORY_COLUMNS)
    return {
        "history": closed.select(*HISTORY_COLUMNS)
        .unionByName(untouched_cur)
        .unionByName(updates),
        "updates": updates,
    }
