"""Incremental golden-record maintenance (G42): fold a transcript batch's
mentions into persisted golden records, recomputing ONLY the clusters the
batch touched.

Composes the two round-4 flagships: `incremental.fold_batch` maintains the
cluster assignment incrementally; this module keeps the survivorship layer
(G40) equally incremental. State:

  men    — the valid-mention log, one row per (conv_id, turn_idx,
           mention_idx): the exactly-once ingestion ledger. Re-applied
           batches drain through the mention-key anti-join, so counts can
           never double (same replay-idempotency contract as the other
           folds). In prod an Iceberg table bucketed by email, so the
           touched-cluster slice below is a partition-pruned scan.
  golden — (cluster_id → golden record), the served output.

A fold:

  1. anti-joins the batch's mentions against `men` on the mention key and
     appends the survivors (batch-sized write, MoR like the cluster state);
  2. derives the TOUCHED cluster set: clusters (under the post-fold
     assignment) of every email with a new mention, plus every email whose
     assignment changed (the fold's delta) — a batch-neighborhood-sized set;
  3. re-runs the BATCH survivorship operator (`golden_records`, G40 —
     one code path, not a twin) on the mention-log slice of the touched
     clusters' members only;
  4. tombstones golden rows whose cluster_id disappeared (clusters merged
     by the fold) and upserts the recomputed rows; untouched clusters pass
     through unread.

Equivalence contract: the updated golden table equals `golden_records` over
the full corpus and the post-fold clustering — certified by the
`er_golden_record_incr` driver query, whose oracle is the SAME full-corpus
survivorship SQL as `er_golden_record`.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .survivorship import golden_records

MENTION_KEY = ["conv_id", "turn_idx", "mention_idx"]
MEN_COLS = MENTION_KEY + ["email", "domain_canon"]


def _men_log(mentions: DataFrame) -> DataFrame:
    """Valid-mention ledger rows (survivorship only reads these columns)."""
    return mentions.where(F.col("valid_lax")).select(*MEN_COLS)


def build_golden_state(
    mentions: DataFrame, clusters: DataFrame
) -> Dict[str, DataFrame]:
    """One-time bootstrap: the mention ledger + golden records of a corpus
    already clustered (e.g. by `build_incremental_state`)."""
    men = _men_log(mentions)
    return {"men": men, "golden": golden_records(mentions, clusters)}


def fold_golden(
    spark: SparkSession,
    new_mentions: DataFrame,
    assign_delta: DataFrame,
    clusters_updated: DataFrame,
    clusters_prev: DataFrame,
    state: Dict[str, DataFrame],
) -> Dict[str, DataFrame]:
    """Fold a batch into the golden state. `assign_delta` and
    `clusters_updated` come from `incremental.fold_batch` (its "delta" and
    "clusters" outputs); `clusters_prev` is the PRE-fold assignment (the
    cluster state the fold consumed) — needed to tombstone ids that merged
    away. Returns the updated state plus the upsert/tombstone sets
    (`golden_upserts`, `golden_tombstones`) a MoR writer would persist."""
    # Every batch-/neighborhood-sized intermediate below is PINNED with a
    # lazy localCheckpoint. Without pinning, each downstream reference
    # re-embeds the whole fold DAG (clusters_updated carries the CC fold's
    # plan), and the references NEST through broadcast subtrees — touched
    # inside members inside slice_men inside two golden_records aggregates
    # inside the tombstone anti-join — so the final plan tree grows
    # multiplicatively (measured: ~2,900 stages / 150 s to produce 23
    # upsert rows at sandbox scale, then a TaskMemoryManager livelock on
    # the tombstone plan). Pinned, each is evaluated exactly once.
    # 1. exactly-once ledger append (replayed batches drain here)
    new_men = (
        _men_log(new_mentions)
        .join(state["men"].select(*MENTION_KEY), MENTION_KEY, "left_anti")
        .localCheckpoint(eager=False)
    )
    men = state["men"].unionByName(new_men)

    # 2. touched clusters: new-mention emails + reassigned emails, mapped
    #    through the POST-fold assignment. Both sides are batch-sized.
    touched_emails = (
        new_men.select("email")
        .unionByName(assign_delta.select("email"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    touched = (
        clusters_updated.join(F.broadcast(touched_emails), "email", "left_semi")
        .select("cluster_id")
        .distinct()
        .localCheckpoint(eager=False)
    )

    # 3. recompute survivorship on the touched slice only, with the SAME
    #    batch operator (golden_records). members/slice are
    #    neighborhood-sized; prod reads them with partition-pruned scans.
    members = (
        clusters_updated.join(F.broadcast(touched), "cluster_id", "left_semi")
        .localCheckpoint(eager=False)
    )
    slice_men = (
        men.join(F.broadcast(members.select("email")), "email", "left_semi")
        .withColumn("valid_lax", F.lit(True))
        .localCheckpoint(eager=False)
    )
    upserts = golden_records(slice_men, members).localCheckpoint(eager=False)

    # 4. tombstone every PRE-fold golden row whose cluster was touched under
    #    EITHER assignment: `touched` (post-fold ids) catches replaced rows;
    #    the pre-fold ids of the same touched emails catch clusters whose id
    #    merged away (the id vanishes from clusters_updated, so only the old
    #    assignment can name it). Both sets are batch-neighborhood-sized.
    prev_ids = (
        clusters_prev.join(F.broadcast(touched_emails), "email", "left_semi")
        .select("cluster_id")
        .distinct()
    )
    old_touched = (
        state["golden"]
        .join(
            F.broadcast(touched.unionByName(prev_ids).distinct()),
            "cluster_id",
            "left_semi",
        )
        .select("cluster_id")
        .localCheckpoint(eager=False)
    )
    golden = (
        state["golden"]
        .join(F.broadcast(old_touched), "cluster_id", "left_anti")
        .unionByName(upserts)
    )
    # the MoR tombstone surface: ONLY ids that truly disappeared (merged
    # away). Ids that survive are covered by their upsert — emitting both a
    # tombstone and an upsert for the same id at the same epoch would make
    # latest-wins resolution a coin flip.
    tombstones = old_touched.join(
        upserts.select("cluster_id"), "cluster_id", "left_anti"
    )

    return {
        "men": men,
        "golden": golden,
        "golden_upserts": upserts,
        "golden_tombstones": tombstones,
        "new_men": new_men,
    }
