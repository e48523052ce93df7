"""Golden-record construction over resolved clusters (G40 — survivorship).

The step after clustering in every MDM / entity-resolution deployment: each
cluster is collapsed to ONE canonical record whose attributes are *survived*
from the member mentions by explicit, deterministic rules. Rules here:

  * counts — n_members (distinct emails), n_mentions, n_conversations —
    plain aggregates over the cluster's mention set;
  * top_domain — most-frequent-value survivorship on `domain_canon`
    (mention-weighted mode), ties broken lexicographically so the record is
    deterministic under any partitioning. This is the rule that repairs the
    domain-typo variant: the cluster that absorbed `…@xample.com` members
    still survives `example.com` as its canonical domain because the correct
    spelling out-votes the typo. (At an exact 1-1 vote the lexicographic tie
    rule decides — it can pick either spelling, but always the SAME one; the
    end-to-end test pins both directions.)

Plan shape (100 TB): one join of mentions→clusters on `email` (the cluster
assignment is distinct-email-sized — NOT broadcastable at corpus scale, so
this is an honest hash join; AQE handles domain skew), then two aggregations
hashed on `cluster_id` + one tiny per-cluster window for the mode. No UDFs,
no iteration; everything whole-stage-codegen.

Reference anchor: beyond the reference kernel's scalar scope
(`rust-lib/src/email_address.rs` parses one address); this is the dataflow
consumer its per-address getters exist to feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def golden_records(mentions: DataFrame, clusters: DataFrame) -> DataFrame:
    """→ (cluster_id, n_members, n_mentions, n_conversations, top_domain,
    top_domain_mentions), one row per cluster. `mentions` must carry
    (email, conv_id, domain_canon, valid_lax); `clusters` is the
    (email, cluster_id) assignment from cluster_mentions / the fold."""
    m = (
        mentions.where(F.col("valid_lax"))
        .select("email", "conv_id", "domain_canon")
        .join(clusters, "email")
    )
    base = m.groupBy("cluster_id").agg(
        F.count_distinct("email").alias("n_members"),
        F.count(F.lit(1)).alias("n_mentions"),
        F.count_distinct("conv_id").alias("n_conversations"),
    )
    dom = m.groupBy("cluster_id", "domain_canon").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("cnt"), F.asc("domain_canon")
    )
    top = (
        dom.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("domain_canon").alias("top_domain"),
            F.col("cnt").alias("top_domain_mentions"),
        )
    )
    return base.join(top, "cluster_id").select(
        "cluster_id",
        "n_members",
        "n_mentions",
        "n_conversations",
        "top_domain",
        "top_domain_mentions",
    )
