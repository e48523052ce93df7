"""G63 — best-match (1-NN star) clustering: a precision-friendly
alternative to full transitive closure.

Connected components over EVERY accepted edge (F11) maximizes recall but
chains identities through weak links: one borderline pair can fuse two
whole clusters (er_threshold_clusters quantifies the effect, G61 repairs
it after the fact). The classic duplicate-clustering literature
(Hassanzadeh et al., VLDB 2009, "Framework for evaluating clustering
algorithms in duplicate detection") evaluates graph restrictions that keep
only each record's STRONGEST evidence before closure; the 1-NN / star
family is the standard precision-leaning member. The reference repo is a
parser with no counterpart; the algorithm family is public literature.

Semantics (deterministic): over the scored candidate graph restricted to
score ≥ ``floor``,

  * every node keeps exactly ONE outgoing edge — to its best-scoring
    neighbor, ties broken by the lexicographically smallest neighbor
    (total order, so the kept set is unique);
  * clusters are the connected components of the kept (undirected) edges,
    labeled min-email (engine convention, F11);
  * valid emails with no candidate ≥ floor are singletons (self-labeled),
    exactly as in ``pipeline.cluster_mentions``.

The kept graph has out-degree 1, so components are pseudoforests: a weak
edge can still join two nodes, but only if it is SOMEONE'S best evidence —
the long low-score chains that plague pure closure cannot form unless
every hop is locally optimal.

Scale shape: the argmax is a window ``row_number`` over the symmetrized
pair table, partitioned by node — ONE hash exchange on a high-cardinality
key and no join-back (the groupBy-max + self-join alternative costs two).
The kept edge set is ≤ |nodes| rows (vs O(Σ block²) candidates), so the
CC that follows is strictly cheaper than the main pipeline's. At 10^12
turns this adds one window exchange to work the scorer already did.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from email_address_parser_spark.operators.cc import connected_components


def best_match_edges(scored: DataFrame, floor: float = 0.70) -> DataFrame:
    """scored(email_a, email_b, score) → kept best-match edges (src, dst):
    per node its single best-scoring neighbor at or above ``floor``
    (ties → smallest neighbor)."""
    above = scored.where(F.col("score") >= F.lit(floor)).select(
        "email_a", "email_b", "score"
    )
    sym = above.select(
        F.col("email_a").alias("node"), F.col("email_b").alias("nbr"), "score"
    ).unionAll(
        above.select(
            F.col("email_b").alias("node"), F.col("email_a").alias("nbr"), "score"
        )
    )
    w = Window.partitionBy("node").orderBy(
        F.col("score").desc(), F.col("nbr").asc()
    )
    return (
        sym.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(F.col("node").alias("src"), F.col("nbr").alias("dst"))
    )


def best_match_clusters(
    mentions: DataFrame, scored: DataFrame, floor: float = 0.70
) -> DataFrame:
    """→ (email, cluster_id): 1-NN star clustering of every distinct valid
    email; emails with no candidate ≥ floor are singletons."""
    nodes = (
        mentions.where(F.col("valid_lax"))
        .select("email")
        .dropDuplicates(["email"])
    )
    assigned = connected_components(best_match_edges(scored, floor=floor))
    return nodes.join(assigned, "email", "left").select(
        "email",
        F.coalesce(F.col("cluster_id"), F.col("email")).alias("cluster_id"),
    )
