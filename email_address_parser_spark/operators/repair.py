"""G61 — cannot-link constrained cluster repair: split wrongly-merged
clusters at the minimal edge-score level that separates reviewer-declared
non-matches.

This closes the loop the active-learning surface opens: G44 mines the
near-miss band for an annotator, G46 retrains the scorer from the labels —
but a label that says "these two addresses are NOT the same identity"
also has an IMMEDIATE consequence for the current clustering, and until
now the engine had no mechanism to apply it. Transitive closure is
precision's enemy: one borderline edge merges two whole identities
(er_threshold_clusters quantifies it), and the standard remedy
(Arasu et al., constrained clustering; Google/AWS entity-resolution
products expose it as "negative rules") is to cut the weakest evidence
until the constraint holds.

Semantics (deterministic, so the DuckDB twin replays it bit-for-bit):

  * a constraint (x, y) binds only if x and y share a cluster — satisfied
    constraints are no-ops;
  * per constrained cluster, the CUT LEVEL is the smallest distinct edge
    score t in that cluster such that keeping only edges with score > t
    disconnects EVERY constraint pair of the cluster. Removing by whole
    score levels (not edge-by-edge) is what makes the rule well-defined
    under ties — and monotone: raising t only disconnects more, so t is
    unique;
  * the repaired assignment is the connected components of the kept edges,
    labeled min-email (the engine's convention); untouched clusters pass
    through unchanged.

Scale shape: constraints and edges co-group by cluster_id (one hash
exchange each) and the search runs per cluster inside ``applyInPandas`` —
the same bounded-group justification as G60: per-cluster graphs are
identity-sized, levels per cluster are few, so the kernel is
O(levels × edges) per cluster with zero cross-group traffic. A wrong
merge is rare at 10^12 turns; the constrained-cluster slice is tiny and
everything else never enters a shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPLIT_SCHEMA = "email string, cluster_id string"


class _UF:
    __slots__ = ("p",)

    def __init__(self):
        self.p: dict = {}

    def find(self, x):
        p = self.p
        r = p.setdefault(x, x)
        while r != p[r]:
            r = p[r]
        while p[x] != r:
            p[x], x = r, p[x]
        return r

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[rb] = ra


def _split_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Minimal-level split of one cluster. Rows carry kind 'e' (edge:
    a, b, score) and 'c' (constraint: a, b)."""
    edges = [
        (a, b, s)
        for k, a, b, s in zip(pdf["kind"], pdf["a"], pdf["b"], pdf["score"])
        if k == "e"
    ]
    cons = [
        (a, b)
        for k, a, b in zip(pdf["kind"], pdf["a"], pdf["b"])
        if k == "c"
    ]
    members = sorted({v for a, b, _ in edges for v in (a, b)})
    levels = sorted({s for _, _, s in edges})
    if not levels:  # unreachable for a bound constraint's cluster
        return pd.DataFrame({"email": members, "cluster_id": members})
    for t in levels:
        uf = _UF()
        for v in members:
            uf.find(v)
        for a, b, s in edges:
            if s > t:
                uf.union(a, b)
        if all(uf.find(x) != uf.find(y) for x, y in cons):
            break
    # t is guaranteed to exist: at the top level no edges remain, every
    # member is a singleton, and a constraint never relates v to itself
    label: dict = {}
    for v in members:
        r = uf.find(v)
        if r not in label or v < label[r]:
            label[r] = v
    return pd.DataFrame(
        {
            "email": members,
            "cluster_id": [label[uf.find(v)] for v in members],
        }
    )


def constrained_split(
    clusters: DataFrame, edges: DataFrame, constraints: DataFrame
) -> DataFrame:
    """→ (email, cluster_id): the clustering with every cannot-link
    constraint enforced. `clusters` is (email, cluster_id); `edges` the
    accepted match set (src, dst, score) the clustering consumed;
    `constraints` is (email_x, email_y) reviewer-declared non-matches."""
    cmap = clusters.select("email", "cluster_id")
    # constraints bind only within a cluster (cross-cluster = satisfied)
    bound = (
        constraints.join(
            cmap.select(
                F.col("email").alias("email_x"), F.col("cluster_id").alias("_cx")
            ),
            "email_x",
        )
        .join(
            cmap.select(
                F.col("email").alias("email_y"), F.col("cluster_id").alias("_cy")
            ),
            "email_y",
        )
        .where(F.col("_cx") == F.col("_cy"))
        .select(
            F.col("_cx").alias("cluster_id"),
            F.col("email_x").alias("a"),
            F.col("email_y").alias("b"),
        )
        .localCheckpoint(eager=False)  # referenced by the slice semi-join
        # below AND the group input — the constraint set is review-sized
    )
    doomed_ids = bound.select("cluster_id").distinct()
    ce = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"), "score")
        .join(
            cmap.select(F.col("email").alias("a"), "cluster_id"), "a"
        )
        .join(F.broadcast(doomed_ids), "cluster_id", "left_semi")
    )
    grouped = ce.select(
        "cluster_id", F.lit("e").alias("kind"), "a", "b", "score"
    ).unionByName(
        bound.select(
            "cluster_id",
            F.lit("c").alias("kind"),
            "a",
            "b",
            F.lit(None).cast("double").alias("score"),
        )
    )
    repaired = grouped.groupBy("cluster_id").applyInPandas(
        _split_group, SPLIT_SCHEMA
    ).select("email", "cluster_id")
    untouched = cmap.join(
        F.broadcast(doomed_ids), "cluster_id", "left_anti"
    ).select("email", "cluster_id")
    return repaired.unionByName(untouched)


def must_link_merge(clusters: DataFrame, constraints: DataFrame) -> DataFrame:
    """G62 — must-link constrained merge: the other half of the review loop
    G61 opened. A reviewer-confirmed MATCH (x, y) that the thresholded
    pipeline separated must merge the two identities; the standard remedy
    (Arasu et al.'s positive rules; the "merge" action of commercial ER
    review consoles) is transitive closure over the accepted clustering
    plus the confirmed pairs.

    Semantics (deterministic): a constraint binds only if its endpoints sit
    in DIFFERENT clusters — same-cluster pairs are satisfied no-ops. The
    repaired assignment is the connected components of the CLUSTER QUOTIENT
    graph (one node per current cluster, one edge per binding constraint),
    relabeled with the engine's min-email convention — which at the
    quotient level is min(cluster_id), since every cluster label is already
    its own min member.

    Scale shape: two email-keyed hash joins bind the constraints (the
    review set is human-sized), then the quotient CC runs over a graph no
    larger than the constraint set — `connected_components`' adaptive
    driver path solves it without a single loop shuffle — and the remap
    joins back to `clusters` on cluster_id, broadcast because merged-group
    count ≤ constraints. Nothing in the corpus-sized table is rewritten or
    re-shuffled beyond that one broadcast-probe pass.

    → (email, cluster_id); untouched clusters pass through unchanged.
    """
    from email_address_parser_spark.operators.cc import connected_components

    cmap = clusters.select("email", "cluster_id")
    bound = (
        constraints.join(
            cmap.select(
                F.col("email").alias("email_x"), F.col("cluster_id").alias("_cx")
            ),
            "email_x",
        )
        .join(
            cmap.select(
                F.col("email").alias("email_y"), F.col("cluster_id").alias("_cy")
            ),
            "email_y",
        )
        .where(F.col("_cx") != F.col("_cy"))
        .select(F.col("_cx").alias("src"), F.col("_cy").alias("dst"))
        .distinct()
    )
    # quotient components: email-string labels in, min cluster label out
    remap = connected_components(bound).select(
        F.col("email").alias("cluster_id"), F.col("cluster_id").alias("_merged")
    )
    return cmap.join(F.broadcast(remap), "cluster_id", "left").select(
        "email",
        F.coalesce(F.col("_merged"), F.col("cluster_id")).alias("cluster_id"),
    )
