"""G60 — merge provenance: the BFS spanning tree of every resolved cluster.

Transitive clustering is the one ER stage whose output a human cannot
audit from the pairwise evidence alone: two addresses can share a cluster
while the pair itself was never scored (or scored BELOW threshold) —
they are merged through a CHAIN of accepted edges. The provenance report
a compliance/audit consumer needs is that chain: for every clustered
email, how far it sits from the cluster's canonical root, through which
neighbor it joined, and how strong that deciding edge was. A weak hop
high in a big cluster's tree is exactly where an erroneous merge (and a
G58 erasure request's scope surprise) hides — this is the
"why did we merge these?" artifact, complementing er_cluster_density
(aggregate) and er_channel_contribution (per-edge origin).

Semantics (fully deterministic, so the DuckDB twin replays it exactly):

  * tree root = the cluster id itself (the component's min email — the
    engine's label convention, so the root is always a member);
  * depth(v)  = BFS hop distance from the root over the accepted match
    edges (the same edge set clustering consumed);
  * parent(v) = the LEXICOGRAPHICALLY SMALLEST depth-1 neighbor of v —
    the tie-break that makes the tree unique under any partitioning;
  * parent_score = the accepted edge's score between v and parent(v);
  * singleton clusters emit their root row (depth 0, null parent).

Scale shape: the edge set is grouped by cluster (one hash exchange on a
high-cardinality key) and each group runs an in-memory BFS inside
``applyInPandas`` — the custom-operator escape hatch is justified here
because an iterative-join BFS would pay one driver barrier PER LEVEL
while the per-cluster graphs are bounded (identity sizes; the same
bounded-group argument as the capped blocking channels), so the pandas
kernel is O(cluster edges) with zero cross-group traffic, embarrassingly
parallel in the number of clusters at 10^12 turns.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TREE_SCHEMA = (
    "cluster_id string, email string, depth int, parent string, "
    "parent_score double"
)


def _bfs_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic min-parent BFS over one cluster's edge rows."""
    cid = pdf["cluster_id"].iat[0]
    adj: dict = {}
    score: dict = {}
    for s, d, w in zip(pdf["src"], pdf["dst"], pdf["score"]):
        adj.setdefault(s, []).append(d)
        adj.setdefault(d, []).append(s)
        score[(s, d)] = w
        score[(d, s)] = w
    depth = {cid: 0}
    parent = {cid: None}
    frontier = [cid]
    d = 0
    while frontier:
        d += 1
        nxt = set()
        # ascending u ⇒ first discovery IS the min-parent tie-break
        for u in sorted(frontier):
            for v in adj.get(u, ()):
                if v not in depth:
                    depth[v] = d
                    parent[v] = u
                    nxt.add(v)
        frontier = list(nxt)
    rows = sorted(depth)
    return pd.DataFrame(
        {
            "cluster_id": [cid] * len(rows),
            "email": rows,
            "depth": [depth[v] for v in rows],
            "parent": [parent[v] for v in rows],
            "parent_score": [
                score.get((parent[v], v)) if parent[v] is not None else None
                for v in rows
            ],
        }
    )


def cluster_merge_tree(clusters: DataFrame, edges: DataFrame) -> DataFrame:
    """→ (cluster_id, email, depth, parent, parent_score): one row per
    clustered email. `clusters` is (email, cluster_id); `edges` is the
    accepted match set (src, dst, score) the clustering consumed."""
    ce = edges.select("src", "dst", "score").join(
        clusters.select(F.col("email").alias("src"), "cluster_id"), "src"
    )
    trees = ce.groupBy("cluster_id").applyInPandas(_bfs_group, TREE_SCHEMA)
    # singletons (and any member untouched by an edge — impossible for a
    # connected component, but the anti-join makes the union total by
    # construction): root-only rows
    loners = clusters.join(
        trees.select("email"), "email", "left_anti"
    ).select(
        "cluster_id",
        "email",
        F.lit(0).cast("int").alias("depth"),
        F.lit(None).cast("string").alias("parent"),
        F.lit(None).cast("double").alias("parent_score"),
    )
    return trees.unionByName(loners)
