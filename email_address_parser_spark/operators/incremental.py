"""Batch-incremental cluster maintenance — fold new transcripts into an
existing clustering without reprocessing the corpus.

At 10^12 turns, re-running the full ER pipeline for every new day of
transcripts rescans the entire history to re-derive clusters that are
99.99% unchanged. `incremental_cluster_update` folds ONE new batch into an
existing clustering with cost proportional to |new batch| + |affected
neighborhood|:

  1. extract/canonicalize ONLY the new batch — the historical corpus is
     never rescanned; its distinct-email dim (`prev_uniq`) is the persisted
     state, exactly the table `pipeline.py` already checkpoints per stage
     (in prod: the mentions/uniq Iceberg snapshot);
  2. re-block the union dim (an O(|distinct emails|) aggregate + join over
     the tiny dim, NOT the corpus) and generate only pairs touching >= 1
     genuinely new email. Old<->old pairs are never regenerated — their
     match verdicts are already folded into `prev_clusters`;
  3. score only those pairs (same Arrow-batch JW/Levenshtein kernels as the
     batch path) and threshold to edges;
  4. run the iterative CC loop on {new-incident edges} UNION {star edges of
     the old clusters those edges touch} — the affected subgraph, not the
     corpus graph. Depth-1 stars preserve old-component connectivity
     exactly, so transitive merges across old clusters happen in the loop;
  5. pass every untouched cluster through unchanged (anti-join on the
     affected cluster-id set — a semi/anti pair on the clusters table, the
     only full-state shuffle, and it is keyed by the already-partitioned
     cluster table).

Equivalence contract (asserted by tests/test_incremental.py): with the same
blocking/scoring config and no data-driven blocking transition between runs
(no domain crossing `hot_threshold`, no LSH bucket crossing the cap — both
monotone corpus-growth events), the output is row-identical to
`pipeline.cluster_mentions` over the full corpus:

  * old components enter the loop as depth-1 stars, so their transitive
    closure is preserved;
  * a new email's edge set under union-dim blocking is exactly the edge set
    the full run would give it (blocking keys are pure functions of the
    email string plus union-dim statistics);
  * old<->old edges add nothing — their closure IS `prev_clusters`.

When a blocking transition DOES occur, the full path only ever REMOVES
candidate pairs (salt splits, bucket-cap evictions); the incremental path
never unmerges, so its clusters are the closure of a superset of the full
path's edges. Match-key recall is unaffected either way: same-key variants
share the dotless-local salt hash, hence the block, under every salting
state (`blocking.with_salted_domain_block`), which is what the BASELINE
F1 >= 0.99 acceptance keys on.

Reference tie-in: the per-address semantics (what counts as the same
identity) remain the Rust crate's parse/canonicalize contract
(rust-lib/src/email_address.rs getters; nom_parser.rs grammar) — this
module only changes WHEN pairwise work is redone, never what a pair scores.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .blocking import (
    minhash_bands_udf,
    uniq_valid_mentions,
    with_salted_domain_block,
)
from .cc import connected_components
from .extract import extract_mentions, with_canonical
from .scoring import DEFAULT_THRESHOLD, match_edges, score_pairs


def _restricted_pairs(
    blocked: DataFrame,
    key: list,
    cross_block: bool = False,
) -> DataFrame:
    """Self-join on `key`, keeping only pairs with >= 1 new side, each
    unordered pair exactly once:

      * new<->new: emitted once by the `email_a < email_b` predicate;
      * new<->old: the new row is always the `a` side (old<->old never
        joins), so the pair appears exactly once regardless of email order —
        the output columns are least/greatest-normalized so downstream
        scoring sees the same (email_a < email_b) orientation as the batch
        path (the feature set is symmetric, so normalization is free).
    """
    a = blocked.where(F.col("_is_new")).alias("a")
    b = blocked.alias("b")
    cond = (~F.col("b._is_new")) | (F.col("a.email") < F.col("b.email"))
    cond = cond & (F.col("a.email") != F.col("b.email"))
    if cross_block:
        cond = cond & (F.col("a.block_key") != F.col("b.block_key"))
    a_first = F.col("a.email") < F.col("b.email")

    def pick(col: str, first: bool):
        lhs, rhs = (f"a.{col}", f"b.{col}") if first else (f"b.{col}", f"a.{col}")
        return F.when(a_first, F.col(lhs)).otherwise(F.col(rhs))

    return (
        a.join(b, on=key)
        .where(cond)
        .select(
            F.least(F.col("a.email"), F.col("b.email")).alias("email_a"),
            F.greatest(F.col("a.email"), F.col("b.email")).alias("email_b"),
            pick("local_canon", True).alias("local_canon_a"),
            pick("local_canon", False).alias("local_canon_b"),
            pick("domain_canon", True).alias("domain_canon_a"),
            pick("domain_canon", False).alias("domain_canon_b"),
        )
    )


def incremental_candidate_pairs(
    updated_dim: DataFrame,
    hot_threshold: int = 10_000,
    target_block_size: int = 5_000,
    use_lsh: bool = True,
    lsh_max_bucket: int = 50,
) -> DataFrame:
    """Candidate pairs touching >= 1 new email, over the flagged union dim
    (`_is_new` boolean column). Channel structure mirrors
    `blocking.candidate_pairs` — exact salted-block channel plus the
    cross-block same-domain LSH channel, disjoint by the same block-key
    argument, so no full-pair dedup shuffle runs here either."""
    blocked = with_salted_domain_block(
        updated_dim, hot_threshold, target_block_size
    ).persist()

    pairs = _restricted_pairs(
        blocked.select("block_key", "email", "local_canon", "domain_canon", "_is_new"),
        ["block_key"],
    )

    if use_lsh:
        with_bands = blocked.select(
            "email",
            "local_canon",
            "domain_canon",
            "block_key",
            "_is_new",
            F.posexplode(minhash_bands_udf(F.col("local_canon"))).alias(
                "band_idx", "band_sig"
            ),
        )
        # bucket sizes are computed over the UNION dim so cap decisions match
        # what a full recompute over the grown corpus would make
        bucket_sizes = with_bands.groupBy("band_idx", "band_sig").agg(
            F.count(F.lit(1)).alias("_bn")
        )
        bounded = with_bands.join(
            bucket_sizes.where(F.col("_bn") <= lsh_max_bucket),
            ["band_idx", "band_sig"],
        )
        lsh_pairs = _restricted_pairs(
            bounded, ["band_idx", "band_sig", "domain_canon"], cross_block=True
        ).dropDuplicates(["email_a", "email_b"])
        pairs = pairs.unionByName(lsh_pairs)
    return pairs


def incremental_cluster_update(
    spark: SparkSession,
    new_transcripts: DataFrame,
    prev_clusters: DataFrame,
    prev_uniq: DataFrame,
    hot_threshold: int = 10_000,
    target_block_size: int = 5_000,
    use_lsh: bool = True,
    lsh_max_bucket: int = 50,
    threshold: float = DEFAULT_THRESHOLD,
    new_mentions: Optional[DataFrame] = None,
) -> Dict[str, DataFrame]:
    """Fold `new_transcripts` into (`prev_clusters`, `prev_uniq`).

    prev_clusters: (email, cluster_id) — output of a prior
        `pipeline.cluster_mentions` / this function (cluster_id = min email
        of the component; every distinct valid email has a row).
    prev_uniq: (email, local_canon, domain_canon, match_key) — the distinct
        valid-email dim of everything already clustered
        (`blocking.uniq_valid_mentions`; pipeline checkpoints it).

    Returns {"clusters", "uniq", "edges"}:
      clusters — the full updated assignment (old + new emails);
      uniq     — the updated dim (state for the next batch);
      edges    — the new-incident match edges found this batch (audit /
                 lineage; the old edge set is never rematerialized).
    """
    if new_mentions is None:
        new_mentions = with_canonical(extract_mentions(new_transcripts))
    batch_uniq = uniq_valid_mentions(new_mentions)
    new_uniq = batch_uniq.join(
        prev_uniq.select("email"), "email", "left_anti"
    ).persist()
    updated_uniq = prev_uniq.unionByName(new_uniq)

    dim_cols = ["email", "local_canon", "domain_canon"]
    updated_dim = (
        prev_uniq.select(*dim_cols).withColumn("_is_new", F.lit(False))
    ).unionByName(new_uniq.select(*dim_cols).withColumn("_is_new", F.lit(True)))

    pairs = incremental_candidate_pairs(
        updated_dim,
        hot_threshold=hot_threshold,
        target_block_size=target_block_size,
        use_lsh=use_lsh,
        lsh_max_bucket=lsh_max_bucket,
    )
    edges = match_edges(score_pairs(pairs), threshold).persist()

    # affected neighborhood: old clusters containing any edge endpoint
    edge_emails = (
        edges.select(F.col("src").alias("email"))
        .union(edges.select(F.col("dst").alias("email")))
        .distinct()
    )
    affected_ids = (
        prev_clusters.join(edge_emails, "email", "semi")
        .select("cluster_id")
        .distinct()
    )
    affected = prev_clusters.join(affected_ids, "cluster_id", "semi")
    star_edges = affected.where(F.col("email") != F.col("cluster_id")).select(
        F.col("cluster_id").alias("src"), F.col("email").alias("dst")
    )

    assignments = connected_components(
        edges.select("src", "dst").unionByName(star_edges)
    )

    untouched = prev_clusters.join(affected_ids, "cluster_id", "left_anti")
    singletons = (
        new_uniq.select("email")
        .join(assignments.select("email"), "email", "left_anti")
        .select("email", F.col("email").alias("cluster_id"))
    )
    clusters = untouched.unionByName(assignments).unionByName(singletons)
    return {"clusters": clusters, "uniq": updated_uniq, "edges": edges}
