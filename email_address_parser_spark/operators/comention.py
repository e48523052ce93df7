"""Conversation co-mention affinity graph.

Transcript-specific context signal the mention STRING cannot carry: two
addresses repeatedly co-mentioned in the same conversations are related
(the same thread's participants / cc-list), which a downstream scorer can
consume as positive context — or as negative evidence (two addresses
co-mentioned in the SAME turn are usually distinct people; a sender rarely
cc's their own alias). The reference is a parser and has no counterpart;
this is the standard entity co-occurrence graph over the input_hint's
(conv_id, turn) structure.

Scale shape: the quadratic step is PER CONVERSATION and capped — distinct
(conv_id, email) first (one shuffle), conversations with more than
`max_emails_per_conv` distinct addresses are dropped whole (mega-threads /
mailing-list digests produce O(K²) noise edges and no signal; the cap is
the same move as the LSH bucket caps). The self-join is keyed on conv_id,
the final count groups by the pair — every shuffle key is
high-cardinality, and the fan-out is ≤ cap²/2 rows per conversation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def comention_edges(
    mentions: DataFrame, max_emails_per_conv: int = 16
) -> DataFrame:
    """(email_a < email_b, n_convs) affinity edges: the number of distinct
    conversations in which both valid addresses are mentioned, over
    conversations with at most `max_emails_per_conv` distinct addresses."""
    ce = (
        mentions.where(F.col("valid_lax"))
        .select("conv_id", "email")
        .dropDuplicates(["conv_id", "email"])
    )
    small = (
        ce.groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") <= max_emails_per_conv)
        .select("conv_id")
    )
    kept = ce.join(small, "conv_id")
    a = kept.select("conv_id", F.col("email").alias("email_a"))
    b = kept.select("conv_id", F.col("email").alias("email_b"))
    pairs = a.join(b, "conv_id").where(F.col("email_a") < F.col("email_b"))
    # (conv_id, email) is distinct above, so count(*) == distinct convs
    return pairs.groupBy("email_a", "email_b").agg(
        F.count(F.lit(1)).alias("n_convs")
    )


def context_promoted_pairs(
    scored: DataFrame,
    affinity: DataFrame,
    band: tuple = (0.70, 0.90),
    min_convs: int = 2,
) -> DataFrame:
    """G66 half 1 — relational evidence promotion: near-miss pairs (string
    score inside ``band``, i.e. below the match threshold) whose addresses
    are co-mentioned in at least ``min_convs`` conversations. The string
    scorer alone cannot accept them; the transcript structure can.
    → (src, dst, score, n_convs)."""
    lo, hi = band
    return (
        scored.where((F.col("score") >= F.lit(lo)) & (F.col("score") < F.lit(hi)))
        .join(affinity, ["email_a", "email_b"])
        .where(F.col("n_convs") >= F.lit(min_convs))
        .select(
            F.col("email_a").alias("src"),
            F.col("email_b").alias("dst"),
            "score",
            "n_convs",
        )
    )


def collective_clusters(
    mentions: DataFrame,
    scored: DataFrame,
    threshold: float = None,
    band: tuple = (0.70, 0.90),
    min_convs: int = 2,
    max_emails_per_conv: int = 16,
) -> DataFrame:
    """G66 — collective entity resolution (Bhattacharya & Getoor 2007, the
    relational-evidence family): cluster over the accepted string-match
    edges UNION the context-promoted near-misses. A pair of addresses whose
    string similarity falls just short of the threshold but which travel
    together through ≥ ``min_convs`` conversations is accepted on the
    combined evidence — the transcript-native signal a pure string pipeline
    throws away.

    Determinism: promotion is a pure predicate on (score, n_convs), both
    deterministic; promoted edges are disjoint from threshold edges by
    construction (band sits strictly below the cut), so the union is
    duplicate-free and the clustering is a pure function of the corpus.

    Scale shape: the affinity graph is the G47 capped per-conversation
    quadratic; the promotion join keys on the pair (high-cardinality,
    band-filtered so the probe side is the small near-miss sliver); CC
    sees |edges| + |promotions| rows. One extra keyed join over what the
    main pipeline already pays.

    → (email, cluster_id), every valid email assigned.
    """
    from email_address_parser_spark.operators.scoring import (
        DEFAULT_THRESHOLD,
        match_edges,
    )
    from email_address_parser_spark.pipeline import cluster_mentions

    cut = DEFAULT_THRESHOLD if threshold is None else threshold
    if band[1] > cut:
        raise ValueError(
            "promotion band must sit below the match cut "
            f"(band={band}, threshold={cut}) — otherwise promoted and "
            "accepted edges overlap and the union double-counts"
        )
    affinity = comention_edges(mentions, max_emails_per_conv=max_emails_per_conv)
    promoted = context_promoted_pairs(
        scored, affinity, band=band, min_convs=min_convs
    ).select("src", "dst", "score")
    edges = match_edges(scored, threshold=cut).unionByName(promoted)
    return cluster_mentions(mentions, edges)
