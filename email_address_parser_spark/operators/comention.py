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
