"""G55 — domain alias discovery: map typo'd / variant domains to their
canonical spelling from corpus evidence.

Production identity systems maintain a domain-alias dimension (gmail.com ==
googlemail.com, typo domains -> the real registrar) that ingest-time
canonicalization broadcasts. This operator LEARNS that dimension from the
corpus itself: a domain whose spelling is within a small edit distance of a
strictly-more-populous domain is declared an alias of the most-populous such
neighbor (ties broken lexicographically, so the map is deterministic under
any partitioning).

Spark-first shape — everything happens on the DOMAIN dimension, which is
|distinct domains| (millions at web scale, 10 rows in the sandbox), never on
mentions:

1. one groupBy builds the domain dim with its distinct-email population;
2. candidate pairs come from a character-4-gram block join on the dim
   (shared gram => candidate), with over-populous grams purged exactly like
   metablocking — at web scale this bounds the self-join; an all-pairs join
   over millions of domains would not fly, a gram-blocked one does;
3. `levenshtein(d1, d2) <= max_edit` confirms, populations orient the edge
   (alias = the strictly smaller side), and a max_by/min window picks ONE
   canonical target per alias.

The result is broadcast-sized by construction (<= one row per domain). The
survivorship operator (G40) repairs spellings per cluster AFTER matching;
this map repairs them at ingest BEFORE blocking — the two ends of the same
data-quality loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRAM_K = 4
DEFAULT_MAX_EDIT = 2
DEFAULT_MAX_GRAM_BLOCK = 10_000


def domain_dim(uniq: DataFrame) -> DataFrame:
    """(domain_canon, n_emails): the domain dimension with its population."""
    return uniq.groupBy("domain_canon").agg(
        F.count(F.lit(1)).alias("n_emails")
    )


def domain_aliases(
    uniq: DataFrame,
    max_edit: int = DEFAULT_MAX_EDIT,
    max_gram_block: int = DEFAULT_MAX_GRAM_BLOCK,
) -> DataFrame:
    """(alias_domain, canonical_domain, edit, n_alias, n_canon) — one row per
    domain that aliases to a strictly-more-populous near-spelling.

    `uniq` is the distinct-email dim (uniq_valid_mentions). The gram block
    join is DISTINCT-deduplicated before the (cheap, dim-sized) levenshtein
    confirm; the per-alias winner is the max-population candidate, ties to
    the lexicographically smallest domain."""
    dim = domain_dim(uniq)
    grams = dim.select(
        "domain_canon",
        "n_emails",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.greatest(
                            F.length("domain_canon") - (GRAM_K - 1), F.lit(1)
                        ),
                    ),
                    lambda i: F.col("domain_canon").substr(i, F.lit(GRAM_K)),
                )
            )
        ).alias("gram"),
    )
    # purge grams shared by too many domains (".example.com" suffix grams in
    # the sandbox; ".com" grams at web scale) — same stop-key move as
    # metablocking's block purging, and the bound on the self-join fan-out
    gram_sizes = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("gn"))
    grams = grams.join(
        gram_sizes.where(F.col("gn") <= F.lit(max_gram_block)).select("gram"),
        "gram",
    )
    a = grams.select(
        F.col("gram"),
        F.col("domain_canon").alias("alias_domain"),
        F.col("n_emails").alias("n_alias"),
    )
    b = grams.select(
        F.col("gram"),
        F.col("domain_canon").alias("canonical_domain"),
        F.col("n_emails").alias("n_canon"),
    )
    cand = (
        a.join(b, "gram")
        # orientation: alias is STRICTLY less populous (an equal-population
        # pair carries no evidence which spelling is right — excluded)
        .where(F.col("n_alias") < F.col("n_canon"))
        .select("alias_domain", "n_alias", "canonical_domain", "n_canon")
        .dropDuplicates(["alias_domain", "canonical_domain"])
        .withColumn(
            "edit", F.levenshtein("alias_domain", "canonical_domain")
        )
        .where(F.col("edit") <= F.lit(max_edit))
    )
    # one winner per alias: most-populous canonical, ties lexicographically
    # smallest — an alias-keyed row_number window (the dim is tiny; at web
    # scale it partitions on alias_domain, no global sort)
    from pyspark.sql import Window

    w = Window.partitionBy("alias_domain").orderBy(
        F.col("n_canon").desc(), F.col("canonical_domain").asc()
    )
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("alias_domain", "canonical_domain", "edit", "n_alias", "n_canon")
    )
