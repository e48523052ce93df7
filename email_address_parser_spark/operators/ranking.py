"""TF-IDF term ranking over the `documents` corpus (G29).

A training-data pipeline uses per-document salient terms for corpus
exploration, topic-balanced sampling, and cheap keyword-level dedup triage.
This operator computes smoothed TF-IDF scores and the top-k terms per
document, entirely with builtin Catalyst expressions — no Python anywhere.

Plan shape (the 100 TB story):

  * term frequencies: one explode of the whitespace tokens of the normalized
    text followed by a `(doc, term)` count — map-side partial aggregation
    makes this a word count, the canonical linearly-scaling Spark job;
  * document frequencies: a second aggregation keyed on `term` alone — the
    result is VOCABULARY-sized, orders of magnitude smaller than the corpus,
    so it rides back in as a broadcast dim (`F.broadcast`) and the join adds
    no shuffle. On a corpus whose vocabulary outgrows broadcast (web-scale
    multilingual), drop the hint and AQE falls back to a sort-merge join on
    `term` — the code path is the same;
  * corpus size N: a 1-row aggregate crossJoined in (collect-free, same
    pattern as the IVF split in `__spark_entry__`);
  * top-k: `row_number` over `(doc_id)` ordered by (score DESC, term ASC) —
    per-document groups are tiny, so the window is a keyed shuffle with no
    skew beyond document length itself.

Scores use the standard smoothed formulation `tf * (ln((N+1)/(df+1)) + 1)`,
rounded to 6 decimals so the DuckDB oracle replays it bit-stably.

Reference anchor: the reference is a scalar string kernel
(`rust-lib/src/nom_parser.rs`); the parallel here is the same
compile-once/stream-everything discipline applied to corpus statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from email_address_parser_spark.functions.text_analysis import normalized_text


def tfidf_topk(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_df_dim: bool = True,
) -> DataFrame:
    """Top-k TF-IDF terms per document: (id, term, tf, score, rank).

    `broadcast_df_dim=False` lets callers with a huge vocabulary force the
    sort-merge path explicitly instead of relying on AQE demotion.
    """
    toks = F.split(normalized_text(F.col(text_col)), " ")
    terms = docs.select(
        F.col(id_col), F.explode(toks).alias("term")
    ).where(F.col("term") != "")
    # lazy-pin the corpus-sized TF table: it feeds both the scored output and
    # the DF dim, and Spark reuses no exchanges across the two subtree copies
    # (the explode + first shuffle would run TWICE otherwise — the dominant
    # cost at corpus scale). Same pattern as streaming/_resolve_latest.
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf")).localCheckpoint(
        eager=False
    )

    dft = tf.groupBy("term").agg(F.count("*").alias("df_t"))
    if broadcast_df_dim:
        dft = F.broadcast(dft)
    n_docs = F.broadcast(
        docs.agg(F.count_distinct(F.col(id_col)).alias("_n_docs"))
    )

    scored = (
        tf.join(dft, "term")
        .crossJoin(n_docs)
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("_n_docs") + F.lit(1.0))
                        / (F.col("df_t") + F.lit(1.0))
                    )
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tf", "score", "rank")
    )
