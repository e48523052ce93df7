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


def collocations_topk(
    docs: DataFrame,
    k: int = 100,
    min_count: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_unigram_dim: bool = True,
) -> DataFrame:
    """G39: corpus-level bigram collocations ranked by pointwise mutual
    information — the classic statistical phrase detector (Church & Hanks
    1990; the same PMI scorer word2vec's phrase pass and Gensim's Phrases
    use). A training-data pipeline runs this to mine multi-word entities and
    to pick phrase-level tokens worth protecting from BPE splits.

    → (bigram, c_xy, c_x, c_y, pmi, rank): the global top-k bigrams with
    c_xy >= min_count, ranked by PMI desc (ties: bigram asc).

    PMI = ln( (c_xy / N_bi) / ((c_x / N_uni) * (c_y / N_uni)) ), computed in
    exactly that association order and rounded to 6 decimals so the DuckDB
    oracle replays it bit-stably (same discipline as tfidf_topk's score).

    Plan shape (100 TB): tokenization is one regexp per document; unigram and
    bigram counts are word-count aggregations with map-side partial combine
    (linear scaling, the canonical Spark job). The unigram count table is
    VOCABULARY-sized — orders of magnitude below the corpus — so it rides in
    twice as a broadcast dim keyed on each side of the bigram (AQE demotes to
    sort-merge if a web-scale multilingual vocabulary outgrows the hint, same
    seam as tfidf_topk). The final global top-k is a single-partition
    row_number over the min_count-filtered bigram list — already collapsed to
    far below vocabulary size, the same "tiny tail after a linear pass" shape
    as q3's TopK."""
    from email_address_parser_spark.functions.text_analysis import WORD_RE

    words = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), 0)
    tok = docs.select(F.col(id_col), words.alias("w"))
    # every token occurrence (unigram universe) and every adjacent pair
    uni = (
        tok.select(F.explode("w").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c"))
    )
    bigrams = tok.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("w"), 1, F.greatest(F.size("w") - 1, F.lit(0))),
                F.slice(F.col("w"), 2, F.greatest(F.size("w") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("x"), b.alias("y")),
            )
        ).alias("p")
    ).select(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
    bi = bigrams.groupBy("x", "y").agg(F.count("*").alias("c_xy"))

    n_uni = F.broadcast(uni.agg(F.sum("c").alias("_n_uni")))
    n_bi = F.broadcast(bi.agg(F.sum("c_xy").alias("_n_bi")))
    ux = uni.select(F.col("term").alias("x"), F.col("c").alias("c_x"))
    uy = uni.select(F.col("term").alias("y"), F.col("c").alias("c_y"))
    if broadcast_unigram_dim:
        ux, uy = F.broadcast(ux), F.broadcast(uy)

    scored = (
        bi.where(F.col("c_xy") >= min_count)
        .join(ux, "x")
        .join(uy, "y")
        .crossJoin(n_uni)
        .crossJoin(n_bi)
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    (F.col("c_xy") / F.col("_n_bi"))
                    / (
                        (F.col("c_x") / F.col("_n_uni"))
                        * (F.col("c_y") / F.col("_n_uni"))
                    )
                ),
                6,
            ),
        )
        .withColumn("bigram", F.concat_ws(" ", "x", "y"))
    )
    # intentional unpartitioned window: Catalyst rewrites rank<=k over it
    # into WindowGroupLimit (per-partition top-k heaps before the single
    # merge — pinned by test_plans.py), so despite the WindowExec warning
    # only ~k rows per input partition ever reach the final task
    w = Window.orderBy(F.desc("pmi"), F.asc("bigram"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "bigram",
            "c_xy",
            "c_x",
            "c_y",
            "pmi",
            F.col("rank").cast("int").alias("rank"),
        )
    )
