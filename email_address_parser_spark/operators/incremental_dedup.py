"""G26 — incremental corpus deduplication: fold a new document batch into an
existing keep-best near-dup state without reprocessing the corpus.

The canonical 100 TB pipeline operation: a crawl/batch lands and must be
deduplicated against everything already ingested. A full re-dedup scales
with the corpus; this fold scales with the batch and its collision
neighborhood:

  1. MinHash band signatures, word-bigram gram sets, and quality scores are
     computed for the BATCH only (the same fixed-seed kernels as
     `dedup.minhash_near_dup` / `dedup.dedup_keep_best`, so verification and
     exemplar election semantics are bit-identical to the batch path);
  2. candidate pairs come from LSH band buckets PROBED by the batch: state
     bands are complete for every bucket, so the capped bucket population in
     the fold equals the full-recompute population, and only pairs touching
     a genuinely new document are generated (old↔old connectivity is already
     folded into `state.clusters`);
  3. exact word-bigram-Jaccard verification runs once per unique candidate
     pair, with the gram tables restricted to candidate ids (candidates are
     batch-sparse relative to the corpus — the opposite regime from the
     measured-and-rejected full-path semi-join in `minhash_near_dup`);
  4. previous clusters are contracted to their roots (quotient graph) and
     connected components runs on {verified new edges} only — the adaptive
     CC solves the batch-sized quotient on the driver (`operators/cc.py`);
  5. the keep-best exemplar (max quality_score, ties to lowest id) is
     RE-ELECTED only for touched clusters; untouched rows pass through.

Equivalence contract: `fold_docs` over `build_dedup_state(prev)` equals
`dedup_keep_best(prev ∪ batch, use_lsh=True)` under the same
no-cap-transition proviso as the identity fold (a band bucket that crosses
`max_bucket` only because the batch landed would have dropped its old↔old
pairs in a full recompute, but those pairs are already merged in state —
identical to `incremental.fold_batch`'s documented proviso). Pinned by
`tests/test_incremental_dedup.py` (single fold, chained folds, re-fold
no-op) and oracle-certified by the `dedup_keep_best_incr` driver query,
which triple-matches the SAME full-corpus recursive-CTE SQL as
`dedup_keep_best_lsh`.

In prod every state table is an Iceberg table bucketed by its join key
(bands by (band_idx, band_sig) for partition-pruned probes, grams/meta/
clusters by id), so the fold's state reads are co-located merge scans and
its writes are batch-sized MERGEs.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text_analysis import normalized_text, with_quality
from .cc import connected_components
from .dedup import _word_bigrams, _word_minhash_bands, dedup_keep_best
from .incremental import _make_pin

DEDUP_STATE_TABLES = ("bands", "grams", "meta", "clusters")


def _batch_tables(
    docs: DataFrame, text_col: str, id_col: str
) -> Dict[str, DataFrame]:
    """bands/grams/meta for one document set (the only UDF evaluation the
    fold performs — over the batch, never the corpus)."""
    norm = normalized_text(F.col(text_col))
    bands = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(_word_minhash_bands(norm)).alias("band_idx", "band_sig"),
    )
    grams = docs.select(
        F.col(id_col).alias("id"), F.explode(_word_bigrams(text_col)).alias("gram")
    )
    meta = with_quality(docs, text_col).select(
        F.col(id_col).alias("id"),
        F.size(_word_bigrams(text_col)).alias("gram_sz"),
        "quality_score",
    )
    return {"bands": bands, "grams": grams, "meta": meta}


def build_dedup_state(
    spark: SparkSession,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.2,
    max_bucket: int = 64,
) -> Dict[str, DataFrame]:
    """One-time bootstrap: the batch keep-best clustering plus the derived
    tables `fold_docs` maintains (band signatures, gram sets, sizes/quality,
    cluster assignments with kept flags)."""
    t = _batch_tables(docs, text_col, id_col)
    clusters = dedup_keep_best(
        docs,
        text_col=text_col,
        id_col=id_col,
        threshold=threshold,
        use_lsh=True,
        max_bucket=max_bucket,
    ).select(
        F.col(id_col).alias("id"), "cluster_id", "quality_score", "is_kept"
    )
    return {**t, "clusters": clusters}


def _new_incident_pairs(
    state_bands: DataFrame, batch_bands: DataFrame, max_bucket: int
) -> DataFrame:
    """Ordered unique (id_a, id_b) pairs within probed, size-capped band
    buckets, keeping only pairs that touch >= 1 new document. Same
    one-groupBy HOF explosion as dedup._bucket_pairs (single evaluation of
    the UDF-backed batch bands), with a per-id `new` flag riding the bucket
    array so old↔old pairs are dropped at explosion time."""
    probed = state_bands.join(
        batch_bands.select("band_idx", "band_sig").distinct(),
        ["band_idx", "band_sig"],
        "left_semi",
    )
    tagged = probed.withColumn("_n", F.lit(False)).unionByName(
        batch_bands.withColumn("_n", F.lit(True))
    )
    g = (
        tagged.groupBy("band_idx", "band_sig")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("id"), F.col("_n")))
            ).alias("ms")
        )
        .where((F.size("ms") >= 2) & (F.size("ms") <= max_bucket))
    )
    size = F.size(F.col("ms"))
    pairs = F.flatten(
        F.transform(
            F.col("ms"),
            lambda x, i: F.transform(
                F.slice(
                    F.col("ms"),
                    i + F.lit(2),
                    F.greatest(size - i - F.lit(1), F.lit(0)),
                ),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return (
        g.select(F.explode(pairs).alias("p"))
        .where(F.col("p.a._n") | F.col("p.b._n"))
        .select(F.col("p.a.id").alias("id_a"), F.col("p.b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )


def fold_docs(
    spark: SparkSession,
    new_docs: DataFrame,
    state: Dict[str, DataFrame],
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.2,
    max_bucket: int = 64,
    pin_mode: Optional[str] = None,
) -> Dict[str, DataFrame]:
    """Fold one document batch into `state`; returns {"delta", "clusters",
    "state", "updates"} where `delta` is the batch-sized set of new/changed
    rows (schema (id, cluster_id, quality_score, is_kept)), `clusters` the
    full updated view, `state` the updated state tables (lazy), and
    `updates` the batch-sized per-table frames a merge-on-read state store
    appends per fold (streaming.incremental_stream.write_state_mor).
    Re-applying an already-folded batch is a no-op (ids drain through the
    anti-join) — the restart-safety contract."""
    _fd_pin = _make_pin(pin_mode)
    batch = _batch_tables(new_docs, text_col, id_col)
    # restart safety: drop docs already in state (id is the dedupe key)
    # _pin (lazy localCheckpoint, not persist): each batch frame is
    # referenced by several downstream subtrees and each embeds the
    # gram/shingle kernel — checkpointing truncates the lineage so Catalyst
    # analyzes the kernel subtree once (the measured fold floor in the ER
    # fold was plan re-optimization, same shape here; see incremental.py's
    # LINEAGE_PIN_MODE note)
    new_ids = (
        batch["meta"].select("id").join(
            state["meta"].select("id"), "id", "left_anti"
        ).transform(_fd_pin)
    )
    b_bands = batch["bands"].join(new_ids, "id", "left_semi").transform(_fd_pin)
    b_grams = batch["grams"].join(new_ids, "id", "left_semi").transform(_fd_pin)
    b_meta = batch["meta"].join(new_ids, "id", "left_semi").transform(_fd_pin)

    cand = _new_incident_pairs(state["bands"], b_bands, max_bucket)

    # exact verification, gram tables pruned to candidate ids (batch-sparse)
    cand_ids = (
        cand.select(F.col("id_a").alias("id"))
        .union(cand.select(F.col("id_b").alias("id")))
        .distinct()
    )
    eg = (
        state["grams"].unionByName(b_grams)
        .join(F.broadcast(cand_ids), "id", "left_semi")
    )
    gsize = (
        state["meta"].select("id", "gram_sz")
        .unionByName(b_meta.select("id", "gram_sz"))
        .join(F.broadcast(cand_ids), "id", "left_semi")
    )
    matched = (
        cand.join(eg.select(F.col("id").alias("id_a"), "gram"), "id_a")
        .join(eg.select(F.col("id").alias("id_b"), "gram"), ["id_b", "gram"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    withcounts = matched.join(
        gsize.select(F.col("id").alias("id_a"), F.col("gram_sz").alias("_sa")),
        "id_a",
    ).join(
        gsize.select(F.col("id").alias("id_b"), F.col("gram_sz").alias("_sb")),
        "id_b",
    )
    union_sz = F.greatest(F.col("_sa") + F.col("_sb") - F.col("_inter"), F.lit(1))
    jac = F.round(F.col("_inter").cast("double") / union_sz.cast("double"), 6)
    edges = (
        withcounts.select("id_a", "id_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )

    # quotient contraction: old endpoints -> their cluster roots
    root_of = state["clusters"].select(
        F.col("id").alias("_member"), F.col("cluster_id").alias("_root")
    )
    rewritten = (
        edges.join(root_of, F.col("src") == F.col("_member"), "left")
        .select(F.coalesce("_root", "src").alias("src_q"), "dst")
        .join(root_of, F.col("dst") == F.col("_member"), "left")
        .select(
            F.col("src_q").alias("src"),
            F.coalesce("_root", "dst").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    quotient_assign = connected_components(rewritten).select(
        F.col("email").alias("id"), "cluster_id"
    )

    # relabel: old roots that joined a component take its (possibly new) min
    root_relabel = quotient_assign.select(
        F.col("id").alias("cluster_id"), F.col("cluster_id").alias("_new")
    )
    old_touched = (
        state["clusters"]
        .join(F.broadcast(root_relabel), "cluster_id")
        .select("id", F.col("_new").alias("cluster_id"), "quality_score")
    )
    new_assigned = quotient_assign.join(new_ids, "id", "left_semi").join(
        b_meta.select("id", "quality_score"), "id"
    )
    singletons = (
        new_ids.join(quotient_assign.select("id"), "id", "left_anti")
        .join(b_meta.select("id", "quality_score"), "id")
        .select("id", F.col("id").alias("cluster_id"), "quality_score")
    )
    # keep-best re-election over every touched cluster (same window rule as
    # dedup_keep_best: max quality, ties to the lowest id)
    w = Window.partitionBy("cluster_id").orderBy(F.desc("quality_score"), F.asc("id"))
    touched = (
        old_touched.unionByName(new_assigned).unionByName(singletons)
        .withColumn("is_kept", F.row_number().over(w) == F.lit(1))
    )
    untouched = state["clusters"].join(
        F.broadcast(root_relabel.select("cluster_id")), "cluster_id", "left_anti"
    )
    clusters_view = untouched.unionByName(touched)

    new_state = {
        "bands": state["bands"].unionByName(b_bands),
        "grams": state["grams"].unionByName(b_grams),
        "meta": state["meta"].unionByName(b_meta),
        "clusters": clusters_view,
    }
    # batch-sized update frames for a merge-on-read state store
    # (streaming.incremental_stream.write_state_mor): bands/grams/meta are
    # append-only batch rows; `touched` carries the complete re-elected row
    # for every cluster the batch touched, so latest-wins on id reconstructs
    # clusters_view exactly
    updates = {
        "bands": b_bands,
        "grams": b_grams,
        "meta": b_meta,
        "clusters": touched.select("id", "cluster_id", "quality_score", "is_kept"),
    }
    return {
        "delta": touched,
        "clusters": clusters_view,
        "state": new_state,
        "updates": updates,
    }
