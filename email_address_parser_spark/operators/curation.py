"""G71 — the end-to-end corpus-curation pipeline: one operator that
composes the training-data hygiene stages the engine ships individually
into the manifest a pretraining run actually consumes.

Stage order follows the standard LLM-corpus recipe (the Gopher/RefinedWeb
lineage: cheap row-local filters first, pairwise work last, assignment at
the end):

  1. FILTER — language gate (G10 marker LID), Gopher repetition gate
     (G28), quality floor (G9 composite score). Row-local, Catalyst-only:
     at 100 TB this pass is a scan that prunes before anything shuffles.
  2. EXACT DEDUP (G1) — md5 of normalized text over the SURVIVORS (the
     canonical twin of a filtered-out duplicate must not resurrect it),
     keep the minimum id per fingerprint.
  3. NEAR-DUP KEEP-BEST (G22) — Jaccard edges → connected components →
     highest-quality exemplar per cluster, again over the current
     survivor set.
  4. SPLIT ASSIGNMENT (G18) — the deterministic md5-uniform train/val/test
     hash over whatever survived.

Benchmark decontamination (G25) deliberately stays OUT of this operator:
it is split-relative (train vs a benchmark set) and runs as its own
certified stage (`doc_decontam`) after splits exist.

Every stage recomputes over the CURRENT survivor set — composing the
standalone per-stage outputs by intersection would be wrong (e.g. a doc
whose exact-duplicate canonical was removed by the quality filter must
become its own canonical). The er "doc_curation" oracle replays the whole
chain stage-for-stage in SQL, so the triple-match certifies the
composition, not just the pieces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def curate_corpus(
    docs: DataFrame,
    quality_cut: float = 0.70,
    lang: str = "en",
    threshold: float = 0.6,
) -> DataFrame:
    """→ (doc_id, split, quality_score): the curated-corpus manifest.

    Scale shape: stage 1 is one scan (the three flag frames join on
    doc_id — high-cardinality keys, map-side prunable); stages 2-3 run on
    the shrinking survivor set with the same bounded-block shapes their
    standalone operators have; stage 4 is a pure hash of the key. The
    manifest is the smallest artifact that downstream packing (G19) and
    decontamination (G25) need."""
    from ..functions.text_analysis import (
        with_lang_id,
        with_quality,
        with_repetition,
    )
    from .dedup import dedup_keep_best, exact_dedup
    from .sampling import split_assign

    flags = (
        with_quality(docs)
        .select("doc_id", "quality_score")
        .join(with_lang_id(docs).select("doc_id", "lang_pred"), "doc_id")
        .join(with_repetition(docs).select("doc_id", "rep_keep"), "doc_id")
    )
    keep1 = flags.where(
        (F.col("lang_pred") == F.lit(lang))
        & F.col("rep_keep")
        & (F.col("quality_score") >= F.lit(quality_cut))
    ).select("doc_id", "quality_score")
    sv1 = docs.join(keep1.select("doc_id"), "doc_id", "left_semi")

    ex = exact_dedup(sv1)
    sv2 = sv1.join(
        ex.where(~F.col("is_duplicate")).select("doc_id"), "doc_id", "left_semi"
    )

    kb = dedup_keep_best(sv2, threshold=threshold)
    sv3 = sv2.join(
        kb.where(F.col("is_kept")).select("doc_id"), "doc_id", "left_semi"
    )

    return (
        split_assign(sv3)
        .select("doc_id", "split")
        .join(keep1, "doc_id")
        .select("doc_id", "split", "quality_score")
    )
