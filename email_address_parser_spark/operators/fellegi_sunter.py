"""G54 — Fellegi–Sunter agreement-pattern weights over labeled candidate pairs.

The classical record-linkage decision theory (Fellegi & Sunter, JASA 1969):
for each comparison-vector pattern g, estimate

    m_g = P(pattern = g | pair is a match)
    u_g = P(pattern = g | pair is a non-match)

and score a pair by the log-likelihood ratio ln(m_g / u_g). The hand-tuned
linear score (operators/scoring.py) and the IRLS logistic scorer
(operators/classifier.py) are the modern ends of the same spectrum; this
operator is the auditable middle: 16 rows a data steward can READ, each
saying how much evidence one agreement pattern carries.

Comparison vector (four agreement bits over the existing scored features, so
the operator adds no string kernels of its own):

    g_dotless : dotless locals equal           (dotless_eq = 1.0)
    g_domain  : canonical domains equal        (dom_edit = 0)
    g_lev     : local edit distance <= 1       (lev_local <= 1)
    g_jw      : Jaro-Winkler >= 0.94           (jw_local >= 0.94)

Estimation is one aggregation over the labeled candidate-pair stream —
groupBy the 4 bits, count matches/non-matches (truth = match_key equality
from the labeled table), then add-half smoothing against the 1-row totals
(broadcast, collect-free):

    m_g = (n_match_g + 0.5) / (n_match + 1.0)
    u_g = (n_unmatch_g + 0.5) / (n_unmatch + 1.0)
    w_g = round(ln(m_g / u_g), 6)

At 10^12 turns the aggregation is one scan of the already-blocked pair table
collapsing map-side to <= 16 rows — the same shape as the IRLS iteration
(classifier.py) and the threshold sweep. All arithmetic is integer counts +
single divisions + one ln, rounded to 6dp — the determinism contract the
DuckDB twin relies on (precedent: doc_collocations' PMI ln/round(6)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

JW_AGREE = 0.94
LEV_AGREE = 1


def fs_weights(scored_labeled: DataFrame) -> DataFrame:
    """Per-pattern (m, u, llr weight) rows from labeled scored pairs.

    `scored_labeled` = score_pairs output joined with truth labels as mk_a /
    mk_b (the er_match_f1 join). Returns one row per OBSERVED pattern:
    (g_dotless, g_domain, g_lev, g_jw, n_match, n_unmatch, m, u, weight)."""
    truth = (F.col("mk_a") == F.col("mk_b")).cast("long")
    cells = (
        scored_labeled.select(
            (F.col("dotless_eq") == F.lit(1.0)).alias("g_dotless"),
            (F.col("dom_edit") == F.lit(0)).alias("g_domain"),
            (F.col("lev_local") <= F.lit(LEV_AGREE)).alias("g_lev"),
            (F.col("jw_local") >= F.lit(JW_AGREE)).alias("g_jw"),
            truth.alias("is_match"),
        )
        .groupBy("g_dotless", "g_domain", "g_lev", "g_jw")
        .agg(
            F.sum("is_match").alias("n_match"),
            F.sum(F.lit(1) - F.col("is_match")).alias("n_unmatch"),
        )
    )
    # collect-free totals: 1-row aggregate of the tiny pattern dim, broadcast
    totals = cells.agg(
        F.sum("n_match").alias("tot_match"),
        F.sum("n_unmatch").alias("tot_unmatch"),
    )
    m = (F.col("n_match") + F.lit(0.5)) / (F.col("tot_match") + F.lit(1.0))
    u = (F.col("n_unmatch") + F.lit(0.5)) / (F.col("tot_unmatch") + F.lit(1.0))
    return cells.crossJoin(F.broadcast(totals)).select(
        "g_dotless",
        "g_domain",
        "g_lev",
        "g_jw",
        "n_match",
        "n_unmatch",
        F.round(m, 6).alias("m_prob"),
        F.round(u, 6).alias("u_prob"),
        F.round(F.log(m / u), 6).alias("llr_weight"),
    )
