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

PATTERN_COLS = ["g_dotless", "g_domain", "g_lev", "g_jw"]


def with_agreement_bits(scored: DataFrame) -> DataFrame:
    """Add the 4 agreement-bit columns to scored pairs (pure Catalyst)."""
    return (
        scored.withColumn("g_dotless", F.col("dotless_eq") == F.lit(1.0))
        .withColumn("g_domain", F.col("dom_edit") == F.lit(0))
        .withColumn("g_lev", F.col("lev_local") <= F.lit(LEV_AGREE))
        .withColumn("g_jw", F.col("jw_local") >= F.lit(JW_AGREE))
    )


def fs_weights(scored_labeled: DataFrame) -> DataFrame:
    """Per-pattern (m, u, llr weight) rows from labeled scored pairs.

    `scored_labeled` = score_pairs output joined with truth labels as mk_a /
    mk_b (the er_match_f1 join). Returns one row per OBSERVED pattern:
    (g_dotless, g_domain, g_lev, g_jw, n_match, n_unmatch, m, u, weight)."""
    truth = (F.col("mk_a") == F.col("mk_b")).cast("long")
    cells = (
        with_agreement_bits(scored_labeled)
        .select(*PATTERN_COLS, truth.alias("is_match"))
        .groupBy(*PATTERN_COLS)
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


def fs_evaluate(scored_labeled: DataFrame, salt: str = "fs") -> DataFrame:
    """Held-out evaluation of the FS decision rule — one metrics row.

    The labeled pairs split 50/50 by the same engine-neutral md5 uniform as
    doc_splits (a pure function of (salt, email_a, email_b): no RNG state,
    stable under repartitioning). Weights are estimated on the train half
    (fs_weights) and broadcast-joined onto the held-out half by the 4
    agreement bits; the decision is `llr_weight >= 0` (the likelihood-ratio
    test at even prior odds), with a pattern UNSEEN in training abstaining
    to non-match (coalesce false — the conservative default a production
    linker uses for unmodeled patterns).

    Scale shape: two passes over the already-blocked pair stream (one
    aggregation to the ≤16-row weight dim, one broadcast join + single-row
    metric aggregate). Float style matches er_match_f1 (single divisions,
    round 6)."""
    from email_address_parser_spark.operators.sampling import _uniform_hash

    u = _uniform_hash(
        F.concat(F.lit(salt + ":"), F.col("email_a"), F.lit("|"), F.col("email_b"))
    )
    bits = with_agreement_bits(scored_labeled).withColumn("_u", u)
    train = bits.where(F.col("_u") < F.lit(0.5))
    hold = bits.where(F.col("_u") >= F.lit(0.5))
    w = fs_weights(train).select(*PATTERN_COLS, "llr_weight")
    decided = hold.join(F.broadcast(w), PATTERN_COLS, "left")
    pred = F.coalesce(F.col("llr_weight") >= F.lit(0.0), F.lit(False))
    truth = F.col("mk_a") == F.col("mk_b")
    agg = decided.agg(
        F.count(F.lit(1)).alias("n_eval"),
        F.sum((pred & truth).cast("long")).alias("tp"),
        F.sum((pred & ~truth).cast("long")).alias("fp"),
        F.sum((~pred & truth).cast("long")).alias("fn"),
    )
    p_raw = F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))
    r_raw = F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))
    return (
        agg.withColumn("_p", p_raw)
        .withColumn("_r", r_raw)
        .select(
            "n_eval",
            "tp",
            "fp",
            "fn",
            F.round(F.col("_p"), 6).alias("precision"),
            F.round(F.col("_r"), 6).alias("recall"),
            F.round(
                F.when(
                    F.col("_p") + F.col("_r") > 0,
                    F.lit(2.0) * F.col("_p") * F.col("_r") / (F.col("_p") + F.col("_r")),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("f1"),
        )
    )
