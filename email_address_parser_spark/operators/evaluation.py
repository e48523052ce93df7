"""Cluster-quality evaluation: B-cubed precision / recall / F1 (G45), the
Adjusted Rand Index (G64), and MUC link-based F1 (G65).

B³ (Bagga & Baldwin 1998) is the standard per-item ER quality metric,
complementing pairwise F1 (`er_match_f1`), which weights clusters
quadratically in their size: for each item with predicted cluster C and
true cluster T, precision = |C ∩ T| / |C| and recall = |C ∩ T| / |T|;
B³P / B³R are the means over items. The reference repo is a parser and
has no counterpart; the metric definition is public literature.

Grouping items by (predicted cluster, true cluster) CELL turns the
per-item mean into keyed integer aggregations — no per-item fan-out,
no UDF. With n_ck = |cell|, n_c = |pred cluster|, n_k = |true cluster|:

    B³P · N = Σ_cells n_ck² / n_c        B³R · N = Σ_cells n_ck² / n_k

Scale shape: one item-keyed equi-join (pred ⋈ truth on email), one
(cluster_id, match_key) aggregation — its output is bounded by the number
of non-empty cells, which is ≤ items and in practice ≈ clusters — and two
size dims derived FROM the cells (never a rescan of the item table),
joined back on their own keys. Every shuffle is keyed on a
high-cardinality id; the final reduce is a single row. At 10^12 turns
this costs one email-keyed join more than the clustering itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bcubed(
    pred: DataFrame,
    truth: DataFrame,
    pred_col: str = "cluster_id",
    truth_col: str = "match_key",
    label: str | None = None,
) -> DataFrame:
    """One row: (n_emails, b3_precision, b3_recall, b3_f1) of the predicted
    clustering `pred(email, pred_col)` against the labeled `truth(email,
    truth_col)`. The universe is the inner join of the two email sets.

    Floats: the only order-sensitive operations are the two double sums
    over cells; everything else is exact integer arithmetic, and the
    outputs are rounded to 6 decimals (house parity convention — the
    DuckDB twin computes the identical expression shapes).
    """
    j = pred.select("email", pred_col).join(
        truth.select("email", truth_col), "email"
    )
    cells = j.groupBy(pred_col, truth_col).agg(F.count(F.lit(1)).alias("n_ck"))
    pred_sz = cells.groupBy(pred_col).agg(F.sum("n_ck").alias("n_c"))
    truth_sz = cells.groupBy(truth_col).agg(F.sum("n_ck").alias("n_k"))
    stats = (
        cells.join(pred_sz, pred_col)
        .join(truth_sz, truth_col)
        .agg(
            F.sum("n_ck").alias("n_emails"),
            F.sum(
                (F.col("n_ck").cast("double") * F.col("n_ck")) / F.col("n_c")
            ).alias("_sp"),
            F.sum(
                (F.col("n_ck").cast("double") * F.col("n_ck")) / F.col("n_k")
            ).alias("_sr"),
        )
    )
    out = stats.select(
        F.col("n_emails"),
        F.round(F.col("_sp") / F.col("n_emails"), 6).alias("b3_precision"),
        F.round(F.col("_sr") / F.col("n_emails"), 6).alias("b3_recall"),
        F.round(
            F.lit(2.0) * F.col("_sp") * F.col("_sr")
            / (F.col("n_emails") * (F.col("_sp") + F.col("_sr"))),
            6,
        ).alias("b3_f1"),
    )
    if label is not None:
        out = out.select(F.lit(label).alias("system"), "*")
    return out


def adjusted_rand(
    pred: DataFrame,
    truth: DataFrame,
    pred_col: str = "cluster_id",
    truth_col: str = "match_key",
    label: str | None = None,
) -> DataFrame:
    """G64: Adjusted Rand Index (Hubert & Arabie 1985) of the predicted
    clustering against the labeled truth — the third standard ER quality
    lens next to pairwise F1 (`er_match_f1`, quadratic in cluster size) and
    B³ (`bcubed`, linear): ARI is pair-counting like F1 but
    chance-corrected, so a degenerate all-singletons or one-big-cluster
    prediction scores ≈ 0 instead of inheriting the class imbalance.

    With contingency cells n_ck (same cells B³ uses), row sums n_c, column
    sums n_k, N items, and C2(n) = n(n-1)/2:

        index     = Σ_cells C2(n_ck)
        expected  = Σ_c C2(n_c) · Σ_k C2(n_k) / C2(N)
        max_index = (Σ_c C2(n_c) + Σ_k C2(n_k)) / 2
        ARI       = (index − expected) / (max_index − expected)

    Scale shape is identical to ``bcubed``: one email-keyed equi-join, one
    (pred, truth) cell aggregation bounded by the number of non-empty
    cells, two size dims derived from the cells, single-row reduce. Every
    sum is an integer-valued double (exact below 2^53); only the final
    ratio is a true float, rounded to 6 decimals (house parity
    convention). The reference repo is a parser with no counterpart; the
    metric is public literature.
    """
    j = pred.select("email", pred_col).join(
        truth.select("email", truth_col), "email"
    )
    cells = j.groupBy(pred_col, truth_col).agg(F.count(F.lit(1)).alias("n_ck"))

    def _c2(col: str) -> F.Column:
        c = F.col(col).cast("double")
        return c * (c - F.lit(1.0)) / F.lit(2.0)

    pred_sz = cells.groupBy(pred_col).agg(F.sum("n_ck").alias("n_c"))
    truth_sz = cells.groupBy(truth_col).agg(F.sum("n_ck").alias("n_k"))
    stats = cells.agg(
        F.sum("n_ck").alias("n_emails"),
        F.sum(_c2("n_ck")).alias("_idx"),
    ).crossJoin(
        pred_sz.agg(F.sum(_c2("n_c")).alias("_sc"))
    ).crossJoin(
        truth_sz.agg(F.sum(_c2("n_k")).alias("_sk"))
    )
    # degenerate guards (mirrored in the er_ari oracle SQL): with a single
    # item C2(N) = 0, so expected is pinned to 0; and when max_index ==
    # expected (both partitions degenerate-identical: all-singletons vs
    # all-singletons, or one-cluster vs one-cluster) the chance-corrected
    # ratio is 0/0 — the Hubert–Arabie convention (and sklearn's) is 1.0,
    # perfect agreement
    tot = _c2("n_emails")
    expected = F.when(tot > 0, F.col("_sc") * F.col("_sk") / tot).otherwise(
        F.lit(0.0)
    )
    max_index = (F.col("_sc") + F.col("_sk")) / F.lit(2.0)
    out = stats.select(
        F.col("n_emails"),
        F.round(F.col("_idx"), 6).alias("index_pairs"),
        F.round(expected, 6).alias("expected_pairs"),
        F.round(max_index, 6).alias("max_pairs"),
        F.round(
            F.when(
                max_index - expected > 0,
                (F.col("_idx") - expected) / (max_index - expected),
            ).otherwise(F.lit(1.0)),
            6,
        ).alias("ari"),
    )
    if label is not None:
        out = out.select(F.lit(label).alias("system"), "*")
    return out


def muc(
    pred: DataFrame,
    truth: DataFrame,
    pred_col: str = "cluster_id",
    truth_col: str = "match_key",
    label: str | None = None,
) -> DataFrame:
    """G65: MUC link-based F1 (Vilain et al. 1995) — the fourth standard
    coreference/ER lens, counting the MINIMUM LINK EDITS between the two
    partitions: recall is the fraction of truth-cluster links preserved
    (a truth cluster T split across p(T) predicted clusters retains
    |T| − p(T) of its |T| − 1 spanning links), precision is the symmetric
    statement about predicted clusters. MUC is insensitive to singletons
    (they carry no links), which is exactly why it complements B³/ARI —
    a metric suite that disagrees is how degenerate clusterings get caught.

    With the same contingency cells as B³/ARI — n_ck = |cell|, per-truth-key
    size n_k and cell count p_k, per-predicted-cluster size n_c and cell
    count p_c:

        R = Σ_k (n_k − p_k) / Σ_k (n_k − 1)
        P = Σ_c (n_c − p_c) / Σ_c (n_c − 1)

    Scale shape identical to ``bcubed``: one email-keyed join, one cell
    aggregation, two cell-derived reductions, single-row output. Every sum
    is integer (exact); only the final three divisions are floats, rounded
    to 6 decimals (house parity convention). Public literature; the
    reference repo is a parser with no counterpart.
    """
    j = pred.select("email", pred_col).join(
        truth.select("email", truth_col), "email"
    )
    cells = j.groupBy(pred_col, truth_col).agg(F.count(F.lit(1)).alias("n_ck"))
    by_k = cells.groupBy(truth_col).agg(
        F.sum("n_ck").alias("n_k"), F.count(F.lit(1)).alias("p_k")
    )
    by_c = cells.groupBy(pred_col).agg(
        F.sum("n_ck").alias("n_c"), F.count(F.lit(1)).alias("p_c")
    )
    stats = (
        cells.agg(F.sum("n_ck").alias("n_emails"))
        .crossJoin(
            by_k.agg(
                F.sum(F.col("n_k") - F.col("p_k")).alias("_rn"),
                F.sum(F.col("n_k") - F.lit(1)).alias("_rd"),
            )
        )
        .crossJoin(
            by_c.agg(
                F.sum(F.col("n_c") - F.col("p_c")).alias("_pn"),
                F.sum(F.col("n_c") - F.lit(1)).alias("_pd"),
            )
        )
    )
    # degenerate guards (mirrored in the er_muc oracle SQL): an
    # all-singletons side has zero links, so its denominator is 0 —
    # convention 0.0, not NULL; and f1 guards p+r like every other F1 in
    # the codebase
    p = F.when(
        F.col("_pd") > 0, F.col("_pn").cast("double") / F.col("_pd")
    ).otherwise(F.lit(0.0))
    r = F.when(
        F.col("_rd") > 0, F.col("_rn").cast("double") / F.col("_rd")
    ).otherwise(F.lit(0.0))
    out = stats.select(
        F.col("n_emails"),
        F.round(p, 6).alias("muc_precision"),
        F.round(r, 6).alias("muc_recall"),
        F.round(
            F.when(p + r > 0, F.lit(2.0) * p * r / (p + r)).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("muc_f1"),
    )
    if label is not None:
        out = out.select(F.lit(label).alias("system"), "*")
    return out
