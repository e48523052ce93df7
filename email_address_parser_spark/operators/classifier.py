"""Trained pairwise match scorer: logistic regression by distributed IRLS.

Closes the active-learning loop around the ER pipeline: `er_hard_negatives`
(G44) surfaces near-miss pairs for labeling, this module trains a logistic
model on labeled pair FEATURES (the same jw/lev/dom/dotless columns
`score_pairs` emits), and `logistic_score` applies the learned weights as a
pure Catalyst expression — so a learned scorer drops into `match_edges`
exactly where the hand-tuned linear score sits today.

Why not a per-row Python model: with d features, one IRLS iteration needs
only X^T W X (d(d+1)/2 sums) and X^T (y − p) (d sums) — a SINGLE map-side-
combinable aggregation over the pair table per iteration, the same
aggregate-then-solve shape Spark MLlib's own GLM uses. The d×d solve
happens on the driver (d ≈ 5; microseconds) and the new weights return to
the executors as plan literals. No UDF, no per-row Python, no MLlib
dependency; at 10^12 turns each iteration is one scan of the (already
blocked, already featurized) pair table with a 20-number result.

Determinism: given the same rows, iteration count, and ridge term, the only
order-sensitive operation is the double sum inside each aggregation
(~1e-15 relative); `tests/test_classifier.py` pins distributed IRLS ==
single-node numpy IRLS on the same data to 1e-8. Iterative training is not
SQL-expressible, so this operator is certified by that equivalence test
instead of a DuckDB oracle (the documented convention for iterative ops).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_PAIR_FEATURES = ["jw_local", "norm_lev", "norm_dom", "dotless_eq"]


def with_pair_features(scored: DataFrame) -> DataFrame:
    """Normalize the raw edit counts `score_pairs` emits into the [0, 1]
    feature frame the classifier consumes (same normalizations the
    hand-tuned score uses, exposed as named columns)."""
    dotless_a = F.regexp_replace(F.col("local_canon_a"), r"\.", "")
    dotless_b = F.regexp_replace(F.col("local_canon_b"), r"\.", "")
    max_local = F.greatest(F.length(dotless_a), F.length(dotless_b), F.lit(1))
    max_dom = F.greatest(
        F.length("domain_canon_a"), F.length("domain_canon_b"), F.lit(1)
    )
    return scored.withColumn(
        "norm_lev", F.lit(1.0) - F.col("lev_local") / max_local
    ).withColumn("norm_dom", F.lit(1.0) - F.col("dom_edit") / max_dom)


def _logit(features: list[str], beta: np.ndarray) -> Column:
    """β·x as a Catalyst expression; beta[-1] is the intercept."""
    z = F.lit(float(beta[-1]))
    for i, c in enumerate(features):
        z = z + F.lit(float(beta[i])) * F.col(c)
    return z


def logistic_train(
    df: DataFrame,
    features: list[str] = None,
    label_col: str = "label",
    iters: int = 8,
    ridge: float = 1e-6,
) -> np.ndarray:
    """IRLS / Newton: β ← β + (X^T W X + λI)^{-1} X^T (y − p) with
    W = diag(p(1−p)), intercept appended last. Returns the weight vector
    (len(features) + 1). One distributed aggregation per iteration over
    `df` (cache it upstream if it is not already a checkpointed stage)."""
    features = list(DEFAULT_PAIR_FEATURES if features is None else features)
    d = len(features) + 1
    beta = np.zeros(d)
    y = F.col(label_col).cast("double")
    xcols = [F.col(c).cast("double") for c in features] + [F.lit(1.0)]
    for _ in range(iters):
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_logit(features, beta)))
        w = p * (F.lit(1.0) - p)
        aggs = []
        for i in range(d):
            for j in range(i, d):
                aggs.append(F.sum(w * xcols[i] * xcols[j]).alias(f"h_{i}_{j}"))
        for i in range(d):
            aggs.append(F.sum((y - p) * xcols[i]).alias(f"g_{i}"))
        row = df.agg(*aggs).collect()[0]
        H = np.zeros((d, d))
        for i in range(d):
            for j in range(i, d):
                H[i, j] = H[j, i] = row[f"h_{i}_{j}"]
        g = np.array([row[f"g_{i}"] for i in range(d)])
        beta = beta + np.linalg.solve(H + ridge * np.eye(d), g)
    return beta


def logistic_score(
    df: DataFrame,
    beta: np.ndarray,
    features: list[str] = None,
    out_col: str = "prob",
) -> DataFrame:
    """Apply trained weights as a Catalyst expression (no UDF): adds the
    match-probability column; pair with a threshold to form edges exactly
    like the hand-tuned `match_edges`."""
    features = list(DEFAULT_PAIR_FEATURES if features is None else features)
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_logit(features, beta)))
    return df.withColumn(out_col, p)
