"""F9/F10 — batched pairwise scoring and the match decision.

Features per candidate pair (north_star feature list):
  * jw_local      — Jaro-Winkler similarity of canonical local parts
                    (pandas UDF; rapidfuzz's C kernel when available, exact
                    pure-Python fallback otherwise — semantics match DuckDB's
                    jaro_winkler_similarity: prefix scale 0.1, max prefix 4,
                    boost threshold 0.7, so the oracle can replay it)
  * lev_local     — builtin levenshtein(local_canon_a, local_canon_b)
                    (JVM, whole-stage codegen)
  * dom_edit      — builtin levenshtein(domain_canon_a, domain_canon_b)
  * dotless_eq    — exact equality of dot-stripped locals (the reference's
                    Eq is exact pair equality, email_address.rs:78; dot
                    variants are therefore distinct strings by construction
                    and this feature is what re-unites them)

score = 0.35*jw + 0.20*(1 - lev_norm) + 0.25*dom_sim + 0.20*dotless_eq
edges = pairs where score >= threshold (default 0.90).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

DEFAULT_THRESHOLD = 0.90

try:  # vectorized C implementation if present
    from rapidfuzz.distance.JaroWinkler import similarity as _jw_fast  # type: ignore
except Exception:  # pragma: no cover - sandbox has no rapidfuzz
    _jw_fast = None


def jaro_similarity(s1, s2) -> float:
    # operate on UTF-8 bytes, not code points: this matches DuckDB's
    # jaro_winkler_similarity exactly, which keeps the feature replayable in
    # the DuckDB oracle (and the levenshtein feature is Spark-builtin anyway)
    if isinstance(s1, str):
        s1 = s1.encode("utf-8")
    if isinstance(s2, str):
        s2 = s2.encode("utf-8")
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0  # DuckDB convention: jaro('', '') == 0.0
    if s1 == s2:
        return 1.0
    window = max(len1, len2) // 2 - 1
    if window < 0:
        window = 0
    flags1 = [False] * len1
    flags2 = [False] * len2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - window)
        hi = min(len2, i + window + 1)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c:
                flags1[i] = flags2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    j = 0
    for i in range(len1):
        if flags1[i]:
            while not flags2[j]:
                j += 1
            if s1[i] != s2[j]:
                transpositions += 1
            j += 1
    t = transpositions // 2
    return (matches / len1 + matches / len2 + (matches - t) / matches) / 3.0


def jaro_winkler_similarity(s1, s2, prefix_scale: float = 0.1, boost_threshold: float = 0.7) -> float:
    if isinstance(s1, str):
        s1 = s1.encode("utf-8")
    if isinstance(s2, str):
        s2 = s2.encode("utf-8")
    jaro = jaro_similarity(s1, s2)
    if jaro <= boost_threshold:
        return jaro
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a == b:
            prefix += 1
        else:
            break
    return jaro + prefix * prefix_scale * (1.0 - jaro)


@pandas_udf(DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    a = a.fillna("")
    b = b.fillna("")
    if _jw_fast is not None:
        return pd.Series(
            [_jw_fast(x, y) for x, y in zip(a, b)], dtype="float64"
        )
    # vectorized short-circuit: equal non-empty strings score 1.0 without the
    # O(n*m) loop — canonical locals coincide for most true-match pairs
    # (quoted/CFWS variants canonicalize to the same local)
    out = pd.Series(1.0, index=a.index, dtype="float64")
    eq = (a == b) & (a.str.len() > 0)
    hard = ~eq
    if hard.any():
        out[hard] = [
            jaro_winkler_similarity(x, y) for x, y in zip(a[hard], b[hard])
        ]
    return out


def score_pairs(pairs: DataFrame) -> DataFrame:
    """Add feature + score columns to candidate pairs."""
    dotless_a = F.regexp_replace(F.col("local_canon_a"), r"\.", "")
    dotless_b = F.regexp_replace(F.col("local_canon_b"), r"\.", "")
    max_local_len = F.greatest(
        F.length("local_canon_a"), F.length("local_canon_b"), F.lit(1)
    )
    max_dom_len = F.greatest(
        F.length("domain_canon_a"), F.length("domain_canon_b"), F.lit(1)
    )
    return (
        pairs.withColumn(
            "jw_local", jaro_winkler_udf(F.col("local_canon_a"), F.col("local_canon_b"))
        )
        .withColumn(
            "lev_local", F.levenshtein(F.col("local_canon_a"), F.col("local_canon_b"))
        )
        .withColumn(
            "dom_edit", F.levenshtein(F.col("domain_canon_a"), F.col("domain_canon_b"))
        )
        .withColumn("dotless_eq", (dotless_a == dotless_b).cast("double"))
        .withColumn(
            "score",
            F.round(
                F.lit(0.35) * F.col("jw_local")
                + F.lit(0.20) * (F.lit(1.0) - F.col("lev_local") / max_local_len)
                + F.lit(0.25) * (F.lit(1.0) - F.col("dom_edit") / max_dom_len)
                + F.lit(0.20) * F.col("dotless_eq"),
                6,
            ),
        )
    )


def match_edges(scored: DataFrame, threshold: float = DEFAULT_THRESHOLD) -> DataFrame:
    """F10: threshold filter → edges(src, dst, score). Deduplicates AFTER
    the threshold: when candidate generation skipped its pair-level
    dropDuplicates (blocking.candidate_pairs(dedupe=False)), the duplicate
    candidates score identically and this far smaller shuffle removes them."""
    return (
        scored.where(F.col("score") >= F.lit(threshold))
        .select(
            F.col("email_a").alias("src"), F.col("email_b").alias("dst"), "score"
        )
        .dropDuplicates(["src", "dst"])
    )
