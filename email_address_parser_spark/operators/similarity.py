"""Similarity search over an embedding column (`embeddings.embedding`,
array<float>).

Three operators:

  * brute_force_topk — exact cosine top-k of a (small, broadcast) query set
    against the full corpus. The corpus side streams once; the query side is
    a broadcast dim, so the plan is scan → broadcast-nested-loop →
    per-query window top-k. At 100 TB this is the "exact re-rank" stage.
  * near_dup_pairs   — all-pairs cosine ≥ τ within blocks. Exact (for the
    oracle) when block = single bucket; the scale path blocks by LSH bucket.
  * lsh_topk         — random-hyperplane LSH (signed projections, fixed
    seed), bucket-probe candidate generation, exact cosine re-rank. This is
    the IVF/LSH scale path: candidates per query bounded by bucket size.

Cosine is computed in double precision via Catalyst higher-order functions
(zip_with + aggregate) — JVM-side, no Python in the distance hot path. The
hyperplane signature is the only Pandas UDF (Arrow-batched numpy matmul).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType
from pyspark.sql.window import Window

# -- fixed-seed hyperplanes (determinism requirement; no wall-clock/random) ----

LSH_DIM = 64
LSH_BITS = 16
_planes_rng = np.random.RandomState(0x51A4E)
_PLANES = _planes_rng.standard_normal((LSH_DIM, LSH_BITS))


def _dot(a: F.Column, b: F.Column) -> F.Column:
    """Σ a[i]·b[i] in double precision (left-to-right, dialect-stable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = F.col(vec_col)
    return df.withColumn("_norm", F.sqrt(_dot(v, v)))


def cosine(a_vec: F.Column, b_vec: F.Column, a_norm: F.Column, b_norm: F.Column) -> F.Column:
    return _dot(a_vec, b_vec) / F.greatest(a_norm * b_norm, F.lit(1e-12))


def brute_force_topk(
    embeddings: DataFrame,
    query_ids: list,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query id.
    → (query_id, neighbor_id, cosine, rank). The query side is broadcast
    (|queries| ≪ corpus); ranking is on the 6-decimal-rounded cosine with
    neighbor_id as the deterministic tie-break."""
    base = with_norm(embeddings.select(id_col, vec_col), vec_col)
    queries = base.where(F.col(id_col).isin([int(q) for q in query_ids])).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        F.col("_norm").alias("_qnorm"),
    )
    cos = F.round(
        cosine(F.col("_qvec"), F.col(vec_col), F.col("_qnorm"), F.col("_norm")), 6
    )
    scored = (
        base.crossJoin(F.broadcast(queries))
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            cos.alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = None,
) -> DataFrame:
    """All (ordered) pairs with cosine ≥ threshold. With block_col=None the
    join is a full self-join — exact, O(n²), used for oracle-checked
    correctness at test scale and for re-ranking within LSH buckets at real
    scale (pass block_col='bucket' from lsh signatures)."""
    base = with_norm(embeddings.select([id_col, vec_col] + ([block_col] if block_col else [])), vec_col)
    a, b = base.alias("a"), base.alias("b")
    on = (
        [F.col(f"a.{block_col}") == F.col(f"b.{block_col}")] if block_col else []
    )
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    for c in on:
        cond = cond & c
    cos = F.round(
        cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"), F.col("a._norm"), F.col("b._norm")),
        6,
    )
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cos.alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def _centroid_literals(embeddings: DataFrame, n_centroids: int, id_col: str, vec_col: str):
    """The coarse quantizer as a LITERAL array column of (cid, cvec, cnorm)
    structs. The n_centroids rows are collected driver-side — this is loading
    a (tiny, fixed-size) model, not collecting data: on a real deployment the
    centroids come from an offline k-means and are shipped exactly like this.
    Norms are computed with the same left-to-right float64 fold as _dot so
    cell assignment is bit-identical however the cosine is evaluated."""
    rows = (
        embeddings.select(id_col, vec_col).orderBy(id_col).limit(n_centroids).collect()
    )
    structs = []
    for r in rows:
        vec = [float(x) for x in r[vec_col]]
        acc = 0.0
        for x in vec:
            acc += x * x
        # one F.lit per vector (array literal), not per element: an
        # element-wise F.lit loop is n_centroids x dim py4j round-trips
        # (~7 s of pure driver overhead at 16 x 64 — measured), the array
        # literal is 3 calls per centroid with the identical plan
        structs.append(
            F.struct(
                F.lit(int(r[id_col])).cast("long").alias("cid"),
                F.lit(vec).cast("array<double>").alias("cvec"),
                F.lit(acc ** 0.5).cast("double").alias("cnorm"),
            )
        )
    return F.array(*structs)


def _cell_scores(carr: F.Column, vec: F.Column, norm: F.Column) -> F.Column:
    """Per-row array of (rounded cosine, centroid id) against the literal
    quantizer — a pure HOF expression, zero shuffle."""
    return F.transform(
        carr,
        lambda ct: F.struct(
            F.round(cosine(vec, ct["cvec"], norm, ct["cnorm"]), 6).alias("c"),
            ct["cid"].alias("cid"),
        ),
    )


def _best_cell(carr: F.Column, vec: F.Column, norm: F.Column) -> F.Column:
    """Nearest-centroid id. Argmax via left fold: strict '>' keeps the FIRST
    maximum, and the literal array is ordered by centroid id — ties resolve
    to min cid, matching the oracle's (cosine DESC, cid ASC) row_number."""
    init = F.struct(
        F.lit(-2.0).cast("double").alias("c"), F.lit(-1).cast("long").alias("cid")
    )
    return F.aggregate(
        _cell_scores(carr, vec, norm),
        init,
        lambda acc, s: F.when(s["c"] > acc["c"], s).otherwise(acc),
    )["cid"]


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.3,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, arXiv
    2303.09540): cluster the corpus with a coarse quantizer, compare vectors
    only WITHIN a cluster, and drop every vector that has a lower-id
    in-cluster neighbor with cosine ≥ threshold (one-pass variant — the
    keeper of a duplicate group is its minimum id; no iterative MIS).

    → (vec_id, cell, keep, dup_of, dup_cos): dup_of is the LOWEST-id in-cell
    neighbor above threshold (null ⇔ keep), dup_cos the 6-decimal cosine to
    it.

    Scale shape: the quantizer is a literal HOF (no shuffle between scan and
    the cell equi-join, same as ivf_topk); the only shuffle is the self-join
    on `cell`, whose cost is Σ|cell|² — bounded by the quantizer's cell
    sizes exactly as in the SemDeDup paper (k chosen so |cell| ≈ corpus/k).
    At 100 TB swap the deterministic lowest-id centroid sample for offline
    k-means centroids; the plan is unchanged. The whole operator is exactly
    replayable in SQL (6-decimal rounded assignment + pair cosines)."""
    carr = _centroid_literals(embeddings, n_centroids, id_col, vec_col)
    base = with_norm(embeddings.select(id_col, vec_col), vec_col)
    assigned = base.withColumn(
        "cell", _best_cell(carr, F.col(vec_col), F.col("_norm"))
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    cos = F.round(
        cosine(
            F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"),
            F.col("a._norm"), F.col("b._norm"),
        ),
        6,
    )
    dup_pairs = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("_cand"),
            F.col(f"b.{id_col}").alias("_vid"),
            cos.alias("_cos"),
        )
        .where(F.col("_cos") >= F.lit(float(threshold)))
    )
    w = Window.partitionBy("_vid").orderBy(F.asc("_cand"))
    best = (
        dup_pairs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("_vid", F.col("_cand").alias("dup_of"), F.col("_cos").alias("dup_cos"))
    )
    return (
        assigned.select(id_col, "cell")
        .join(best, F.col(id_col) == F.col("_vid"), "left")
        .select(
            id_col,
            "cell",
            F.col("dup_of").isNull().alias("keep"),
            "dup_of",
            "dup_cos",
        )
    )


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-style ANN: corpus vectors are assigned to their nearest centroid
    (coarse quantizer, a literal expression — ZERO shuffle between the scan
    and the cell equi-join); each query probes its n_probe nearest cells and
    re-ranks candidates by exact cosine.

    Centroids are a deterministic sample (the n_centroids lowest ids) — on a
    real deployment swap in k-means centroids computed offline; the plan
    (literal quantizer → per-row HOF argmax → cell equi-join → window top-k)
    is identical either way. Scan cost per query drops from |corpus| to
    ~(n_probe/n_centroids)·|corpus|.

    Cell assignment compares cosines ROUNDED to 6 decimals (ties → lowest
    centroid id), making the assignment — and therefore the whole query —
    exactly replayable by the DuckDB oracle regardless of float summation
    order differences below 1e-6."""
    carr = _centroid_literals(embeddings, n_centroids, id_col, vec_col)
    base = with_norm(embeddings.select(id_col, vec_col), vec_col)

    def cell_scores(vec: F.Column, norm: F.Column) -> F.Column:
        return _cell_scores(carr, vec, norm)

    assigned = base.withColumn(
        "cell", _best_cell(carr, F.col(vec_col), F.col("_norm"))
    )

    # query side: tiny (|query_ids| rows) — explode the per-cell scores and
    # rank to pick the n_probe nearest cells, same rounded-cosine ordering
    queries = (
        base.where(F.col(id_col).isin([int(q) for q in query_ids]))
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("_qvec"),
            F.col("_norm").alias("_qnorm"),
            F.explode(cell_scores(F.col(vec_col), F.col("_norm"))).alias("_cs"),
        )
        .select(
            "query_id", "_qvec", "_qnorm",
            F.col("_cs.cid").alias("cell"), F.col("_cs.c").alias("_ccos"),
        )
        .withColumn(
            "_crank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("_ccos"), F.asc("cell"))
            ),
        )
        .where(F.col("_crank") <= n_probe)
        .select("query_id", "_qvec", "_qnorm", "cell")
    )
    cos = F.round(
        cosine(F.col("_qvec"), F.col(vec_col), F.col("_qnorm"), F.col("_norm")), 6
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        assigned.join(F.broadcast(queries), "cell")
        .where(F.col(id_col) != F.col("query_id"))
        .select("query_id", F.col(id_col).alias("neighbor_id"), cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


@pandas_udf(LongType())
def hyperplane_sig_udf(vecs: pd.Series) -> pd.Series:
    """16-bit random-hyperplane signature (sign pattern of fixed projections),
    Arrow-batched numpy matmul — one matmul per batch, no per-row Python."""
    if len(vecs) == 0:
        return pd.Series([], dtype="int64")
    mat = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
    signs = (mat @ _PLANES) > 0
    weights = (1 << np.arange(LSH_BITS, dtype=np.int64))
    return pd.Series(signs @ weights)


def with_lsh_bucket(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("bucket", hyperplane_sig_udf(F.col(vec_col)))


def lsh_topk(
    embeddings: DataFrame,
    query_ids: list,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_hamming: int = 2,
) -> DataFrame:
    """ANN top-k: candidates = corpus vectors whose hyperplane signature is
    within probe_hamming bits of the query's (multi-probe), re-ranked by
    exact cosine. The signature join is an equi-join on bucket after
    expanding each query to its probe set — bounded fan-out of
    C(16,≤2) = 137 probes per query, each an equi-match."""
    base = with_lsh_bucket(with_norm(embeddings.select(id_col, vec_col), vec_col), vec_col)
    queries = base.where(F.col(id_col).isin([int(q) for q in query_ids])).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        F.col("_norm").alias("_qnorm"),
        F.col("bucket").alias("_qbucket"),
    )
    # probe set: all signatures within hamming distance ≤ probe_hamming
    flips = [0] + [1 << i for i in range(LSH_BITS)]
    if probe_hamming >= 2:
        flips += [
            (1 << i) | (1 << j)
            for i in range(LSH_BITS)
            for j in range(i + 1, LSH_BITS)
        ]
    probes = F.array([F.lit(x).cast("long") for x in flips])
    expanded = (
        queries.select(
            "query_id", "_qvec", "_qnorm", "_qbucket",
            F.explode(probes).alias("_flip"),
        )
        .withColumn("bucket", F.col("_qbucket").bitwiseXOR(F.col("_flip")))
        .drop("_qbucket", "_flip")
    )
    cos = F.round(
        cosine(F.col("_qvec"), F.col(vec_col), F.col("_qnorm"), F.col("_norm")), 6
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        base.join(F.broadcast(expanded), "bucket")
        .where(F.col(id_col) != F.col("query_id"))
        .select("query_id", F.col(id_col).alias("neighbor_id"), cos.alias("cosine"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
