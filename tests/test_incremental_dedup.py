"""G26 incremental corpus dedup: fold == full keep-best re-dedup on the
union corpus (operators/incremental_dedup.py), chained folds stay
consistent, and re-applying a folded batch is a no-op."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from email_address_parser_spark.operators.dedup import dedup_keep_best

THRESHOLD = 0.2
MAX_BUCKET = 64


def _corpus(spark, n_groups=24, seed=3):
    """Planted near-dup groups: each group is one base sentence plus variants
    differing by a word or two (high bigram overlap), plus unique filler."""
    rng = random.Random(seed)
    words = (
        "data spark shuffle join cluster email parse corpus batch fold "
        "token quality sample bucket band gram doc near dup state"
    ).split()
    rows = []
    k = 0
    for g in range(n_groups):
        base = " ".join(rng.choice(words) for _ in range(12))
        n_variants = rng.randint(1, 4)
        for v in range(n_variants):
            text = base if v == 0 else base + " " + rng.choice(words)
            rows.append((f"d{k:04d}", text))
            k += 1
    for _ in range(30):  # unique singletons
        rows.append((f"d{k:04d}", " ".join(rng.sample(words, 9)) + f" unique{k}"))
        k += 1
    return spark.createDataFrame(rows, "doc_id string, text string")


def _as_set(df):
    return {
        (r["id"], r["cluster_id"], r["quality_score"], r["is_kept"])
        for r in df.select("id", "cluster_id", "quality_score", "is_kept").collect()
    }


def _full(docs):
    return dedup_keep_best(
        docs, threshold=THRESHOLD, use_lsh=True, max_bucket=MAX_BUCKET
    ).select(
        F.col("doc_id").alias("id"), "cluster_id", "quality_score", "is_kept"
    )


def test_fold_docs_equals_full_rededup(spark):
    from email_address_parser_spark.operators.incremental_dedup import (
        build_dedup_state,
        fold_docs,
    )

    docs = _corpus(spark)
    is_prev = F.pmod(F.xxhash64("doc_id"), F.lit(5)) < 4
    state = build_dedup_state(
        spark, docs.where(is_prev), threshold=THRESHOLD, max_bucket=MAX_BUCKET
    )
    out = fold_docs(
        spark, docs.where(~is_prev), state,
        threshold=THRESHOLD, max_bucket=MAX_BUCKET,
    )
    assert _as_set(out["clusters"]) == _as_set(_full(docs))
    # the delta is the touched surface only, and it is part of the view
    delta, view = _as_set(out["delta"]), _as_set(out["clusters"])
    assert delta <= view and len(delta) < len(view)


def test_fold_docs_chained(spark):
    from email_address_parser_spark.operators.incremental_dedup import (
        build_dedup_state,
        fold_docs,
    )

    docs = _corpus(spark, n_groups=18, seed=9)
    h = F.pmod(F.xxhash64("doc_id"), F.lit(3))

    def _ckpt(state):
        return {k: v.localCheckpoint() for k, v in state.items()}

    state = _ckpt(
        build_dedup_state(
            spark, docs.where(h == 0), threshold=THRESHOLD, max_bucket=MAX_BUCKET
        )
    )
    mid = fold_docs(
        spark, docs.where(h == 1), state,
        threshold=THRESHOLD, max_bucket=MAX_BUCKET,
    )
    out = fold_docs(
        spark, docs.where(h == 2), _ckpt(mid["state"]),
        threshold=THRESHOLD, max_bucket=MAX_BUCKET,
    )
    assert _as_set(out["clusters"]) == _as_set(_full(docs))


def test_fold_docs_refold_is_noop(spark):
    from email_address_parser_spark.operators.incremental_dedup import (
        build_dedup_state,
        fold_docs,
    )

    docs = _corpus(spark, n_groups=12, seed=5)
    is_prev = F.pmod(F.xxhash64("doc_id"), F.lit(5)) < 4
    state = build_dedup_state(
        spark, docs.where(is_prev), threshold=THRESHOLD, max_bucket=MAX_BUCKET
    )
    first = fold_docs(
        spark, docs.where(~is_prev), state,
        threshold=THRESHOLD, max_bucket=MAX_BUCKET,
    )
    folded = {k: v.localCheckpoint() for k, v in first["state"].items()}
    again = fold_docs(
        spark, docs.where(~is_prev), folded,
        threshold=THRESHOLD, max_bucket=MAX_BUCKET,
    )
    first_view = _as_set(first["clusters"])
    assert _as_set(again["clusters"]) == first_view
    assert _as_set(again["delta"]) <= first_view
