"""G60 merge-provenance contract (operators/explain.py): the BFS spanning
tree per cluster is unique — min-parent tie-break, root = cluster id — and
partition-invariant; singletons emit root-only rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from email_address_parser_spark.operators.explain import cluster_merge_tree


def _df(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


@pytest.fixture(scope="module")
def forest(spark):
    # cluster "a": diamond a-b, a-c, b-d, c-d (tie at d) plus tail d-e
    # cluster "x": singleton (no edges)
    # cluster "p": chain p-q
    clusters = _df(
        spark,
        [(e, "a") for e in "abcde"] + [("x", "x"), ("p", "p"), ("q", "p")],
        ["email", "cluster_id"],
    )
    edges = _df(
        spark,
        [
            ("a", "b", 0.95),
            ("a", "c", 0.93),
            ("b", "d", 0.91),
            ("c", "d", 0.99),
            ("d", "e", 0.90),
            ("p", "q", 0.92),
        ],
        ["src", "dst", "score"],
    )
    return clusters, edges


def _rows(df):
    return {
        (r["cluster_id"], r["email"], r["depth"], r["parent"], r["parent_score"])
        for r in df.collect()
    }


def test_tree_semantics(spark, forest):
    clusters, edges = forest
    got = _rows(cluster_merge_tree(clusters, edges))
    assert got == {
        ("a", "a", 0, None, None),
        ("a", "b", 1, "a", 0.95),
        ("a", "c", 1, "a", 0.93),
        # tie at d between b and c (both depth 1): min parent wins, and the
        # reported score is THAT edge's (b-d 0.91), not the stronger c-d
        ("a", "d", 2, "b", 0.91),
        ("a", "e", 3, "d", 0.90),
        ("x", "x", 0, None, None),
        ("p", "p", 0, None, None),
        ("p", "q", 1, "p", 0.92),
    }


def test_partition_invariance(spark, forest):
    clusters, edges = forest
    base = _rows(cluster_merge_tree(clusters, edges))
    shuffled = _rows(
        cluster_merge_tree(
            clusters.repartition(7, "email"),
            edges.repartition(5, "dst").sortWithinPartitions("score"),
        )
    )
    assert base == shuffled
