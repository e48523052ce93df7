"""G61 cannot-link repair contract (operators/repair.py): minimal-level
split semantics, whole-level tie handling, multi-constraint escalation,
cross-cluster no-ops, partition invariance."""

from __future__ import annotations

import pytest

from email_address_parser_spark.operators.repair import constrained_split


@pytest.fixture(scope="module")
def graph(spark):
    clusters = spark.createDataFrame(
        [(e, "a") for e in "abcd"] + [("x", "x"), ("y", "x")],
        ["email", "cluster_id"],
    )
    edges = spark.createDataFrame(
        [
            ("a", "b", 0.95),
            ("b", "c", 0.85),
            ("c", "d", 0.95),
            ("x", "y", 0.91),
        ],
        ["src", "dst", "score"],
    )
    return clusters, edges


def _rows(df):
    return {(r["email"], r["cluster_id"]) for r in df.collect()}


def _cons(spark, pairs):
    return spark.createDataFrame(pairs, ["email_x", "email_y"])


def test_minimal_level_cut(spark, graph):
    clusters, edges = graph
    got = _rows(constrained_split(clusters, edges, _cons(spark, [("a", "d")])))
    # cutting the weakest level (0.85) already separates a from d; the two
    # 0.95 edges survive, and the untouched x-cluster passes through
    assert got == {
        ("a", "a"), ("b", "a"), ("c", "c"), ("d", "c"),
        ("x", "x"), ("y", "x"),
    }


def test_multi_constraint_escalates_the_cut(spark, graph):
    clusters, edges = graph
    got = _rows(
        constrained_split(
            clusters, edges, _cons(spark, [("a", "d"), ("a", "b")])
        )
    )
    # (a,b) is a direct 0.95 edge, so the cut must rise to the top level:
    # the whole chain shatters to singletons
    assert got == {
        ("a", "a"), ("b", "b"), ("c", "c"), ("d", "d"),
        ("x", "x"), ("y", "x"),
    }


def test_tied_level_removed_whole(spark):
    clusters = spark.createDataFrame(
        [(e, "a") for e in "abc"], ["email", "cluster_id"]
    )
    edges = spark.createDataFrame(
        [("a", "b", 0.9), ("b", "c", 0.9)], ["src", "dst", "score"]
    )
    got = _rows(constrained_split(clusters, edges, _cons(spark, [("a", "c")])))
    # both 0.9 edges are one level: removing it shatters the chain even
    # though dropping just b-c would have sufficed edge-wise
    assert got == {("a", "a"), ("b", "b"), ("c", "c")}


def test_cross_cluster_constraint_is_noop(spark, graph):
    clusters, edges = graph
    got = _rows(constrained_split(clusters, edges, _cons(spark, [("a", "x")])))
    assert got == _rows(clusters)


def test_partition_invariance(spark, graph):
    clusters, edges = graph
    cons = _cons(spark, [("a", "d")])
    base = _rows(constrained_split(clusters, edges, cons))
    shuffled = _rows(
        constrained_split(
            clusters.repartition(5, "email"),
            edges.repartition(3, "dst"),
            cons.repartition(2),
        )
    )
    assert base == shuffled
