"""G57 sorted-neighborhood blocking: distributed global rank exactness,
window pair semantics, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from email_address_parser_spark.operators.snm import snm_pairs, with_global_rank


def _uniq(spark, rows):
    return spark.createDataFrame(
        rows, "email string, local_canon string, domain_canon string"
    )


def test_global_rank_equals_single_node_row_number(spark):
    # 500 keys across many range partitions vs the textbook global window
    rows = [(f"e{i:04d}@d.com", f"l{(i * 37) % 500:04d}", "d.com") for i in range(500)]
    keyed = _uniq(spark, rows).select(
        "email",
        F.concat(
            F.regexp_replace("local_canon", r"\.", ""), F.lit("|"), F.col("domain_canon")
        ).alias("sort_key"),
    )
    dist = {
        r.email: r.rn
        for r in with_global_rank(keyed, ["sort_key", "email"], n_partitions=13).collect()
    }
    ref = {
        r.email: r.rn
        for r in keyed.withColumn(
            "rn", F.row_number().over(Window.orderBy("sort_key", "email"))
        ).collect()
    }
    assert dist == ref
    # ranks are a permutation of 1..n
    assert sorted(dist.values()) == list(range(1, 501))


def test_snm_window_semantics(spark):
    # locals sort as: alpha < beta < gamma < zeta; window=3 pairs each
    # entity with its next 2 neighbors only
    rows = [
        ("a@x.com", "alpha", "x.com"),
        ("b@y.com", "beta", "y.com"),
        ("g@z.com", "gamma", "z.com"),
        ("z@w.com", "zeta", "w.com"),
    ]
    got = {
        (r.email_a, r.email_b): r.dist
        for r in snm_pairs(_uniq(spark, rows), window=3).collect()
    }
    assert got == {
        ("a@x.com", "b@y.com"): 1,
        ("a@x.com", "g@z.com"): 2,
        ("b@y.com", "g@z.com"): 1,
        ("b@y.com", "z@w.com"): 2,
        ("g@z.com", "z@w.com"): 1,
    }


def test_snm_adjoins_cross_domain_typo(spark):
    # the domain-typo variant sorts next to its original because the sort
    # key leads with the dotless local — the recall case SNM exists for
    rows = [
        ("customer.001@building.example.com", "customer.001", "building.example.com"),
        ("customer.001@uilding.example.com", "customer.001", "uilding.example.com"),
        ("zuser@other.com", "zuser", "other.com"),
    ]
    got = {(r.email_a, r.email_b) for r in snm_pairs(_uniq(spark, rows), window=2).collect()}
    assert (
        "customer.001@building.example.com",
        "customer.001@uilding.example.com",
    ) in got


def test_snm_deterministic_under_repartition(spark):
    rows = [(f"u{i:03d}@d{i % 5}.com", f"u{i % 40:03d}", f"d{i % 5}.com") for i in range(200)]
    a = snm_pairs(_uniq(spark, rows), window=5)
    b = snm_pairs(_uniq(spark, rows).repartition(17, "email"), window=5)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # linear candidate volume: < window * n
    assert a.count() < 5 * 200
