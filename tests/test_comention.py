"""Co-mention affinity graph (operators/comention.py): pair counting,
turn-level duplicate collapsing, ordering, and the hot-conversation cap."""

from __future__ import annotations

from pyspark.sql import functions as F

from email_address_parser_spark.operators.comention import comention_edges


def _mentions(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, email string, valid_lax boolean"
    )


def test_comention_counts_and_cap(spark):
    rows = [
        # conv1: a, b co-mentioned (b twice in the conv -> still one edge)
        ("c1", "a@x.com", True),
        ("c1", "b@x.com", True),
        ("c1", "b@x.com", True),
        # conv2: a, b again + c; invalid mention must not appear
        ("c2", "a@x.com", True),
        ("c2", "b@x.com", True),
        ("c2", "c@x.com", True),
        ("c2", "bad@@x", False),
        # conv3: a alone -> no edges
        ("c3", "a@x.com", True),
    ]
    # hot conversation over the cap: contributes NOTHING
    rows += [("hot", f"u{i:02d}@x.com", True) for i in range(5)]

    got = {
        (r.email_a, r.email_b): r.n_convs
        for r in comention_edges(
            _mentions(spark, rows), max_emails_per_conv=4
        ).collect()
    }
    assert got == {
        ("a@x.com", "b@x.com"): 2,
        ("a@x.com", "c@x.com"): 1,
        ("b@x.com", "c@x.com"): 1,
    }
    # every edge is ordered and self-pairs are impossible
    assert all(a < b for (a, b) in got)


def test_comention_cap_inclusive(spark):
    rows = [("c1", f"e{i}@x.com", True) for i in range(4)]
    edges = comention_edges(_mentions(spark, rows), max_emails_per_conv=4)
    assert edges.count() == 6  # 4C2: cap is <=, conversation kept whole
    edges3 = comention_edges(_mentions(spark, rows), max_emails_per_conv=3)
    assert edges3.count() == 0  # over the cap: dropped whole
