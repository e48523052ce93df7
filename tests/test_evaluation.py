"""B-cubed evaluation operator (operators/evaluation.py).

Hand-checked case: pred {a,b},{c} vs truth {a},{b,c}.
Per-item precision: a=1/2, b=1/2, c=1  → B³P = 2/3.
Per-item recall:    a=1,   b=1/2, c=1/2 → B³R = 2/3.  F1 = 2/3.
"""

from __future__ import annotations

import pytest

from email_address_parser_spark.operators.evaluation import bcubed


def _frames(spark, pred_rows, truth_rows):
    pred = spark.createDataFrame(pred_rows, "email string, cluster_id string")
    truth = spark.createDataFrame(truth_rows, "email string, match_key string")
    return pred, truth


def test_bcubed_hand_case(spark):
    pred, truth = _frames(
        spark,
        [("a", "1"), ("b", "1"), ("c", "2")],
        [("a", "X"), ("b", "Y"), ("c", "Y")],
    )
    row = bcubed(pred, truth).collect()[0]
    assert row.n_emails == 3
    assert row.b3_precision == pytest.approx(2 / 3, abs=1e-6)
    assert row.b3_recall == pytest.approx(2 / 3, abs=1e-6)
    assert row.b3_f1 == pytest.approx(2 / 3, abs=1e-6)


def test_bcubed_perfect_and_degenerate(spark):
    # identical partitions -> all 1.0 regardless of label names
    pred, truth = _frames(
        spark,
        [("a", "p"), ("b", "p"), ("c", "q"), ("d", "r")],
        [("a", "K1"), ("b", "K1"), ("c", "K2"), ("d", "K3")],
    )
    row = bcubed(pred, truth).collect()[0]
    assert (row.b3_precision, row.b3_recall, row.b3_f1) == (1.0, 1.0, 1.0)

    # all-singletons prediction: precision 1, recall = avg 1/|T|
    pred2, truth2 = _frames(
        spark,
        [("a", "a"), ("b", "b"), ("c", "c")],
        [("a", "K"), ("b", "K"), ("c", "K")],
    )
    row2 = bcubed(pred2, truth2).collect()[0]
    assert row2.b3_precision == 1.0
    assert row2.b3_recall == pytest.approx(1 / 3, abs=1e-6)

    # one-big-cluster prediction: recall 1, precision = avg |T|/N
    row3 = bcubed(
        *_frames(
            spark,
            [("a", "p"), ("b", "p"), ("c", "p")],
            [("a", "K1"), ("b", "K1"), ("c", "K2")],
        )
    ).collect()[0]
    assert row3.b3_recall == 1.0
    assert row3.b3_precision == pytest.approx(5 / 9, abs=1e-6)


def test_bcubed_universe_is_join_and_label(spark):
    # emails missing from either side drop out of the universe; the label
    # column prefixes the row when requested
    pred, truth = _frames(
        spark,
        [("a", "1"), ("b", "1"), ("zzz_unlabeled", "9")],
        [("a", "X"), ("b", "X"), ("not_predicted", "X")],
    )
    row = bcubed(pred, truth, label="sys").collect()[0]
    assert row.system == "sys"
    assert row.n_emails == 2
    assert (row.b3_precision, row.b3_recall, row.b3_f1) == (1.0, 1.0, 1.0)
