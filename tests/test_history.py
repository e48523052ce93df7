"""G43: SCD2 cluster-membership history — fold == from-scratch, delta ==
full view, replay no-op."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from email_address_parser_spark.operators.history import (
    HISTORY_COLUMNS,
    fold_history,
    snapshot_history,
)


@pytest.fixture(scope="module")
def epochs(spark):
    """Three hand-built epoch assignments exercising every transition:
    unchanged, relabeled (new min email), merged clusters, brand-new email."""
    def df(rows):
        return spark.createDataFrame(rows, ["email", "cluster_id"])

    e0 = df([("a@x.com", "a@x.com"), ("b@x.com", "b@x.com"), ("c@y.com", "c@y.com")])
    # epoch 1: b merges into a's cluster; c unchanged; new d opens
    e1 = df(
        [
            ("a@x.com", "a@x.com"),
            ("b@x.com", "a@x.com"),
            ("c@y.com", "c@y.com"),
            ("d@z.com", "d@z.com"),
        ]
    )
    # epoch 2: a's cluster relabeled by a smaller new member
    e2 = df(
        [
            ("a@x.com", "A@x.com"),
            ("A@x.com", "A@x.com"),
            ("b@x.com", "A@x.com"),
            ("c@y.com", "c@y.com"),
            ("d@z.com", "d@z.com"),
        ]
    )
    return e0, e1, e2


def _rows(df):
    return {tuple(r) for r in df.select(*HISTORY_COLUMNS).collect()}


def test_fold_transitions(spark, epochs):
    e0, e1, e2 = epochs
    h0 = snapshot_history(e0, 0)
    h1 = fold_history(h0, e1, 1)["history"]
    got = _rows(h1)
    assert ("b@x.com", "b@x.com", 0, 1, False) in got  # closed on merge
    assert ("b@x.com", "a@x.com", 1, None, True) in got  # reopened in new cluster
    assert ("a@x.com", "a@x.com", 0, None, True) in got  # unchanged keeps valid_from
    assert ("c@y.com", "c@y.com", 0, None, True) in got
    assert ("d@z.com", "d@z.com", 1, None, True) in got  # new email opens
    assert len(got) == 5

    h2 = fold_history(h1, e2, 2)["history"]
    got2 = _rows(h2)
    # relabel closes every member of the old cluster and reopens them
    assert ("a@x.com", "a@x.com", 0, 2, False) in got2
    assert ("a@x.com", "A@x.com", 2, None, True) in got2
    assert ("b@x.com", "a@x.com", 1, 2, False) in got2
    assert ("b@x.com", "A@x.com", 2, None, True) in got2
    # full lineage for b: two closed rows + one open
    b_rows = {r for r in got2 if r[0] == "b@x.com"}
    assert len(b_rows) == 3
    # exactly one open row per email
    opens = [r for r in got2 if r[4]]
    assert len(opens) == len({r[0] for r in opens}) == 5


def test_delta_equals_full(spark, epochs):
    """Folding only the CHANGED assignments (the fold delta) produces the
    identical history as folding the full current view — the property that
    makes the fold batch-sized at scale."""
    e0, e1, _ = epochs
    h0 = snapshot_history(e0, 0)
    full = fold_history(h0, e1, 1)["history"]
    delta = e1.join(e0, ["email", "cluster_id"], "left_anti")  # changed/new only
    via_delta = fold_history(h0, delta, 1)["history"]
    assert _rows(full) == _rows(via_delta)


def test_refold_is_noop(spark, epochs):
    e0, e1, _ = epochs
    h1 = fold_history(snapshot_history(e0, 0), e1, 1)
    again = fold_history(h1["history"], e1, 2)
    assert again["updates"].count() == 0
    assert _rows(again["history"]) == _rows(h1["history"])


def test_updates_are_batch_sized(spark, epochs):
    e0, e1, _ = epochs
    out = fold_history(snapshot_history(e0, 0), e1, 1)
    # only b (close+open) and d (open) are touched
    assert out["updates"].count() == 3
