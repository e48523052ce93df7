"""G71 corpus-curation composition contract (operators/curation.py)."""

from __future__ import annotations

from email_address_parser_spark.operators.curation import curate_corpus

GOOD = (
    "the quick brown fox jumps over the lazy dog and that is fine to read "
    "in the morning with coffee and the news of the day for everyone there"
)


def test_canonical_reelected_within_survivors(spark):
    """A duplicate whose canonical twin is FILTERED OUT must survive as its
    own canonical — composing standalone stage outputs by intersection
    would wrongly drop it."""
    low_quality_twin = "zzz 123 !!! " * 40  # fails the quality/lang gates
    docs = spark.createDataFrame(
        [
            # d1 (filtered: junk) and d2 share NO text; d2/d3 are exact
            # duplicates of each other; d2 < d3 so d2 is canonical
            ("d1", "s", low_quality_twin),
            ("d2", "s", GOOD),
            ("d3", "s", GOOD),
        ],
        ["doc_id", "source", "text"],
    )
    out = {r["doc_id"] for r in curate_corpus(docs).collect()}
    assert out == {"d2"}

    # now make the canonical twin itself junk: d3 must be re-elected
    docs2 = spark.createDataFrame(
        [("d2", "s", low_quality_twin), ("d3", "s", GOOD)],
        ["doc_id", "source", "text"],
    )
    out2 = {r["doc_id"] for r in curate_corpus(docs2).collect()}
    assert out2 == {"d3"}


def test_manifest_carries_split_and_quality(spark):
    docs = spark.createDataFrame(
        [(f"d{i}", "s", GOOD + f" variant {i} " + "extra words here " * i)
         for i in range(6)],
        ["doc_id", "source", "text"],
    )
    rows = curate_corpus(docs, threshold=0.99).collect()
    assert rows and set(r["split"] for r in rows) <= {"train", "val", "test"}
    assert all(r["quality_score"] >= 0.70 for r in rows)
