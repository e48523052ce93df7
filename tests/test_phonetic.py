"""G72 phonetic blocking (operators/phonetic.py): key semantics, the
Spark↔DuckDB key parity (both twins are generated from one _STEPS table —
this test proves the generation itself agrees on real corpus strings), and
the capped-pair contract."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from email_address_parser_spark.operators.phonetic import (
    phonetic_key,
    phonetic_key_sql,
    phonetic_pairs,
)


def _keys(spark, values):
    df = spark.createDataFrame([(v,) for v in values], ["s"])
    return {
        r["s"]: r["k"]
        for r in df.select("s", phonetic_key(F.col("s")).alias("k")).collect()
    }


def test_sound_alike_names_share_keys(spark):
    ks = _keys(
        spark,
        ["john", "jon", "j.o.h.n", "smith", "smyth", "robert", "rupert",
         "alice", "ellis", "12345", ""],
    )
    assert ks["john"] == ks["jon"] == ks["j.o.h.n"]      # h drop + dots strip
    assert ks["smith"] == ks["smyth"]                    # vowel-class identity
    assert ks["robert"] == ks["rupert"]                  # classic soundex pair
    assert ks["alice"] != ks["smith"]                    # and it discriminates
    assert ks["12345"] == "" and ks[""] == ""            # no letters -> ''
    # shape: initial + exactly 3 digits
    assert len(ks["john"]) == 4 and ks["john"][0] == "J"


def test_key_parity_spark_vs_duckdb_on_corpus_locals(spark):
    """The two generated twins must agree on every distinct local in the
    sf0.001 corpus (plus adversarial extras) — the contract the sf0.01
    driver-gate triple-match rides on."""
    from email_address_parser_spark.operators.blocking import uniq_valid_mentions
    from email_address_parser_spark.operators.extract import (
        extract_mentions,
        with_canonical,
    )
    from email_address_parser_spark.sources.testdata import derive_transcripts

    uniq = uniq_valid_mentions(
        with_canonical(
            extract_mentions(derive_transcripts(spark, "/root/testdata/sf0.001"))
        )
    )
    locals_ = [r["local_canon"] for r in uniq.select("local_canon").distinct().collect()]
    locals_ += ["j.o.h.n", "O'Brien", "müller", "x", "", "a1b2c3", "hhhwww"]
    got = _keys(spark, locals_)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in locals_])
    want = dict(
        con.execute(f"SELECT s, {phonetic_key_sql('s')} FROM t").fetchall()
    )
    assert got == want


def test_phonetic_pairs_capped_and_ordered(spark):
    uniq = spark.createDataFrame(
        [("a@x.com", "jon"), ("b@y.com", "john"), ("c@z.com", "smith"),
         ("d@w.com", "smyth"), ("e@v.com", "12345")],
        ["email", "local_canon"],
    )
    rows = phonetic_pairs(uniq).collect()
    pairs = {(r["email_a"], r["email_b"]) for r in rows}
    # sound-alike cross-domain pairs; the digit-only local drops out
    assert pairs == {("a@x.com", "b@y.com"), ("c@z.com", "d@w.com")}
    # cap: a 3-member block under cap survives, over cap dies
    many = spark.createDataFrame(
        [(f"u{i}@x.com", "jon") for i in range(60)], ["email", "local_canon"]
    )
    assert phonetic_pairs(many, max_block=50).count() == 0
    assert phonetic_pairs(many, max_block=64).count() == 60 * 59 // 2
