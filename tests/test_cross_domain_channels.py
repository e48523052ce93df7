"""Invariants of the round-4 CROSS-DOMAIN candidate channels
(operators/blocking.py channels 3 and 4): the four channels must stratify the
pair space (same/different canonical domain × same/different dotless local or
block), a domain-typo variant of one identity must become a candidate AND a
match edge, globally-common locals must be capped out of channel 3, and the
channel-4 full-email LSH replay must agree between Spark and the DuckDB CTE
(`oracles.email_lsh_pairs_cte`) — the contract the sf0.01 driver gate runs at
corpus scale."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from email_address_parser_spark.operators.blocking import (
    candidate_pairs,
)
from email_address_parser_spark.operators.scoring import match_edges, score_pairs

HOT, TGT = 1 << 40, 5_000  # salting off: isolate the cross-domain behavior


def _mentions(spark, rows):
    return spark.createDataFrame(
        rows, schema="email string, local_canon string, domain_canon string"
    ).withColumn("valid_lax", F.lit(True))


def _pairset(df):
    return {(r.email_a, r.email_b) for r in df.select("email_a", "email_b").collect()}


@pytest.fixture(scope="module")
def typo_mentions(spark):
    # one identity with local-dot AND domain-typo variants (cross-domain true
    # matches), one unrelated same-domain neighbour, one unrelated identity on
    # the typo'd domain (the hard negative channel 3 must NOT link: different
    # dotless local)
    rows = [
        ("jo.hn@gmail.com", "jo.hn", "gmail.com"),
        ("john@gmail.com", "john", "gmail.com"),
        ("jo.hn@gmial.com", "jo.hn", "gmial.com"),   # domain-typo variant
        ("johnx@gmail.com", "johnx", "gmail.com"),   # same-domain neighbour
        ("mary@gmial.com", "mary", "gmial.com"),     # unrelated on typo domain
    ]
    return _mentions(spark, rows)


def test_domain_typo_pair_is_candidate_and_match_edge(spark, typo_mentions):
    """The round-3 verdict's lead gap: jo.hn@gmial.com ↔ john@gmail.com must
    be reachable. Channel 3 (cross-domain exact dotless local) generates it,
    and the scorer's dom_edit feature — constant-zero before this channel
    existed — now discriminates: the true pair clears the 0.90 threshold."""
    cand = candidate_pairs(typo_mentions, HOT, TGT, materialize=False)
    got = _pairset(cand)
    assert ("jo.hn@gmial.com", "john@gmail.com") in got
    assert ("jo.hn@gmail.com", "jo.hn@gmial.com") in got
    edges = {
        (r.src, r.dst)
        for r in match_edges(score_pairs(cand)).collect()
    }
    assert ("jo.hn@gmial.com", "john@gmail.com") in edges
    # the unrelated identity on the typo'd domain never becomes an edge
    assert not any("mary" in a or "mary" in b for a, b in edges)


def test_without_cross_domain_the_typo_is_unreachable(spark, typo_mentions):
    """Regression pin for the old behaviour: with channels 3/4 off, every
    candidate shares domain_canon and dom_edit is structurally zero."""
    cand = candidate_pairs(
        typo_mentions, HOT, TGT, materialize=False, use_cross_domain=False
    )
    feats = score_pairs(cand).select("dom_edit").distinct().collect()
    assert {r.dom_edit for r in feats} <= {0}
    assert ("jo.hn@gmial.com", "john@gmail.com") not in _pairset(cand)


def test_channels_stratify_the_pair_space(spark, typo_mentions):
    """Pairwise disjointness: the union carries no duplicate pairs without
    any full-pair-set dedup, and every pair sits in exactly the stratum its
    channel predicate defines (1/2: same domain; 3: cross-domain same dotless
    local; 4: cross-domain different dotless local)."""
    cand = candidate_pairs(typo_mentions, HOT, TGT, materialize=False)
    rows = cand.collect()
    assert len(rows) == len({(r.email_a, r.email_b) for r in rows})
    same_dom = candidate_pairs(
        typo_mentions, HOT, TGT, materialize=False, use_cross_domain=False
    )
    xd_exact = candidate_pairs(
        typo_mentions, HOT, TGT, materialize=False, use_email_lsh=False
    )
    for r in rows:
        if r.domain_canon_a == r.domain_canon_b:
            assert (r.email_a, r.email_b) in _pairset(same_dom)
        else:
            dotless_eq = r.local_canon_a.replace(".", "") == r.local_canon_b.replace(".", "")
            in_ch3 = (r.email_a, r.email_b) in (_pairset(xd_exact) - _pairset(same_dom))
            assert in_ch3 == dotless_eq


def test_common_local_is_capped_out_of_channel_3(spark):
    """info@<60 domains> is non-discriminative: above local_max_block the
    exact-local channel contributes nothing (otherwise it would mint a
    quadratic pair set linking 60 distinct organisations)."""
    rows = [(f"info@org{i:03d}.example", "info", f"org{i:03d}.example") for i in range(60)]
    m = _mentions(spark, rows)
    capped = candidate_pairs(
        m, HOT, TGT, materialize=False, use_email_lsh=False, local_max_block=50
    )
    assert capped.count() == 0
    uncapped = candidate_pairs(
        m, HOT, TGT, materialize=False, use_email_lsh=False, local_max_block=100
    )
    assert uncapped.count() == 60 * 59 // 2


def test_email_lsh_reaches_simultaneous_local_and_domain_typo(spark):
    """Channel 4's residual role: BOTH the dotless local and the domain
    differ, so channels 1–3 are all structurally blind; the full-email
    minhash must still surface the near-identical address."""
    rows = [
        ("alexander.hamilton@federalist.example.com", "alexander.hamilton", "federalist.example.com"),
        ("alexander.hamiltom@federalist.exemple.com", "alexander.hamiltom", "federalist.exemple.com"),
    ]
    m = _mentions(spark, rows)
    without = candidate_pairs(m, HOT, TGT, materialize=False, use_email_lsh=False)
    assert without.count() == 0
    with_lsh = candidate_pairs(m, HOT, TGT, materialize=False)
    assert _pairset(with_lsh) == {
        ("alexander.hamiltom@federalist.exemple.com",
         "alexander.hamilton@federalist.example.com")
    }


def test_email_lsh_spark_matches_duckdb_replay(spark):
    """Seed contract for channel 4: the DuckDB CTE the sf0.01 oracle embeds
    (fixed-seed 3-gram minhash → affine perms → banded fold → bucket cap →
    cross-domain cross-local join) reproduces the Spark channel pair-for-pair
    on a corpus dense enough to exercise collisions and the cap."""
    from email_address_parser_spark import oracles

    base = "customer.service.team"
    rows = []
    for i in range(12):
        local = base[:i] + base[i + 1:]  # one deletion each — high Jaccard
        rows.append((f"{local}@dom{i:02d}.example", local, f"dom{i:02d}.example"))
    m = _mentions(spark, rows)
    ch4 = candidate_pairs(m, HOT, TGT, materialize=False).exceptAll(
        candidate_pairs(m, HOT, TGT, materialize=False, use_email_lsh=False)
    )
    got = _pairset(ch4)

    uniq = pd.DataFrame(
        [
            {
                "email": e,
                "domain_canon": d,
                "dotless": l.replace(".", ""),
                "canon_email": f"{l}@{d}",
            }
            for e, l, d in rows
        ]
    )
    con = duckdb.connect()
    con.register("uniq_src", uniq)
    sql = (
        "WITH uniq AS (SELECT * FROM uniq_src),\n"
        + oracles.email_lsh_pairs_cte(max_bucket=50)
        + "\nSELECT email_a, email_b FROM xd_lsh"
    )
    want = {(a, b) for a, b in con.execute(sql).fetchall()}
    assert got == want
    assert got  # non-vacuous: collisions actually happened
