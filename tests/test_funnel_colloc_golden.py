"""G38 funnel / G39 collocations / G40 survivorship unit contracts."""

import datetime as dt
import math

from pyspark.sql import Row


def _ts(h, m=0, s=0, us=0):
    return dt.datetime(2024, 1, 1, h, m, s, us)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            Row(event_id=i, user_id=u, ts=t, event_type=ty)
            for i, (u, t, ty) in enumerate(rows)
        ]
    )


# ---------------------------------------------------------------------------
# funnel
# ---------------------------------------------------------------------------


def test_funnel_strict_ordering(spark):
    from email_address_parser_spark.operators.funnel import funnel

    rows = [
        # user 1 completes all 3 steps in order
        (1, _ts(0), "view"),
        (1, _ts(1), "click"),
        (1, _ts(2), "purchase"),
        # user 2: purchase BEFORE click -> funnel stops at click (2 steps)
        (2, _ts(0), "view"),
        (2, _ts(1), "purchase"),
        (2, _ts(2), "click"),
        # user 3: click but never viewed -> not in the funnel at all
        (3, _ts(0), "click"),
        # user 4: view only
        (4, _ts(5), "view"),
    ]
    out = {r.user_id: r for r in funnel(_events(spark, rows)).collect()}
    assert set(out) == {1, 2, 4}
    assert out[1].steps_completed == 3
    assert out[2].steps_completed == 2
    assert out[2].purchase_us is None
    assert out[4].steps_completed == 1
    assert out[4].click_us is None and out[4].purchase_us is None


def test_funnel_same_microsecond_does_not_chain(spark):
    from email_address_parser_spark.operators.funnel import funnel

    rows = [
        (1, _ts(0), "view"),
        (1, _ts(0), "click"),  # equal ts: strict > rejects the chain
        (1, _ts(0, 0, 0, 1), "click"),  # +1us: chains
    ]
    out = funnel(_events(spark, rows)).collect()[0]
    assert out.steps_completed == 2
    assert out.click_us == out.view_us + 1


def test_funnel_picks_earliest_qualifying_step(spark):
    from email_address_parser_spark.operators.funnel import funnel

    rows = [
        (1, _ts(2), "view"),
        (1, _ts(1), "click"),   # before the view: must NOT count
        (1, _ts(4), "click"),   # earliest click after the view
        (1, _ts(6), "click"),
        (1, _ts(5), "purchase"),  # after step-2 frontier (ts 4) -> counts
    ]
    out = funnel(_events(spark, rows)).collect()[0]
    assert out.click_us == int(_ts(4).timestamp() * 1_000_000)
    assert out.purchase_us == int(_ts(5).timestamp() * 1_000_000)
    assert out.steps_completed == 3


# ---------------------------------------------------------------------------
# collocations
# ---------------------------------------------------------------------------


def test_collocations_pmi_ranks_fixed_phrase_first(spark):
    from email_address_parser_spark.operators.ranking import collocations_topk

    # "san francisco" always co-occurs; filler words pair randomly
    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text="san francisco " + ("the of " * (i % 3 + 1)))
            for i in range(10)
        ]
    )
    out = collocations_topk(docs, k=5, min_count=5).collect()
    assert out[0].bigram == "san francisco"
    assert out[0].rank == 1
    assert out[0].c_xy == 10 and out[0].c_x == 10 and out[0].c_y == 10
    # hand-check PMI: N_uni = 10*2 + sum(2*(i%3+1)) = 60, N_bi per doc =
    # 2*(i%3+1)+1 tokens-1 ... easier invariant: the always-together pair has
    # the maximum possible PMI in this corpus, and PMI values are finite
    assert all(math.isfinite(r.pmi) for r in out)
    assert out[0].pmi == max(r.pmi for r in out)


def test_collocations_min_count_filters(spark):
    from email_address_parser_spark.operators.ranking import collocations_topk

    docs = spark.createDataFrame(
        [Row(doc_id=0, text="rare pair"), Row(doc_id=1, text="a b a b a b a b a b")]
    )
    out = collocations_topk(docs, k=10, min_count=5).collect()
    grams = {r.bigram for r in out}
    assert "rare pair" not in grams  # c_xy=1 < 5
    assert "a b" in grams  # 5 occurrences


# ---------------------------------------------------------------------------
# golden records
# ---------------------------------------------------------------------------


def test_golden_records_mode_survivorship(spark):
    from email_address_parser_spark.operators.survivorship import golden_records

    mentions = spark.createDataFrame(
        [
            # cluster A: 3 mentions of a@example.com + 1 typo'd member
            Row(email="a@example.com", conv_id="c1", domain_canon="example.com",
                valid_lax=True),
            Row(email="a@example.com", conv_id="c2", domain_canon="example.com",
                valid_lax=True),
            Row(email="a@xample.com", conv_id="c2", domain_canon="xample.com",
                valid_lax=True),
            Row(email="a@example.com", conv_id="c3", domain_canon="example.com",
                valid_lax=True),
            # invalid mention: excluded
            Row(email="a@example.com", conv_id="c9", domain_canon="example.com",
                valid_lax=False),
            # cluster B: tie on domain counts -> lexicographic min survives
            Row(email="b@aaa.com", conv_id="c4", domain_canon="aaa.com",
                valid_lax=True),
            Row(email="b@bbb.com", conv_id="c4", domain_canon="bbb.com",
                valid_lax=True),
        ]
    )
    clusters = spark.createDataFrame(
        [
            Row(email="a@example.com", cluster_id="a@example.com"),
            Row(email="a@xample.com", cluster_id="a@example.com"),
            Row(email="b@aaa.com", cluster_id="b@aaa.com"),
            Row(email="b@bbb.com", cluster_id="b@aaa.com"),
        ]
    )
    out = {r.cluster_id: r for r in golden_records(mentions, clusters).collect()}
    a = out["a@example.com"]
    assert (a.n_members, a.n_mentions, a.n_conversations) == (2, 4, 3)
    assert a.top_domain == "example.com" and a.top_domain_mentions == 3
    b = out["b@aaa.com"]
    assert b.top_domain == "aaa.com"  # tie at 1-1 -> lexicographic
    assert (b.n_members, b.n_mentions, b.n_conversations) == (2, 2, 1)


def test_golden_records_repair_domain_typos_end_to_end(spark):
    """The round-4 arc in one assertion: the cross-domain channels pull the
    variant-4 domain-typo mention into its true cluster, and mode
    survivorship then SURVIVES the correctly-spelled domain (the typo is
    out-voted), so the golden record repairs the typo."""
    from email_address_parser_spark.operators.blocking import candidate_pairs
    from email_address_parser_spark.operators.extract import (
        extract_mentions,
        with_canonical,
    )
    from email_address_parser_spark.operators.scoring import match_edges, score_pairs
    from email_address_parser_spark.operators.survivorship import golden_records
    from email_address_parser_spark.pipeline import cluster_mentions
    from email_address_parser_spark.sources.testdata import derive_transcripts

    m = with_canonical(extract_mentions(derive_transcripts(spark, "/root/testdata/sf0.001")))
    clusters = cluster_mentions(
        m, match_edges(score_pairs(candidate_pairs(m, hot_threshold=1 << 40)))
    )
    golden = golden_records(m, clusters)

    # a typo'd member makes its cluster MULTI-domain (variant 4 drops the
    # first char of the '<segment>.example.com' domain; the other 9 variants
    # canonicalize to the true spelling) — so (a) multi-domain clusters
    # existing at all proves the cross-domain channels' recall end-to-end,
    # and (b) in each one the survived top_domain must be the true spelling:
    # strictly more votes than the typo, exactly one edit apart
    from pyspark.sql import functions as F

    rows = (
        m.where(m.valid_lax)
        .join(clusters, "email")
        .groupBy("cluster_id", "domain_canon")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .join(golden.select("cluster_id", "top_domain"), "cluster_id")
        .collect()
    )
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)

    multi = {cid: ms for cid, ms in by_cluster.items() if len(ms) > 1}
    assert multi  # the typo variant exists and its cluster was recalled

    repaired = 0
    for members in multi.values():
        survived = members[0].top_domain
        # the operator's exact rule: max count, ties -> lexicographic min
        expect = min(members, key=lambda r: (-r.cnt, r.domain_canon))
        assert survived == expect.domain_canon
        # the two domains are the variant-4 pair: one edit (first char) apart
        doms = sorted({m2.domain_canon for m2 in members}, key=len)
        assert len(doms) == 2 and doms[1][1:] == doms[0]
        # wherever the true spelling strictly out-votes the typo, the golden
        # record REPAIRS it (the interesting direction; a 1-1 tie resolves
        # by the deterministic lexicographic rule instead)
        counts = {m2.domain_canon: m2.cnt for m2 in members}
        if counts[doms[1]] > counts[doms[0]]:
            assert survived == doms[1]
            repaired += 1
    assert repaired > 0  # strict-majority repairs actually occurred
