"""Contracts for the round-4 review/quality additions: G62 must-link merge
(operators/repair.py), G63 best-match 1-NN star clustering
(operators/bestmatch.py), G64 Adjusted Rand Index and G65 MUC F1
(operators/evaluation.py), G66 collective clustering
(operators/comention.py), G67/G68 privacy-preserving linkage + blocking
(operators/pprl.py)."""

from __future__ import annotations

import pytest

from email_address_parser_spark.operators.bestmatch import (
    best_match_clusters,
    best_match_edges,
)
from email_address_parser_spark.operators.evaluation import adjusted_rand
from email_address_parser_spark.operators.repair import must_link_merge


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


# ---------------------------------------------------------------------------
# G62 must-link merge
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ml_clusters(spark):
    return spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "c"), ("d", "d"), ("e", "d")],
        ["email", "cluster_id"],
    )


def test_must_link_merges_two_clusters(spark, ml_clusters):
    cons = spark.createDataFrame([("b", "c")], ["email_x", "email_y"])
    out = _rows(must_link_merge(ml_clusters, cons), "email", "cluster_id")
    # clusters a and c merge under label min('a','c') = 'a'; d untouched
    assert out == [
        ("a", "a"), ("b", "a"), ("c", "a"), ("d", "d"), ("e", "d"),
    ]


def test_must_link_same_cluster_is_noop(spark, ml_clusters):
    cons = spark.createDataFrame([("d", "e")], ["email_x", "email_y"])
    out = _rows(must_link_merge(ml_clusters, cons), "email", "cluster_id")
    assert out == _rows(ml_clusters, "email", "cluster_id")


def test_must_link_transitive_chain(spark, ml_clusters):
    # a~c and c~d chain all three clusters into min-label 'a'
    cons = spark.createDataFrame(
        [("a", "c"), ("c", "e")], ["email_x", "email_y"]
    )
    out = dict(_rows(must_link_merge(ml_clusters, cons), "email", "cluster_id"))
    assert set(out.values()) == {"a"}
    assert len(out) == 5


# ---------------------------------------------------------------------------
# G63 best-match clustering
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def bm_scored(spark):
    # b's best is a (0.9); c's best is b (0.8); d-e isolated strong pair;
    # f only has a sub-floor candidate
    return spark.createDataFrame(
        [
            ("a", "b", 0.9),
            ("b", "c", 0.8),
            ("d", "e", 0.95),
            ("e", "f", 0.5),
        ],
        ["email_a", "email_b", "score"],
    )


def test_best_match_edges_argmax_and_floor(spark, bm_scored):
    kept = _rows(best_match_edges(bm_scored, floor=0.7), "src", "dst")
    # every node above floor keeps exactly one edge; f has none
    assert kept == [
        ("a", "b"), ("b", "a"), ("c", "b"), ("d", "e"), ("e", "d"),
    ]


def test_best_match_tie_breaks_to_smallest_neighbor(spark):
    scored = spark.createDataFrame(
        [("m", "x", 0.8), ("m", "w", 0.8)], ["email_a", "email_b", "score"]
    )
    kept = dict(_rows(best_match_edges(scored, floor=0.7), "src", "dst"))
    assert kept["m"] == "w"


def test_best_match_clusters_labels_and_singletons(spark, bm_scored):
    mentions = spark.createDataFrame(
        [(e, True) for e in "abcdef"] + [("bad", False)],
        ["email", "valid_lax"],
    )
    out = dict(
        _rows(best_match_clusters(mentions, bm_scored, floor=0.7),
              "email", "cluster_id")
    )
    # chain a-b-c merges (c's best is b even though b prefers a);
    # d-e separate; f candidate-less singleton; invalid excluded
    assert out == {
        "a": "a", "b": "a", "c": "a", "d": "d", "e": "d", "f": "f",
    }


def test_best_match_no_weak_chaining(spark):
    # transitive closure would merge all four through the weak 0.71 link;
    # best-match keeps it ONLY if it is someone's best — here it is (q's),
    # so construct the case where it is NOT: q's best is p, r's best is s
    scored = spark.createDataFrame(
        [
            ("p", "q", 0.99),
            ("q", "r", 0.71),
            ("r", "s", 0.99),
        ],
        ["email_a", "email_b", "score"],
    )
    mentions = spark.createDataFrame(
        [(e, True) for e in "pqrs"], ["email", "valid_lax"]
    )
    out = dict(
        _rows(best_match_clusters(mentions, scored, floor=0.7),
              "email", "cluster_id")
    )
    # q-r edge is neither endpoint's best → two clusters, not one
    assert out == {"p": "p", "q": "p", "r": "r", "s": "r"}


# ---------------------------------------------------------------------------
# G64 adjusted Rand index
# ---------------------------------------------------------------------------


def test_ari_perfect_and_known_value(spark):
    truth = spark.createDataFrame(
        [("a", "k1"), ("b", "k1"), ("c", "k2"), ("d", "k2")],
        ["email", "match_key"],
    )
    perfect = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "c"), ("d", "c")],
        ["email", "cluster_id"],
    )
    row = adjusted_rand(perfect, truth).collect()[0]
    assert row["ari"] == 1.0 and row["n_emails"] == 4

    # split {a,b} apart: cells (1,1,2); idx=1, sc=1, sk=2, tot=6
    # expected=1*2/6=1/3; max=(1+2)/2=1.5; ari=(1-1/3)/(1.5-1/3)=4/7
    partial = spark.createDataFrame(
        [("a", "a"), ("b", "b"), ("c", "c"), ("d", "c")],
        ["email", "cluster_id"],
    )
    row = adjusted_rand(partial, truth).collect()[0]
    assert row["index_pairs"] == 1.0
    assert row["max_pairs"] == 1.5
    assert abs(row["ari"] - 4.0 / 7.0) < 1e-6


def test_ari_all_singletons_is_zero(spark):
    truth = spark.createDataFrame(
        [("a", "k1"), ("b", "k1"), ("c", "k2"), ("d", "k2")],
        ["email", "match_key"],
    )
    singles = spark.createDataFrame(
        [(e, e) for e in "abcd"], ["email", "cluster_id"]
    )
    row = adjusted_rand(singles, truth).collect()[0]
    # index = 0 and expected = 0 (no predicted pairs) → ARI 0
    assert row["ari"] == 0.0


# ---------------------------------------------------------------------------
# G65 MUC link-based F1
# ---------------------------------------------------------------------------


def test_muc_perfect_and_split(spark):
    from email_address_parser_spark.operators.evaluation import muc

    truth = spark.createDataFrame(
        [("a", "k1"), ("b", "k1"), ("c", "k1"), ("d", "k2"), ("e", "k2")],
        ["email", "match_key"],
    )
    perfect = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a"), ("d", "d"), ("e", "d")],
        ["email", "cluster_id"],
    )
    row = muc(perfect, truth).collect()[0]
    assert (row["muc_precision"], row["muc_recall"], row["muc_f1"]) == (
        1.0, 1.0, 1.0,
    )

    # split k1 into {a,b} + {c}: R = (3-2)+(2-1) / (2+1) = 2/3;
    # pred clusters {a,b},{c},{d,e} are all truth-pure: P = (1+0+1)/(1+0+1)=1
    split = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "c"), ("d", "d"), ("e", "d")],
        ["email", "cluster_id"],
    )
    row = muc(split, truth).collect()[0]
    assert row["muc_precision"] == 1.0
    assert abs(row["muc_recall"] - 2.0 / 3.0) < 1e-6
    assert abs(row["muc_f1"] - 0.8) < 1e-6


def test_muc_ignores_singletons(spark):
    from email_address_parser_spark.operators.evaluation import muc

    # adding agreeing singletons must not change any MUC number
    truth = spark.createDataFrame(
        [("a", "k1"), ("b", "k1"), ("c", "k1")], ["email", "match_key"]
    )
    pred = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "c")], ["email", "cluster_id"]
    )
    base = muc(pred, truth).collect()[0]
    extra = [(f"s{i}", f"s{i}") for i in range(5)]
    truth2 = truth.unionByName(
        spark.createDataFrame(extra, ["email", "match_key"])
    )
    pred2 = pred.unionByName(
        spark.createDataFrame(extra, ["email", "cluster_id"])
    )
    padded = muc(pred2, truth2).collect()[0]
    assert (base["muc_precision"], base["muc_recall"], base["muc_f1"]) == (
        padded["muc_precision"], padded["muc_recall"], padded["muc_f1"],
    )


# ---------------------------------------------------------------------------
# G66 collective clustering
# ---------------------------------------------------------------------------


def test_collective_promotes_comentioned_near_miss(spark):
    from email_address_parser_spark.operators.comention import (
        collective_clusters,
        context_promoted_pairs,
        comention_edges,
    )

    # mentions: a & b co-travel through two conversations; c is isolated
    mentions = spark.createDataFrame(
        [
            ("c1", "a", True), ("c1", "b", True),
            ("c2", "a", True), ("c2", "b", True),
            ("c3", "c", True),
        ],
        ["conv_id", "email", "valid_lax"],
    )
    # a-b scores in the band; a-c scores in the band but never co-mentioned
    scored = spark.createDataFrame(
        [("a", "b", 0.80), ("a", "c", 0.80)],
        ["email_a", "email_b", "score"],
    )
    aff = comention_edges(mentions)
    promoted = context_promoted_pairs(scored, aff, band=(0.7, 0.9), min_convs=2)
    assert [tuple(r) for r in promoted.collect()] == [("a", "b", 0.80, 2)]

    out = dict(
        (r["email"], r["cluster_id"])
        for r in collective_clusters(
            mentions, scored, band=(0.7, 0.9), min_convs=2
        ).collect()
    )
    assert out == {"a": "a", "b": "a", "c": "c"}


def test_collective_rejects_overlapping_band(spark):
    from email_address_parser_spark.operators.comention import (
        collective_clusters,
    )

    mentions = spark.createDataFrame(
        [("c1", "a", True)], ["conv_id", "email", "valid_lax"]
    )
    scored = spark.createDataFrame(
        [("a", "b", 0.95)], ["email_a", "email_b", "score"]
    )
    with pytest.raises(ValueError):
        collective_clusters(mentions, scored, threshold=0.90, band=(0.7, 0.95))


# ---------------------------------------------------------------------------
# G67 privacy-preserving record linkage
# ---------------------------------------------------------------------------


def test_clk_encode_deterministic_and_bounded(spark):
    from email_address_parser_spark.operators.pprl import clk_encode

    rec = spark.createDataFrame(
        [("a@x.com", "johnsmith"), ("b@y.com", "johnsmith")],
        ["email", "dotless"],
    )
    pos = clk_encode(rec, text_col="dotless")
    rows = {(r["email"], r["pos"]) for r in pos.collect()}
    # identical field → identical bit set (encode is a pure function)
    a = {p for e, p in rows if e == "a@x.com"}
    b = {p for e, p in rows if e == "b@y.com"}
    assert a == b and len(a) > 0
    # bounded: ≤ hashes × bigram count (padded length 11 → 10 bigrams × 2)
    assert len(a) <= 20
    assert all(0 <= p < 256 for p in a)


def test_clk_dice_identical_and_disjoint(spark):
    from email_address_parser_spark.operators.pprl import (
        clk_dice_pairs,
        clk_encode,
    )

    rec = spark.createDataFrame(
        [("a", "johnsmith"), ("b", "johnsmith"), ("c", "zzqqvvww")],
        ["email", "dotless"],
    )
    clk = clk_encode(rec, text_col="dotless")
    pairs = spark.createDataFrame(
        [("a", "b"), ("a", "c")], ["email_a", "email_b"]
    )
    d = {
        (r["email_a"], r["email_b"]): r["dice"]
        for r in clk_dice_pairs(pairs, clk).collect()
    }
    assert d[("a", "b")] == 1.0  # identical filters
    assert d[("a", "c")] < 0.3  # no shared bigrams (collisions only)


def test_clk_composite_separates_near_from_far(spark):
    from email_address_parser_spark.operators.pprl import clk_composite_pairs

    rec = spark.createDataFrame(
        [
            ("j@a.com", "johnsmith", "mail.example.com"),
            ("j@b.com", "johnsmith", "mali.example.com"),  # domain typo
            ("k@a.com", "katebrown", "mail.example.com"),
        ],
        ["email", "dotless", "domain_canon"],
    )
    pairs = spark.createDataFrame(
        [("j@a.com", "j@b.com"), ("j@a.com", "k@a.com")],
        ["email_a", "email_b"],
    )
    out = {
        (r["email_a"], r["email_b"]): r["clk_score"]
        for r in clk_composite_pairs(pairs, rec).collect()
    }
    # same local + near domain ≫ different local + same domain
    assert out[("j@a.com", "j@b.com")] > 0.9
    assert out[("j@a.com", "k@a.com")] < 0.75


def test_clk_lsh_identical_filters_always_pair(spark):
    from email_address_parser_spark.operators.pprl import (
        clk_encode,
        clk_lsh_pairs,
    )

    rec = spark.createDataFrame(
        [("a", "johnsmith"), ("b", "johnsmith"), ("c", "xyzzyplugh")],
        ["email", "dotless"],
    )
    pairs = {
        (r["email_a"], r["email_b"])
        for r in clk_lsh_pairs(clk_encode(rec, text_col="dotless")).collect()
    }
    # identical filters share every band → structural recall
    assert ("a", "b") in pairs


def test_clk_lsh_bucket_cap_prunes_hot_signature(spark):
    from email_address_parser_spark.operators.pprl import (
        clk_encode,
        clk_lsh_pairs,
    )

    # 5 identical filters with cap 4: every bucket they share overflows,
    # so NO pair among them survives; the distinct pair is unaffected
    rec = spark.createDataFrame(
        [(f"h{i}", "hotlocal") for i in range(5)]
        + [("u1", "uniqueone"), ("u2", "uniqueone")],
        ["email", "dotless"],
    )
    pairs = {
        (r["email_a"], r["email_b"])
        for r in clk_lsh_pairs(
            clk_encode(rec, text_col="dotless"), max_bucket=4
        ).collect()
    }
    assert ("u1", "u2") in pairs
    assert not any(a.startswith("h") and b.startswith("h") for a, b in pairs)


def test_clk_invariants_over_random_batch(spark):
    """CLK algebra invariants over a deterministic pseudo-random batch:
    popcount(mask) == |distinct positions|, dice(x, x) == 1, and dice is
    symmetric in its arguments."""
    import random

    from email_address_parser_spark.operators.pprl import (
        clk_dice_pairs,
        clk_encode,
        clk_masks,
    )

    rng = random.Random(0xC1C)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789."
    names = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 20)))
        for _ in range(40)
    ]
    rec = spark.createDataFrame(
        [(f"e{i}", s) for i, s in enumerate(names)], ["email", "dotless"]
    )
    clk = clk_encode(rec, text_col="dotless").persist()

    # popcount == distinct position count
    pos_n = {r["email"]: r["n"] for r in clk.groupBy("email").count()
             .withColumnRenamed("count", "n").collect()}
    mask_n = {r["email"]: r["n"] for r in clk_masks(clk).collect()}
    assert pos_n == mask_n

    # dice(x, x) == 1
    self_pairs = spark.createDataFrame(
        [(f"e{i}", f"e{i}") for i in range(40)], ["email_a", "email_b"]
    )
    assert all(
        r["dice"] == 1.0 for r in clk_dice_pairs(self_pairs, clk).collect()
    )

    # symmetry
    fwd = spark.createDataFrame(
        [(f"e{i}", f"e{i+1}") for i in range(0, 38, 2)],
        ["email_a", "email_b"],
    )
    rev = fwd.select(
        fwd.email_b.alias("email_a"), fwd.email_a.alias("email_b")
    )
    d1 = {
        frozenset((r["email_a"], r["email_b"])): r["dice"]
        for r in clk_dice_pairs(fwd, clk).collect()
    }
    d2 = {
        frozenset((r["email_a"], r["email_b"])): r["dice"]
        for r in clk_dice_pairs(rev, clk).collect()
    }
    assert d1 == d2
    clk.unpersist()


def test_ari_identical_degenerate_partitions_is_one(spark):
    from email_address_parser_spark.operators.evaluation import adjusted_rand

    # both all-singletons: expected == max_index == 0 → convention 1.0
    truth = spark.createDataFrame(
        [(e, f"k{e}") for e in "abcd"], ["email", "match_key"]
    )
    singles = spark.createDataFrame(
        [(e, e) for e in "abcd"], ["email", "cluster_id"]
    )
    row = adjusted_rand(singles, truth).collect()[0]
    assert row["ari"] == 1.0
    # single item: C2(1) = 0 everywhere → same convention, no NULL
    row1 = adjusted_rand(
        spark.createDataFrame([("a", "a")], ["email", "cluster_id"]),
        spark.createDataFrame([("a", "k")], ["email", "match_key"]),
    ).collect()[0]
    assert row1["ari"] == 1.0


def test_muc_degenerate_partitions_yield_zero_not_null(spark):
    from email_address_parser_spark.operators.evaluation import muc

    # truth all singletons: zero truth links → recall 0.0 (not NULL)
    truth = spark.createDataFrame(
        [(e, f"k{e}") for e in "abcd"], ["email", "match_key"]
    )
    pred = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "c"), ("d", "c")],
        ["email", "cluster_id"],
    )
    row = muc(pred, truth).collect()[0]
    assert row["muc_recall"] == 0.0 and row["muc_precision"] == 0.0
    assert row["muc_f1"] == 0.0

    # fully-crossed 2x2: p = r = 0 → f1 0.0, no 0/0 NULL
    truth2 = spark.createDataFrame(
        [("a", "k1"), ("c", "k1"), ("b", "k2"), ("d", "k2")],
        ["email", "match_key"],
    )
    row2 = muc(pred, truth2).collect()[0]
    assert (row2["muc_precision"], row2["muc_recall"], row2["muc_f1"]) == (
        0.0, 0.0, 0.0,
    )


def test_clk_masks_rejects_non_word_multiple_bits(spark):
    from email_address_parser_spark.operators.pprl import clk_dice_pairs

    clk = spark.createDataFrame([("a", 3)], ["email", "pos"])
    pairs = spark.createDataFrame([("a", "a")], ["email_a", "email_b"])
    with pytest.raises(ValueError):
        clk_dice_pairs(pairs, clk, bits=96)


def test_clk_fold_mor_roundtrip_and_idempotency(spark, tmp_path):
    """G70 disk-path contract: bootstrap → MoR append fold → read_state
    equals a from-scratch encode of the grown corpus; re-folding the same
    batch appends nothing."""
    from email_address_parser_spark.operators.pprl import (
        CLK_BUCKET_KEYS,
        CLK_STATE_KEYS,
        CLK_STATE_TABLES,
        build_clk_state,
        clk_encode,
        fold_clk,
    )
    from email_address_parser_spark.streaming.incremental_stream import (
        read_state,
        write_state_mor,
    )

    all_rec = spark.createDataFrame(
        [("a@x", "ann"), ("b@x", "bob"), ("c@x", "cara"), ("d@x", "dan")],
        ["email", "dotless"],
    )
    prev = all_rec.where("email < 'c'")
    # the batch overlaps the bootstrap (c is new twice, b already indexed)
    batch = all_rec.where("email >= 'b'")
    d = str(tmp_path / "clk_state")
    write_state_mor(
        build_clk_state(prev), d, mode="overwrite",
        tables=CLK_STATE_TABLES, merge_keys=CLK_STATE_KEYS,
        bucket_keys=CLK_BUCKET_KEYS,
    )
    out = fold_clk(batch, read_state(spark, d, tables=CLK_STATE_TABLES))
    # delta covers exactly the never-seen emails
    assert {r["email"] for r in out["delta"].select("email").distinct().collect()} == {
        "c@x", "d@x",
    }
    write_state_mor(
        {"clk_pos": out["delta"]}, d, mode="append",
        tables=CLK_STATE_TABLES, merge_keys=CLK_STATE_KEYS,
        bucket_keys=CLK_BUCKET_KEYS,
    )
    resolved = read_state(spark, d, tables=CLK_STATE_TABLES)["clk_pos"]
    expect = clk_encode(all_rec, text_col="dotless")
    assert sorted(map(tuple, resolved.collect())) == sorted(
        map(tuple, expect.collect())
    )
    # re-fold: nothing new
    again = fold_clk(batch, read_state(spark, d, tables=CLK_STATE_TABLES))
    assert again["delta"].count() == 0
