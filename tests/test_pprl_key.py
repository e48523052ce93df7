"""PPRL hardening (round-5 ADVICE): keyed CLK hashing and missing-mask
pair semantics.

1. The encoder secret ``key`` must change the filters (so the public
   unkeyed constants are only the oracle-parity path), be deterministic
   for a fixed key, and thread identically through the incremental fold
   (fold(key) == rebuild(key), the G70 contract).
2. clk_dice_pairs must KEEP a candidate pair whose endpoint has no CLK
   row (NULL/empty encoded field -> no bigram rows) and score it dice 0,
   instead of silently dropping it through an inner join.
"""

from __future__ import annotations

from email_address_parser_spark.operators.pprl import (
    build_clk_state,
    clk_dice_pairs,
    clk_encode,
    fold_clk,
)


def _pos_set(df):
    return {(r["email"], r["pos"]) for r in df.collect()}


def test_keyed_encode_differs_and_is_deterministic(spark):
    rec = spark.createDataFrame(
        [("a@x.com", "alice"), ("b@x.com", "bob")], ["email", "dotless"]
    )
    unkeyed = _pos_set(clk_encode(rec, text_col="dotless"))
    keyed = _pos_set(clk_encode(rec, text_col="dotless", key="s3cret"))
    keyed2 = _pos_set(clk_encode(rec, text_col="dotless", key="s3cret"))
    other = _pos_set(clk_encode(rec, text_col="dotless", key="other"))
    assert keyed == keyed2          # deterministic for a fixed key
    assert keyed != unkeyed         # the key actually changes the filters
    assert keyed != other           # ...and different keys differ
    # same structural shape: every record still has ≥1 set position
    assert {e for e, _ in keyed} == {"a@x.com", "b@x.com"}


def test_fold_clk_threads_key(spark):
    base = spark.createDataFrame([("a@x.com", "alice")], ["email", "dotless"])
    batch = spark.createDataFrame([("b@x.com", "bob")], ["email", "dotless"])
    state = build_clk_state(base, key="s3cret")
    folded = fold_clk(batch, state, key="s3cret")["state"]["clk_pos"]
    rebuilt = build_clk_state(
        base.unionByName(batch), key="s3cret"
    )["clk_pos"]
    assert _pos_set(folded) == _pos_set(rebuilt)


def test_dice_pairs_keep_missing_mask_as_zero(spark):
    # only a@x.com has CLK rows; the (a, ghost) candidate must survive
    # with dice 0, not vanish (ADVICE round-5: inner->left join)
    clk = clk_encode(
        spark.createDataFrame([("a@x.com", "alice")], ["email", "dotless"]),
        text_col="dotless",
    )
    pairs = spark.createDataFrame(
        [("a@x.com", "ghost@y.com"), ("ghost@y.com", "phantom@z.com")],
        ["email_a", "email_b"],
    )
    rows = {
        (r["email_a"], r["email_b"]): r for r in clk_dice_pairs(pairs, clk).collect()
    }
    assert set(rows) == {
        ("a@x.com", "ghost@y.com"),
        ("ghost@y.com", "phantom@z.com"),
    }
    half = rows[("a@x.com", "ghost@y.com")]
    assert half["n_b"] == 0 and half["n_common"] == 0 and half["dice"] == 0.0
    both = rows[("ghost@y.com", "phantom@z.com")]
    # both endpoints missing: the 0/0 Dice is guarded to 0, not NULL/NaN
    assert both["n_a"] == 0 and both["dice"] == 0.0


def test_composite_threads_bits_through_masks(spark):
    """Round-5 review: clk_composite_pairs must pass `bits` to clk_masks —
    with bits=128 the packed dim has m0..m1 only, and the old unthreaded
    call selected m0..m3 and raised. Smoke the non-default width end to
    end and sanity-check the score range."""
    from email_address_parser_spark.operators.pprl import clk_composite_pairs

    rec = spark.createDataFrame(
        [("a@x.com", "alice", "x.com"), ("b@y.com", "alicia", "y.com")],
        ["email", "dotless", "domain_canon"],
    )
    pairs = spark.createDataFrame([("a@x.com", "b@y.com")], ["email_a", "email_b"])
    row = clk_composite_pairs(pairs, rec, bits=128).collect()[0]
    assert 0.0 < row["dice_local"] < 1.0          # alice/alicia share bigrams
    assert row["clk_score"] == round(
        0.7 * row["dice_local"] + 0.3 * row["dice_domain"], 6
    )
