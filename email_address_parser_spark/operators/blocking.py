"""F6/F7/F8 — blocking and candidate-pair generation.

FOUR candidate channels, pairwise DISJOINT by construction (they stratify the
pair space on two axes — same/different canonical domain × same/different
dotless local or block — so their union needs no full-pair dedup shuffle):

  1. exact-domain blocking, salted for hot-domain skew (F6). The salt hashes
     the DOTLESS canonical local part, so every variant of one identity lands
     in the same salt bucket (dot/quote/case/CFWS variants share the dotless
     local) — the split is recall-preserving for true matches while breaking
     a gmail.com-sized block into bounded pieces. Hot domains are detected
     from data (block size > threshold) and broadcast back (small dim).
  2. MinHash-LSH over character 3-gram shingles of the canonical local part
     (F7): banded signatures, bucket-join, SAME domain, cross-block only.
     Catches near-duplicate locals (typos) the salt split separated.
     Hand-rolled (deterministic seeds) instead of pyspark.ml's MinHashLSH to
     stay Arrow/DataFrame-native.
  3. cross-domain exact-local blocking: pairs sharing the DOTLESS canonical
     local across DIFFERENT canonical domains — the domain-typo channel
     (jo.hn@gmial.com ↔ john@gmail.com). Deterministic recall for every
     same-local domain edit; blocks keyed by the (highly selective) local,
     capped at `local_max_block` because globally common locals (info@,
     admin@) are non-discriminative across millions of domains and would
     regenerate a quadratic pair set for entities that are not the same.
  4. cross-domain full-email MinHash-LSH: banded signatures of
     local_canon || '@' || domain_canon, restricted to pairs where BOTH the
     domain and the dotless local differ — the residual channel for
     simultaneous local + domain typos that neither 2 nor 3 can reach.
     Bucket-capped like channel 2.

Channels 1/2 require equal domain_canon; 3/4 require different domain_canon;
3 requires equal dotless local, 4 requires different — a partition, proven by
tests/test_blocking_channels.py + test_cross_domain_channels.py.

Pair generation (F8) is a self-join on the block key with an ordered-pair
predicate (a < b) so each unordered pair appears exactly once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

# --- minhash parameters (fixed seeds — determinism is a hard requirement) ------
#
# Hash design constraints (in priority order):
#   1. vectorizable: one numpy pass per Arrow batch, zero per-row Python in the
#      hot path (np.frombuffer code-point view + sliding-window polynomial +
#      np.minimum.reduceat over per-row gram segments);
#   2. SQL-replayable: every operation is exact int64 arithmetic that DuckDB
#      evaluates identically (products bounded < 2^62; 31-bit AND masks
#      instead of division), so the dedup_minhash oracle can replay
#      signatures → bands → bucket join → exact Jaccard verification
#      bit-for-bit;
#   3. deterministic across runs/processes (fixed RandomState seed, no
#      Python hash()).

N_HASHES = 32
N_BANDS = 8
ROWS_PER_BAND = N_HASHES // N_BANDS
_P_GRAM = 65599          # gram polynomial base (code points < 2^21 ⇒ products < 2^56)
M31 = (1 << 31) - 1      # 31-bit mask (x & M31 ≡ x mod 2^31): no int64 division
_BAND_MULT = 1_000_003   # band fold multiplier (acc*mult < 2^51)
_SHINGLE = 3
_rng = np.random.RandomState(0xE5EED)
# affine-mod-2^31 permutations: h ↦ (a*h + b) & M31 with a forced ODD is a
# bijection on [0, 2^31) (odd a is invertible mod 2^31) — a genuine random
# permutation family for the min-hash, with a 31-bit AND instead of an int64
# division. Products < 2^62 — exact on both numpy and DuckDB.
MINHASH_A = (_rng.randint(1, M31, size=N_HASHES).astype(np.int64) | 1)
MINHASH_B = _rng.randint(0, M31, size=N_HASHES).astype(np.int64)


def _gram_hash_str(s: str) -> int:
    """Polynomial hash of one (whole) short string — the <3-char fallback."""
    h = 0
    for ch in s:
        h = (h * _P_GRAM + ord(ch)) & M31
    return h


def minhash_signatures_batch(strings: list, n_hashes: int = N_HASHES) -> np.ndarray:
    """(n, n_hashes) int64 minhash signatures for a batch of strings — the
    first `n_hashes` of the house permutation family, so a reduced-width
    caller (the email channel) computes a PREFIX of the full signature and
    stays replayable with the same constants.

    Fully vectorized: the batch is concatenated once, viewed as a code-point
    array (utf-32-le frombuffer), the 3-gram polynomial hashes are one sliding
    -window expression over the whole batch, and the per-row minima under each
    affine permutation are np.minimum.reduceat over row segments. Strings
    shorter than the shingle width hash as a single whole-string gram
    (per-row fallback; rare)."""
    n = len(strings)
    sigs = np.empty((n, n_hashes), dtype=np.int64)
    if n == 0:
        return sigs
    lens = np.fromiter((len(s) for s in strings), dtype=np.int64, count=n)
    big = "".join(strings)
    cp = np.frombuffer(big.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    offs = np.concatenate(([0], np.cumsum(lens)))
    total = len(cp)
    g = (
        ((cp[:-2] * _P_GRAM + cp[1:-1]) * _P_GRAM + cp[2:]) & M31
        if total >= 3
        else np.empty(0, dtype=np.int64)
    )
    long_rows = np.nonzero(lens >= _SHINGLE)[0]
    if len(long_rows):
        counts = lens[long_rows] - (_SHINGLE - 1)
        mark = np.zeros(len(g) + 1, dtype=np.int64)
        np.add.at(mark, offs[long_rows], 1)
        np.add.at(mark, offs[long_rows] + counts, -1)
        valid = np.cumsum(mark[:-1]) > 0
        gv = g[valid]
        seg = np.concatenate(([0], np.cumsum(counts)[:-1]))
        for k in range(n_hashes):
            vals = (MINHASH_A[k] * gv + MINHASH_B[k]) & M31
            sigs[long_rows, k] = np.minimum.reduceat(vals, seg)
    for i in np.nonzero(lens < _SHINGLE)[0]:
        h = _gram_hash_str(strings[i])
        sigs[i, :] = (MINHASH_A[:n_hashes] * h + MINHASH_B[:n_hashes]) & M31
    return sigs


def minhash_band_sigs(sigs: np.ndarray) -> np.ndarray:
    """(n, n_bands) band keys: polynomial fold of each band's ROWS_PER_BAND
    consecutive signature values, masked to 31 bits (exact in int64 and in
    DuckDB). The band count follows the signature width, so reduced-width
    signatures (the email channel) fold into proportionally fewer bands."""
    n = sigs.shape[0]
    n_bands = sigs.shape[1] // ROWS_PER_BAND
    out = np.empty((n, n_bands), dtype=np.int64)
    for b in range(n_bands):
        acc = np.zeros(n, dtype=np.int64)
        for r in range(ROWS_PER_BAND):
            acc = (acc * _BAND_MULT + sigs[:, b * ROWS_PER_BAND + r]) & M31
        out[:, b] = acc
    return out


def minhash_signature(s: str) -> list:
    """Scalar convenience wrapper (tests / exploration): one row through the
    batch kernel."""
    return minhash_signatures_batch([s if isinstance(s, str) else ""])[0].tolist()


def minhash_oracle_sql_parts() -> dict:
    """The hash constants, formatted for embedding in DuckDB oracle SQL that
    replays the signature/band computation exactly (see __spark_entry__)."""
    return {
        "p_gram": _P_GRAM,
        "m31": M31,
        "band_mult": _BAND_MULT,
        "a": [int(x) for x in MINHASH_A],
        "b": [int(x) for x in MINHASH_B],
        "n_hashes": N_HASHES,
        "n_bands": N_BANDS,
        "rows_per_band": ROWS_PER_BAND,
    }


@pandas_udf(ArrayType(LongType()))
def minhash_bands_udf(locals_: pd.Series) -> pd.Series:
    """Per string: N_BANDS band signatures (the LSH bucket keys), one
    vectorized batch pass (no per-row Python)."""
    strings = [s if isinstance(s, str) else "" for s in locals_]
    bands = minhash_band_sigs(minhash_signatures_batch(strings))
    return pd.Series(list(bands))


# Channel 4 (cross-domain full-email LSH) runs HALF-width: the residual
# channel for simultaneous local+domain typos needs far less collision
# probability than the primary same-domain typo channel — and its per-band
# costs (signature hashing on the dim, explode rows, cap-window size,
# self-join fan-in) all scale linearly with the band count. Measured at
# sf0.01: the channel's responsibility set (true pairs where BOTH the
# domain and the dotless local differ) is covered at EVERY band count
# (/tmp probe, round 5 — the corpus' cross-domain true pairs all share the
# dotless local and ride channel 3), so PC = 1.0 is band-count-invariant
# here; the 4-band floor keeps the residual recall surface real
# (P[collide] = 1-(1-s^4)^4 ≈ 66% at gram-similarity 0.7) at half the
# cost. The oracle replays the same prefix constants (EMAIL_N_BANDS is
# threaded into oracles.email_lsh_pairs_cte).
EMAIL_N_BANDS = 4


@pandas_udf(ArrayType(LongType()))
def email_minhash_bands_udf(emails_: pd.Series) -> pd.Series:
    """Half-width banding for the email channel: the FIRST
    EMAIL_N_BANDS*ROWS_PER_BAND permutations of the house family (a prefix,
    so the DuckDB replay uses the same constants)."""
    strings = [s if isinstance(s, str) else "" for s in emails_]
    sigs = minhash_signatures_batch(strings, n_hashes=EMAIL_N_BANDS * ROWS_PER_BAND)
    return pd.Series(list(minhash_band_sigs(sigs)))


# --- exact-domain salted blocking ----------------------------------------------


def with_salted_domain_block(
    mentions: DataFrame,
    hot_threshold: int = 10_000,
    target_block_size: int = 5_000,
    sizes: DataFrame = None,
) -> DataFrame:
    """Add `block_key`: domain_canon, salted when the domain block exceeds
    hot_threshold rows. Salt = hash(dotless local) % n_salts, so variants of
    one identity always share a bucket. The hot-domain dim is tiny (only
    domains above threshold) and is broadcast.

    `sizes` optionally supplies precomputed (domain_canon, _dom_n) counts —
    the incremental fold maintains them as state instead of re-aggregating
    the dim every batch; salting decisions are then identical to a full run
    over the same union corpus."""
    dotless = F.regexp_replace(F.col("local_canon"), r"\.", "")
    if sizes is None:
        sizes = mentions.groupBy("domain_canon").agg(
            F.count(F.lit(1)).alias("_dom_n")
        )
    sizes = (
        sizes.where(F.col("_dom_n") > hot_threshold)
        .withColumn(
            "_n_salts",
            F.ceil(F.col("_dom_n") / F.lit(target_block_size)).cast("int"),
        )
        .select("domain_canon", "_n_salts")
    )
    joined = mentions.join(F.broadcast(sizes), "domain_canon", "left")
    return joined.withColumn(
        "block_key",
        F.when(
            F.col("_n_salts").isNotNull(),
            F.concat(
                F.col("domain_canon"),
                F.lit("#"),
                F.pmod(F.xxhash64(dotless), F.col("_n_salts")).cast("string"),
            ),
        ).otherwise(F.col("domain_canon")),
    ).drop("_n_salts")


# --- candidate pairs -------------------------------------------------------------


def _unique_mentions(mentions: DataFrame) -> DataFrame:
    """Entity resolution operates on distinct valid mention strings, not
    occurrences: dedupe first so pair generation is quadratic in DISTINCT
    emails per block, not in raw mention count."""
    return (
        mentions.where(F.col("valid_lax"))
        .select("email", "local_canon", "domain_canon")
        .dropDuplicates(["email"])
    )


def uniq_valid_mentions(mentions: DataFrame) -> DataFrame:
    """Distinct valid emails with their canonical/matching columns — the ONE
    table every downstream ER stage keys off. Compute (and persist) it once:
    reps, star edges, and the cluster node set all derive from it with
    shuffles over |distinct emails| rows instead of re-scanning and
    re-deduplicating the full mention stream per stage."""
    return (
        mentions.where(F.col("valid_lax"))
        .select("email", "local_canon", "domain_canon", "match_key")
        .dropDuplicates(["email"])
    )


def match_key_representatives(mentions: DataFrame, uniq: DataFrame = None) -> DataFrame:
    """One representative per exact-canonical key (match_key = dotless local
    @ lower domain): the min email, carrying that email's OWN local_canon
    (dotted) as the scoring feature. Emails sharing a match_key are trivially
    the same entity (score formula: jw=1, lev=0, dom=0, dotless_eq=1 ⇒
    score=1.0), so the quadratic fuzzy stage only needs to compare KEYS —
    the standard exact-dedup-before-fuzzy-match reduction. At 10^12 turns
    this shrinks the pair space by the per-entity variant multiplicity
    squared.

    The rep keeps the min email's actual local_canon (min_by) rather than the
    dot-stripped key local: JW/Levenshtein then see the same dotted strings
    the full path scores (dot-insensitivity is already captured by the
    dotless_eq feature), so cross-key pairs near the threshold score
    identically on both paths instead of flipping sides when dots are
    stripped (round-1 ADVICE)."""
    src = uniq if uniq is not None else uniq_valid_mentions(mentions)
    return (
        src.groupBy("match_key", "domain_canon")
        .agg(
            F.min("email").alias("email"),
            F.min_by("local_canon", "email").alias("local_canon"),
        )
        .select("email", "local_canon", "domain_canon")
    )


def exact_match_edges(mentions: DataFrame, uniq: DataFrame = None) -> DataFrame:
    """Star edges (root = min email) inside each exact-canonical group —
    guaranteed matches that never enter the pairwise scorer. One shuffle on
    match_key; output is already depth-1, so the CC loop converges on these
    immediately."""
    src = uniq if uniq is not None else uniq_valid_mentions(mentions)
    uniq = src.select("email", "match_key")
    roots = uniq.groupBy("match_key").agg(F.min("email").alias("_root"))
    return (
        uniq.join(roots, "match_key")
        .where(F.col("email") != F.col("_root"))
        .select(
            F.col("_root").alias("src"),
            F.col("email").alias("dst"),
            F.lit(1.0).alias("score"),
        )
    )


_PAIR_COLS = [
    "email_a", "email_b", "local_canon_a", "local_canon_b",
    "domain_canon_a", "domain_canon_b",
]


def _cap_buckets(
    df: DataFrame,
    keys: list,
    cap: int,
    via_window: bool,
    prune_uniform: list = (),
) -> DataFrame:
    """Drop every row whose bucket (group on `keys`) holds more than `cap`
    rows — the over-populous-key purge shared by the LSH and exact-local
    channels. Two plan shapes, identical output:

      * groupBy + join-back (via_window=False): an agg shuffle producing the
        sizes dim, then an equi-join of the exploded table against it. Three
        exchanges counting the downstream self-join's.
      * window count (via_window=True): ONE hash exchange on `keys`, a
        per-partition sort, count(*) over the frame, filter. The window's
        output partitioning is exactly the downstream self-join's join key
        partitioning, so the SMJ reuses the exchange instead of re-shuffling
        both sides.

    prune_uniform (round 5): additionally drop every bucket in which ANY of
    the named columns is constant (min == max over the bucket). Useful when
    the downstream self-join carries a `!=` predicate on that column: a
    uniform bucket cannot produce a single surviving pair, yet it is exactly
    where join fan-out concentrates (identity-variant clusters share all
    band signatures). Output-set-neutral, so pair oracles are untouched,
    and the min/max aggregates ride the SAME window exchange — no new
    shuffle. SHIPPED OFF everywhere: the sf0.1 interleaved A/B on the full
    pairs chain read pruned 11.0/14.2 s vs unpruned 10.3/11.3 s — at this
    corpus the 80% raw-join-row reduction (915,904 → 181,717 surviving,
    measured) is cheaper to discard post-join than to pre-filter, because
    the extra window passes touch every exploded row while the capped
    join's fan-out is already bounded at cap²/2 per bucket. Revisit for
    corpora with cap-sized uniform buckets on most keys."""
    prune_uniform = list(prune_uniform)
    if not via_window:
        aggs = [F.count(F.lit(1)).alias("_bn")] + [
            (F.min(c) == F.max(c)).alias(f"_u_{c}") for c in prune_uniform
        ]
        sizes = df.groupBy(*keys).agg(*aggs)
        keep = F.col("_bn") <= cap
        for c in prune_uniform:
            keep = keep & ~F.col(f"_u_{c}")
        return df.join(
            sizes.where(keep).select(*keys), keys
        )
    w = Window.partitionBy(*keys)
    out = df.withColumn("_bn", F.count(F.lit(1)).over(w))
    keep = F.col("_bn") <= cap
    for c in prune_uniform:
        out = out.withColumn(f"_u_{c}", F.min(c).over(w) == F.max(c).over(w))
        keep = keep & ~F.col(f"_u_{c}")
    return out.where(keep).drop("_bn", *[f"_u_{c}" for c in prune_uniform])


def candidate_pairs(
    mentions: DataFrame,
    hot_threshold: int = 10_000,
    target_block_size: int = 5_000,
    use_lsh: bool = True,
    lsh_max_bucket: int = 50,
    collapse_exact: bool = False,
    dedupe: bool = True,
    uniq: DataFrame = None,
    materialize: bool = True,
    use_cross_domain: bool = True,
    local_max_block: int = 50,
    use_email_lsh: bool = True,
    eager: bool = False,
    cap_via_window: bool = True,
) -> DataFrame:
    """→ (email_a, email_b, local_canon_a/b, domain_canon_a/b), each unordered
    pair once. Union of the four disjoint channels (module docstring): salted
    exact-domain, same-domain cross-block local-LSH, cross-domain exact-local
    (use_cross_domain, capped at local_max_block), and cross-domain
    full-email LSH (use_email_lsh, capped at lsh_max_bucket).

    Scale switches (both used by the headline pipeline/bench; the oracle
    paths keep the defaults so the full pair set stays SQL-replayable):
      * collapse_exact — run the quadratic stages over one representative
        per match_key instead of every distinct email; pair with
        exact_match_edges() for the within-key guaranteed matches.
      * dedupe=False — skip the LSH-channel dropDuplicates shuffle; the
        few duplicated candidates (LSH multi-band collisions) score
        identically, and match_edges de-duplicates the far smaller edge
        set instead.

    The channels are pairwise DISJOINT by construction, so no full-pair-set
    dedup shuffle ever runs (round-3: this removed the single biggest
    exchange in er_pairs_scored — the wide 2M-row dropDuplicates):
      * every local-LSH pair shares domain_canon (join key), so in a non-hot
        domain both sides carry block_key == domain_canon and the pair is
        already generated by the exact channel;
      * in a hot domain, a same-salt-bucket pair shares block_key and is
        likewise an exact-channel pair;
      * therefore the local-LSH channel keeps ONLY cross-block pairs
        (block_key_a != block_key_b — the typo'd locals whose dotless
        hashes landed in different salt buckets), which the exact channel
        can never produce. Exact-channel pairs are unique outright (one
        block_key per email ⇒ one join hit per pair);
      * the two cross-domain channels require domain_canon_a !=
        domain_canon_b (channels 1/2 require equality); the email-LSH
        channel additionally requires the dotless locals to DIFFER, making
        it disjoint from the exact-local channel. LSH multi-band duplicates
        are removed within each (far smaller) channel when dedupe=True; the
        exact-local channel is duplicate-free outright (single join key).

    materialize (default True) persists the blocked distinct-email dim:
    the plan references it five times (two exact-join sides, two LSH-join
    sides, the bucket-size aggregate), and without a cache each reference
    re-runs the distinct + hot-domain subtree — Spark's compile-time plan
    shows zero ReusedExchange across them. The dim is O(|distinct emails|)
    (tiny next to the pair set; the 100 TB pipeline checkpoints this very
    table — pipeline.py persists uniq for the same reason), the cache entry
    is keyed by logical plan so repeated identical calls share it, and
    eviction is LRU. Measured same-session pinned A/B at sf0.1 ×3 runs:
    old overlapping-channels plan best 15.1 s, disjoint+persist best 7.5 s
    for the full score_pairs chain."""
    if collapse_exact:
        uniq = match_key_representatives(mentions, uniq=uniq)
    elif uniq is not None:
        uniq = uniq.select("email", "local_canon", "domain_canon")
    else:
        uniq = _unique_mentions(mentions)
    blocked = with_salted_domain_block(uniq, hot_threshold, target_block_size)
    if use_cross_domain:
        # dotless local: the cross-domain block key (cheap Catalyst regexp,
        # computed once on the persisted dim)
        blocked = blocked.withColumn(
            "_dotless", F.regexp_replace(F.col("local_canon"), r"\.", "")
        )
        if use_email_lsh and "email_bands" not in blocked.columns:
            # full-email signatures ride the persisted dim: channel 4
            # references them three times (bucket sizes + both join sides),
            # and unlike the short-local banding of channel 2 the assembled
            # address is ~2× the bytes — re-evaluating the UDF per reference
            # measurably dominated the channel (sf0.01 A/B). Half-width
            # banding (EMAIL_N_BANDS): see email_minhash_bands_udf.
            blocked = blocked.withColumn(
                "email_bands",
                email_minhash_bands_udf(
                    F.concat(F.col("local_canon"), F.lit("@"), F.col("domain_canon"))
                ),
            )
    if materialize:
        blocked = blocked.persist()
        if eager:
            # Populate the cache BEFORE the multi-channel query references it:
            # AQE submits the leaf exchange stages of all four channels
            # concurrently at query start, and a stage that begins while the
            # cache is still cold recomputes the whole dim subtree (distinct +
            # hot-domain agg + banding UDFs) instead of waiting for a sibling
            # to fill it. One tiny count()-job here serializes that work once.
            blocked.count()

    # The self-join carries all pair columns through its exchange: measured
    # at replicated scale (x32 corpus, 1.7M distinct emails), generating
    # id-only pairs and re-attaching local/domain via equi-joins LOSES —
    # once the distinct-email table outgrows the broadcast threshold the two
    # attach joins are full sort-merge shuffles of the pair set, costing
    # more than the wider payload ever did. Exchange COUNT beats exchange
    # bytes.
    def self_join(
        df: DataFrame,
        key: list,
        cross_block: bool = False,
        cross_domain: bool = False,
        diff_local: bool = False,
    ) -> DataFrame:
        a = df.alias("a")
        b = df.alias("b")
        cond = F.col("a.email") < F.col("b.email")
        if cross_block:
            cond = cond & (F.col("a.block_key") != F.col("b.block_key"))
        if cross_domain:
            cond = cond & (F.col("a.domain_canon") != F.col("b.domain_canon"))
        if diff_local:
            cond = cond & (F.col("a._dotless") != F.col("b._dotless"))
        return (
            a.join(b, on=key)
            .where(cond)
            .select(
                F.col("a.email").alias("email_a"),
                F.col("b.email").alias("email_b"),
                F.col("a.local_canon").alias("local_canon_a"),
                F.col("b.local_canon").alias("local_canon_b"),
                F.col("a.domain_canon").alias("domain_canon_a"),
                F.col("b.domain_canon").alias("domain_canon_b"),
            )
        )

    pairs = self_join(
        blocked.select("block_key", "email", "local_canon", "domain_canon"),
        ["block_key"],
    )

    if use_lsh:
        with_bands = blocked.select(
            "email",
            "local_canon",
            "domain_canon",
            "block_key",
            F.posexplode(minhash_bands_udf(F.col("local_canon"))).alias(
                "band_idx", "band_sig"
            ),
        )
        # Frequent-bucket pruning: a bucket holding more than lsh_max_bucket
        # emails is non-discriminative (e.g. a corpus whose locals share a long
        # prefix makes most pairs band-collide) and would regenerate the full
        # quadratic pair set; true near-duplicate groups are small. Standard
        # LSH-at-scale practice; the exact-domain channel keeps full recall on
        # the blocking key regardless.
        #
        # Shape note (measured at x32 corpus / 1.7M distinct emails): the
        # tungsten sort-merge self-join beats a collect_list + HOF pair
        # explosion ~3x here (per-row array/struct allocation dominates at
        # email-corpus pair volumes), even though the self-join evaluates the
        # banding UDF once per side — the vectorized numpy signature kernel
        # is cheap enough that duplicating it costs far less than the HOF
        # expansion. dedup.py keeps the single-eval HOF form for DOCUMENT
        # corpora, where signatures (long texts) dominate and buckets are
        # few. LSH pairs only gate the scorer; restricting to same canonical
        # domain keeps the channel to hard same-domain candidates (identity
        # variants never change the domain).
        bounded = _cap_buckets(
            with_bands, ["band_idx", "band_sig"], lsh_max_bucket, cap_via_window
        )
        lsh_pairs = self_join(
            bounded, ["band_idx", "band_sig", "domain_canon"], cross_block=True
        )
        if dedupe:
            # only multi-band duplicates remain, and only within this channel
            lsh_pairs = lsh_pairs.dropDuplicates(["email_a", "email_b"])
        pairs = pairs.unionByName(lsh_pairs)

    if use_cross_domain:
        # channel 3 — cross-domain exact-local block. Block sizes are counted
        # over the whole dim (not per domain): a local shared by >cap emails
        # is non-discriminative wherever it appears.
        bounded_local = _cap_buckets(
            blocked, ["_dotless"], local_max_block, cap_via_window
        )
        xd_pairs = self_join(
            bounded_local.select(
                "_dotless", "email", "local_canon", "domain_canon"
            ),
            ["_dotless"],
            cross_domain=True,
        )
        pairs = pairs.unionByName(xd_pairs)

        if use_email_lsh:
            # channel 4 — cross-domain full-email LSH (different dotless
            # locals only). Signatures over the canonical assembled address
            # (precomputed on the persisted dim above); bucket sizes counted
            # over all emails in the bucket.
            with_ebands = blocked.select(
                "email",
                "local_canon",
                "domain_canon",
                "_dotless",
                F.posexplode(F.col("email_bands")).alias("band_idx", "band_sig"),
            )
            ebounded = _cap_buckets(
                with_ebands,
                ["band_idx", "band_sig"],
                lsh_max_bucket,
                cap_via_window,
            )
            email_lsh_pairs = self_join(
                ebounded,
                ["band_idx", "band_sig"],
                cross_domain=True,
                diff_local=True,
            )
            if dedupe:
                email_lsh_pairs = email_lsh_pairs.dropDuplicates(
                    ["email_a", "email_b"]
                )
            pairs = pairs.unionByName(email_lsh_pairs)

    return pairs
