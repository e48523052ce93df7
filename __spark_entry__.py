"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship query on sf0.001.
`queries()` — one entry per implemented operator (SURVEY.md §2); each callable
(spark, sf_dir) -> DataFrame built from the engine's DataFrame operators.
`oracle_sql()` — DuckDB ANSI-SQL twins over the same parquet views; the
entity-resolution oracles replay the generative contract in
email_address_parser_spark.sources.testdata (same CTE text both engines).

Determinism rules used throughout (so value-hashes match across engines):
  * money aggregations go through floor(x*10000) BIGINT cents (bit-exact,
    order-insensitive) instead of float sums;
  * jaro-winkler is byte-based matching DuckDB's jaro_winkler_similarity;
  * every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from email_address_parser_spark import oracles as _oracles
from email_address_parser_spark.operators.blocking import candidate_pairs
from email_address_parser_spark.operators.extract import extract_mentions, with_canonical
from email_address_parser_spark.operators.scoring import match_edges, score_pairs
from email_address_parser_spark.pipeline import cluster_mentions
from email_address_parser_spark.sources.testdata import (
    MENTIONS_EXPECTED_CTE,
    derive_transcripts,
    load_table,
)

MENTION_COLS = [
    "conv_id", "turn_idx", "mention_idx", "raw", "local_part", "domain",
    "valid_strict", "valid_lax", "email",
]


def _mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_canonical(extract_mentions(derive_transcripts(spark, sf_dir)))


def _pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # unsalted here: the oracle needs the full same-domain pair set; the salted
    # path is exercised by pytest + bench (salt hashes are engine-specific)
    return candidate_pairs(_mentions(spark, sf_dir), hot_threshold=1 << 40)


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    return score_pairs(_pairs(spark, sf_dir))


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: mention extraction + parse over transcripts derived from
    sf0.001, aggregated per canonical domain."""
    return queries()["er_mentions_by_domain"](spark, "/root/testdata/sf0.001")


def _queries_impl() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # NOTE: this literal keeps the *thematic* grouping (ER core, metrics,
    # relational, events, docs, dedup, ANN, PPRL, ...).  The driver-facing
    # `queries()` wrapper at the bottom of the file re-orders it per
    # `_DRIVER_CHECK_ORDER` so the driver's finite CORRECTNESS window
    # rotates onto the least-recently-checked queries each round.
    return {
        # --- entity resolution core (F1-F11) -------------------------------
        "er_mentions": lambda spark, sf: _mentions(spark, sf).select(*MENTION_COLS),
        "er_mentions_by_domain": lambda spark, sf: (
            _mentions(spark, sf)
            .where(F.col("valid_lax"))
            .groupBy("domain_canon")
            .agg(
                F.count(F.lit(1)).alias("n_mentions"),
                F.countDistinct("email").alias("n_distinct_emails"),
            )
        ),
        "er_candidate_pairs": lambda spark, sf: _pairs(spark, sf).select(
            "email_a", "email_b"
        ),
        "er_pair_features": lambda spark, sf: _scored(spark, sf).select(
            "email_a", "email_b", "jw_local", "lev_local", "dom_edit",
            "dotless_eq", "score",
        ),
        "er_edges": lambda spark, sf: match_edges(_scored(spark, sf)),
        # hard-negative mining for the ER training loop: the near-miss band
        # just under the match threshold, globally top-k by closeness (a
        # TakeOrderedAndProject — no full sort at scale), total order so
        # the cut is deterministic. These are the pairs an active-learning
        # annotator or a pairwise-classifier trainer wants first.
        "er_hard_negatives": lambda spark, sf: (
            _scored(spark, sf)
            .where((F.col("score") >= 0.70) & (F.col("score") < 0.90))
            .orderBy(F.col("score").desc(), "email_a", "email_b")
            .limit(500)
            .select("email_a", "email_b", "jw_local", "lev_local", "score")
        ),
        "er_clusters": lambda spark, sf: (
            lambda m: cluster_mentions(m, match_edges(score_pairs(
                candidate_pairs(m, hot_threshold=1 << 40)
            )))
        )(_mentions(spark, sf)),
        # Display/round-trip invariant (SURVEY §1.4 / email_address.rs:312-316):
        # for every valid mention the verbatim captures re-concatenate to the
        # exact input slice — proves no trimming/unquoting/case-folding leaks
        # into the parity columns.
        "er_roundtrip": lambda spark, sf: (
            _mentions(spark, sf)
            .where(F.col("valid_lax"))
            .select(
                "conv_id",
                "turn_idx",
                "mention_idx",
                (
                    F.concat(F.col("local_part"), F.lit("@"), F.col("domain"))
                    == F.col("raw")
                ).alias("display_roundtrip"),
                (F.col("email") == F.col("raw")).alias("email_eq_raw"),
            )
        ),
        "er_cluster_sizes": lambda spark, sf: (
            lambda m: cluster_mentions(m, match_edges(score_pairs(
                candidate_pairs(m, hot_threshold=1 << 40)
            )))
        )(_mentions(spark, sf))
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_members")),
        # pairwise precision/recall/F1 of the match decision against the
        # generative ground truth (match_key equality) — the BASELINE.json
        # acceptance metric as an oracle-checked driver query
        "er_match_f1": _er_match_f1,
        # the full tuning curve behind that single cut: P/R/F1 at every
        # 0.01-wide score bucket in one pass (map-side collapse to ≤101
        # rows, then cumulative windows over the tiny bucket dim)
        "er_threshold_sweep": _er_threshold_sweep,
        # data-quality provenance: mentions + strict/lax parse rates per
        # (role, tool) producer cell of the transcript surface
        "er_mention_provenance": _er_mention_provenance,
        # blocking skew-cost report: top-20 blocks by size with quadratic
        # pair cost and cost share — the input to the hot_threshold choice
        "er_block_skew": _er_block_skew,
        # longitudinal entity activity: per (cluster, month) mention and
        # conversation counts over the event-time ts column
        "er_entity_activity": _er_entity_activity,
        # G45: B-cubed cluster quality (per-item metric) — the engine
        # clustering AND the exact-canonical-only ablation vs the labeled
        # truth; the ablation row quantifies the recall the fuzzy channels buy
        "er_bcubed": _er_bcubed,
        # G47: conversation co-mention affinity graph — context signal over
        # the transcript structure (capped per-conversation quadratic)
        "er_comention": _er_comention,
        # G48: channel attribution of match edges — which candidate channel
        # each accepted edge came from, with its truth composition
        "er_channel_contribution": _er_channel_contribution,
        # G40: survivorship — one golden record per cluster (counts +
        # mention-weighted mode of domain_canon, ties lexicographic)
        "er_golden_record": _er_golden_record,
        # F12 diagnostics: per-cluster cohesion (edge density, score stats)
        "er_cluster_density": _er_cluster_density,
        # G42: incremental golden records (composes the G24 cluster fold
        # with G40 survivorship; only touched clusters recompute)
        "er_golden_record_incr": _er_golden_record_incr,
        # batch-incremental cluster maintenance: fold the held-out 20% of
        # conversations into clusters built from the other 80%; the oracle is
        # the FULL-corpus clustering, so a triple-match proves the
        # incremental path equals a from-scratch recompute
        "er_incremental": _er_incremental,
        # v2 state-maintained fold: every derived dim (reps, domain counts,
        # LSH bucket counts) is merged from persisted state instead of
        # re-aggregated, and the fold emits a delta; same full-recompute
        # oracle certifies fold == from-scratch clustering
        "er_incremental_fold": _er_incremental_fold,
        "er_forget": _er_forget,
        "er_threshold_clusters": _er_threshold_clusters,
        "er_merge_tree": _er_merge_tree,
        "er_constrained_split": _er_constrained_split,
        # G62: must-link merge — the positive half of the review loop
        "er_must_link_merge": _er_must_link_merge,
        # G63: best-match (1-NN star) clustering — precision-leaning
        # alternative closure over strongest-evidence edges only
        "er_best_match_clusters": _er_best_match_clusters,
        # G64: Adjusted Rand Index — chance-corrected pair-counting metric
        "er_ari": _er_ari,
        # G65: MUC link-based F1 — singleton-insensitive fourth metric lens
        "er_muc": _er_muc,
        # G66: collective ER — co-mention context promotes near-miss pairs
        "er_collective_clusters": _er_collective_clusters,
        # G67: privacy-preserving linkage — CLK Bloom filters, Dice composite
        "er_pprl_pairs": _er_pprl_pairs,
        # G67 quality: the measured privacy tax of matching on encodings
        "er_pprl_match_f1": _er_pprl_match_f1,
        # G68: privacy-preserving blocking — LSH over the CLK bit positions
        "er_pprl_blocking_metrics": _er_pprl_blocking_metrics,
        # G67+G68: the fully private pipeline graded against ALL true pairs
        "er_pprl_e2e_f1": _er_pprl_e2e_f1,
        # G67 tuning curve: the PR sweep behind the fixed 0.975 cut
        "er_pprl_sweep": _er_pprl_sweep,
        # G67 audit: anonymity-class histogram (frequency-attack risk)
        "er_pprl_anonymity": _er_pprl_anonymity,
        # G69: the closure-strategy scoreboard — B³ for all four clusterings
        "er_clustering_compare": _er_clustering_compare,
        # G70: incremental private-index fold (fold == full re-encode)
        "er_pprl_index_incr": _er_pprl_index_incr,
        # F14 regression diffing vs golden: exceptAll both ways + intersect
        # between the engine's clustering and the match_key clustering
        "er_clusters_diff_golden": _er_clusters_diff_golden,
        # G43: SCD2 cluster-membership history — two epochs (80% bootstrap,
        # then the G24 fold), folded into a (email, cluster_id, valid_from,
        # valid_to, is_current) timeline; oracle recomputes the SCD2 table
        # from the two match-key clusterings directly
        "er_membership_history": _er_membership_history,
        # --- generic relational operators (F4, F8, F12-F14) ----------------
        "q1_pricing_summary": _q1_pricing_summary,
        "q3_shipping_priority": _q3_shipping_priority,
        "top_order_per_customer": _top_order_per_customer,
        "region_customer_rollup": _region_customer_rollup,
        "orders_without_lineitem": _orders_without_lineitem,
        "events_daily": _events_daily,
        # G32: gap-based sessionization (lag + running start-flag sum, one
        # shuffle on the key) rolled up to session level
        "events_sessions": _events_sessions,
        # G33: as-of join — latest at-or-before click for every purchase,
        # per user, via the union-and-fill window encoding (no range join)
        "events_last_touch": _events_last_touch,
        # G35: trailing event-time RANGE-frame aggregates (velocity features)
        "events_rolling": _events_rolling,
        # exact per-group quantiles (sort-based percentile; the scale path
        # is approx_percentile, documented in the query docstring)
        "events_quantiles": _events_quantiles,
        # pivot: per-day event-type count matrix (explicit pivot values, so
        # no extra distinct-discovery job)
        "events_pivot": _events_pivot,
        # semi-structured: schema-on-read JSON extraction from the props
        # column (from_json with an explicit schema — JVM-side, no UDF)
        "events_props_stats": _events_props_stats,
        # G38: ordered funnel (view -> click -> purchase), one min-aggregate
        # per step, every stage hashed on the same key
        "events_funnel": _events_funnel,
        # G41: cohort retention matrix (first-active-day cohorts x offsets)
        "events_retention": _events_retention,
        # --- training-data pipeline: text analysis (documents) -------------
        "doc_token_counts": _doc_token_counts,
        "doc_quality": _doc_quality,
        "doc_lang_id": _doc_lang_id,
        "doc_fingerprints": _doc_fingerprints,
        # G28: Gopher-style repetition filters (type-token ratio, top-bigram
        # fraction, duplicate bigram/5-gram occurrence fractions, keep flag)
        "doc_repetition": _doc_repetition,
        # G29: TF-IDF top-terms per document (corpus DF dim broadcast)
        "doc_tfidf_topk": _doc_tfidf_topk,
        # G39: corpus bigram collocations by PMI (phrase mining; two
        # word-count aggs + vocabulary-sized broadcast dims)
        "doc_collocations": _doc_collocations,
        # --- training-data pipeline: dedup ---------------------------------
        "dedup_exact": _dedup_exact,
        "dedup_ngram_jaccard": _dedup_ngram_jaccard,
        "dedup_minhash": _dedup_minhash,  # oracle: SQL replay of the LSH kernel
        "dedup_simhash": _dedup_simhash,  # oracle: exact hamming-ball self-join
        # --- training-data pipeline: similarity search (embeddings) --------
        "ann_topk": _ann_topk,
        "ann_topk_lsh": _ann_topk_lsh,  # oracle: hyperplane-sig SQL replay
        "ann_topk_ivf": _ann_topk_ivf,  # oracle: quantizer SQL replay
        # G27: fold an embedding batch into a persisted IVF index (frozen
        # quantizer, append-only cell assignments); same full-corpus oracle
        # as ann_topk_ivf certifies queries-on-folded-state == full re-index
        "ann_topk_ivf_incr": _ann_topk_ivf_incr,
        "emb_near_dup": _emb_near_dup,
        # G30: SemDeDup-style semantic dedup — literal-quantizer cells,
        # within-cell cosine, one-pass lowest-id keeper rule
        "dedup_semantic": _dedup_semantic,
        # --- training-data pipeline: multimodal plumbing -------------------
        "mm_features": _mm_features,
        "mm_metadata": _mm_metadata,
        "mm_frames": _mm_frames,
        # --- training-data assembly (splits / packing / sketch / hygiene) --
        "doc_splits": _doc_splits,
        # G71: the composed curation pipeline (filters → dedups → splits)
        "doc_curation": _doc_curation,
        # G31: deterministic weighted sampling without replacement (A-ES
        # priorities from the same md5 uniform as doc_splits)
        "doc_sample_weighted": _doc_sample_weighted,
        # G34: fixed-n-per-stratum deterministic sampling (WindowGroupLimit
        # heap per stratum, same md5 uniform family as doc_splits)
        "doc_sample_stratified": _doc_sample_stratified,
        "doc_packing": _doc_packing,
        "doc_redact": _doc_redact,
        # benchmark decontamination: word-8-gram overlap of the train split
        # against the test split (broadcast benchmark-gram probe)
        "doc_decontam": _doc_decontam,
        "dedup_keep_best": _dedup_keep_best,
        "dedup_keep_best_lsh": _dedup_keep_best_lsh,  # LSH buckets as block key
        # G26: fold a document batch into persisted dedup state (bands,
        # grams, quality, clusters); oracle = the SAME full-corpus
        # recursive-CTE SQL as dedup_keep_best_lsh, so the triple-match
        # certifies fold == full re-dedup
        "dedup_keep_best_incr": _dedup_keep_best_incr,
        "er_blocking_metrics": _er_blocking_metrics,
        # G53: meta-blocking — block purging + CBS weights + weighted node
        # pruning over a token-blocking graph (kept AND pruned edges)
        "er_metablocking": _er_metablocking,
        # G54: Fellegi–Sunter agreement-pattern m/u estimation + LLR weights
        # from the labeled candidate pairs (classical record-linkage theory)
        "er_fs_weights": _er_fs_weights,
        # G56: held-out FS evaluation — weights from a deterministic md5
        # half of the labeled pairs, LLR decision scored on the other half
        "er_fs_match_f1": _er_fs_match_f1,
        # G46: frozen-2-iteration IRLS trained scorer, weights + held-in F1
        "er_trained_match_f1": _er_trained_match_f1,
        # G72: phonetic (Soundex-family) blocking, the fourth classic family
        "er_phonetic_pairs": _er_phonetic_pairs,
        "er_phonetic_blocks": _er_phonetic_blocks,
        # G57: sorted-neighborhood blocking — distributed exact global rank
        # + explode/equi-join window pairs (the third classic blocking
        # family next to key blocking and LSH)
        "er_snm_pairs": _er_snm_pairs,
        # G55: corpus-learned domain alias dimension (typo domain -> its
        # most-populous near-spelling), computed on the domain dim only
        "er_domain_aliases": _er_domain_aliases,
        "domain_kmv": _domain_kmv,
    }


# ---------------------------------------------------------------------------
# entity-resolution metric / diff queries
# ---------------------------------------------------------------------------


def _er_match_f1(spark: SparkSession, sf: str) -> DataFrame:
    """One row: (tp, fp, fn, precision, recall, f1) of `score >= 0.90` as a
    predictor of TRUE identity equality over the candidate pairs. Truth comes
    from the labeled table (testdata.truth_labels) — NOT from the engine's
    canonical columns, since the domain-typo variant's identity is not a
    function of its mention string. All float expressions are single
    divisions/products (no sum-order sensitivity), so the DuckDB twin
    reproduces them bit-for-bit."""
    from email_address_parser_spark.sources.testdata import truth_labels

    m = _mentions(spark, sf)
    scored = score_pairs(candidate_pairs(m, hot_threshold=1 << 40))
    uniq = truth_labels(spark, sf)
    j = (
        scored.join(
            uniq.select(F.col("email").alias("email_a"), F.col("match_key").alias("mk_a")),
            "email_a",
        ).join(
            uniq.select(F.col("email").alias("email_b"), F.col("match_key").alias("mk_b")),
            "email_b",
        )
    )
    pred = F.col("score") >= F.lit(0.90)
    truth = F.col("mk_a") == F.col("mk_b")
    agg = j.agg(
        F.sum((pred & truth).cast("long")).alias("tp"),
        F.sum((pred & ~truth).cast("long")).alias("fp"),
        F.sum((~pred & truth).cast("long")).alias("fn"),
    )
    p_raw = F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))
    r_raw = F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))
    return (
        agg.withColumn("_p", p_raw)
        .withColumn("_r", r_raw)
        .select(
            "tp",
            "fp",
            "fn",
            F.round(F.col("_p"), 6).alias("precision"),
            F.round(F.col("_r"), 6).alias("recall"),
            F.round(
                F.when(
                    F.col("_p") + F.col("_r") > 0,
                    F.lit(2.0) * F.col("_p") * F.col("_r") / (F.col("_p") + F.col("_r")),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("f1"),
        )
    )


def _er_threshold_sweep(spark: SparkSession, sf: str) -> DataFrame:
    """Precision/recall/F1 at EVERY candidate threshold in one pass — the
    tuning curve behind er_match_f1's single 0.90 cut (and the report that
    justifies retuning it after the G46 trained scorer or a cap change).

    Scale shape: one groupBy over ~100 score buckets (map-side partial agg
    collapses the 2.8M-pair stream to ≤101 rows before the exchange), then
    cumulative windows over those ≤101 rows — the windows are driver-trivial
    by construction, never a scan of the pair set. Buckets are
    floor(score*100); score is already rounded to 6dp on both engines, so
    the bucket boundary is bit-deterministic and the DuckDB twin replays it
    exactly. tp/fp/fn at threshold t count pairs with score >= t (cumulative
    from the top bucket down); fn is relative to the candidate set's true
    pairs, exactly like er_match_f1."""
    from email_address_parser_spark.sources.testdata import truth_labels
    from pyspark.sql.window import Window

    m = _mentions(spark, sf)
    scored = score_pairs(candidate_pairs(m, hot_threshold=1 << 40))
    uniq = truth_labels(spark, sf)
    j = scored.join(
        uniq.select(F.col("email").alias("email_a"), F.col("match_key").alias("mk_a")),
        "email_a",
    ).join(
        uniq.select(F.col("email").alias("email_b"), F.col("match_key").alias("mk_b")),
        "email_b",
    )
    buckets = j.groupBy(
        F.floor(F.col("score") * F.lit(100)).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("pairs"),
        F.sum((F.col("mk_a") == F.col("mk_b")).cast("long")).alias("true_pairs"),
    )
    # INTENTIONAL unpartitioned windows: only the ≤101-row bucket dim
    # (floor(score*100) ∈ 0..100, collapsed map-side before the exchange —
    # plan-pinned) ever reaches them, so the WindowExec single-partition
    # warning they emit is a non-smell here; a constant partitionBy(lit(0))
    # does NOT silence it (Catalyst folds the literal out of the spec,
    # measured round 5)
    w_desc = Window.orderBy(F.col("bucket").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = buckets.select(
        "bucket",
        "pairs",
        "true_pairs",
        F.sum("pairs").over(w_desc).alias("_cp"),
        F.sum("true_pairs").over(w_desc).alias("_ct"),
        F.sum("true_pairs").over(w_all).alias("_tt"),
    )
    p_raw = F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1)).cast("double")
    r_raw = F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1)).cast("double")
    return (
        cum.select(
            "bucket",
            (F.col("bucket") / F.lit(100.0)).alias("threshold"),
            "pairs",
            "true_pairs",
            F.col("_ct").alias("tp"),
            (F.col("_cp") - F.col("_ct")).alias("fp"),
            (F.col("_tt") - F.col("_ct")).alias("fn"),
        )
        .withColumn("_p", p_raw)
        .withColumn("_r", r_raw)
        .select(
            "bucket",
            "threshold",
            "pairs",
            "true_pairs",
            "tp",
            "fp",
            "fn",
            F.round(F.col("_p"), 6).alias("precision"),
            F.round(F.col("_r"), 6).alias("recall"),
            F.round(
                F.when(
                    F.col("_p") + F.col("_r") > 0,
                    F.lit(2.0) * F.col("_p") * F.col("_r") / (F.col("_p") + F.col("_r")),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("f1"),
        )
    )


def _er_mention_provenance(spark: SparkSession, sf: str) -> DataFrame:
    """Mention provenance over the transcript surface: per (role, tool) cell,
    how many candidate mentions each channel of the conversation produced and
    what fraction parse strict/lax — the data-quality report an operator
    reads to find which producer (user text, assistant text, tool output)
    emits malformed addresses.

    Exercises the input_hint's `role` and `tool` columns end-to-end: they
    ride extract_mentions' `passthrough` through the fused Arrow stage (no
    join back to transcripts), and the groupBy is 3×3-cardinality — a pure
    map-side partial agg, one ~9-row exchange regardless of corpus size."""
    m = extract_mentions(
        derive_transcripts(spark, sf), passthrough=("role", "tool")
    )
    agg = m.groupBy(
        "role", F.coalesce(F.col("tool"), F.lit("none")).alias("tool")
    ).agg(
        F.count(F.lit(1)).alias("n_mentions"),
        F.sum(F.col("valid_strict").cast("long")).alias("n_strict"),
        F.sum(F.col("valid_lax").cast("long")).alias("n_lax"),
        F.countDistinct("email").alias("n_distinct_emails"),
    )
    return agg.withColumn(
        "lax_rate",
        F.round(F.col("n_lax") / F.col("n_mentions").cast("double"), 6),
    )


def _er_block_skew(spark: SparkSession, sf: str) -> DataFrame:
    """Blocking skew-cost report: the top-20 exact-channel blocks by size,
    each with its quadratic pair cost n·(n−1)/2 and share of the total pair
    cost — the diagnostic an operator reads BEFORE setting the salted
    blocking's hot_threshold (blocking.py): the blocks this surfaces are
    exactly the ones salting must split at 10^12 turns.

    Scale shape: one groupBy over |blocks| (map-side partial agg), a
    broadcast of the single-row total, and a TakeOrderedAndProject for the
    top-20 — the block dim is never sorted whole or collected. Integer
    arithmetic uses DIV so DuckDB replays exactly."""
    from email_address_parser_spark.operators.blocking import uniq_valid_mentions

    u = uniq_valid_mentions(_mentions(spark, sf))
    sizes = u.groupBy("domain_canon").agg(F.count(F.lit(1)).alias("n_emails"))
    total = sizes.agg(
        F.coalesce(
            F.sum(F.expr("n_emails * (n_emails - 1) DIV 2")), F.lit(0)
        ).alias("_total_cost")
    )
    return (
        sizes.crossJoin(F.broadcast(total))
        .select(
            F.col("domain_canon").alias("block_key"),
            "n_emails",
            F.expr("n_emails * (n_emails - 1) DIV 2").alias("pair_cost"),
            F.round(
                F.expr("n_emails * (n_emails - 1) DIV 2")
                / F.greatest(F.col("_total_cost"), F.lit(1)),
                6,
            ).alias("cost_share"),
        )
        .orderBy(F.col("n_emails").desc(), "block_key")
        .limit(20)
    )


def _er_entity_activity(spark: SparkSession, sf: str) -> DataFrame:
    """Entity activity timeline: per (resolved cluster, month) mention and
    conversation counts — the longitudinal view of an identity across the
    transcript corpus (when was this entity discussed, and in how many
    threads). Exercises the input_hint's event-time `ts` column end-to-end:
    it rides extract_mentions' `passthrough`, is formatted to a month key
    with a Catalyst date_format, and never crosses the Python boundary.

    Scale shape: mention stream ⋈ cluster assignment is a high-cardinality
    email equi-join; the groupBy keys (cluster_id, month) are high-
    cardinality too, so both exchanges partition evenly. No windows, no
    collect."""
    m = with_canonical(
        extract_mentions(derive_transcripts(spark, sf), passthrough=("ts",))
    )
    clusters = cluster_mentions(
        m, match_edges(score_pairs(candidate_pairs(m, hot_threshold=1 << 40)))
    )
    return (
        m.where(F.col("valid_lax"))
        .select("email", "conv_id", F.date_format("ts", "yyyy-MM").alias("month"))
        .join(clusters, "email")
        .groupBy("cluster_id", "month")
        .agg(
            F.count(F.lit(1)).alias("n_mentions"),
            F.countDistinct("conv_id").alias("n_conversations"),
        )
    )


def _er_metablocking(spark: SparkSession, sf: str) -> DataFrame:
    """G53: meta-blocking (operators/metablocking.py) — token-blocking graph
    with block purging, CBS edge weights, and weighted-node-pruning verdicts.
    The report row set keeps BOTH kept and pruned edges (the operator is the
    audit of what pruning discards, the er_block_skew stance).

    Scale shape: explode → two key-keyed aggregations (purge sizes, CBS
    weights) → two node-keyed joins for the WNP means; every shuffle key is
    high-cardinality and the purge cap bounds the self-join fan-out to
    max_block²/2 rows per key."""
    from email_address_parser_spark.operators.blocking import uniq_valid_mentions
    from email_address_parser_spark.operators.metablocking import metablock_pairs

    return metablock_pairs(uniq_valid_mentions(_mentions(spark, sf)))


def _scored_labeled(spark: SparkSession, sf: str) -> DataFrame:
    """score_pairs output joined to the labeled truth (mk_a / mk_b) — the
    shared input of er_match_f1-style metric queries and the FS estimator."""
    from email_address_parser_spark.sources.testdata import truth_labels

    m = _mentions(spark, sf)
    scored = score_pairs(candidate_pairs(m, hot_threshold=1 << 40))
    t = truth_labels(spark, sf)
    return scored.join(
        t.select(F.col("email").alias("email_a"), F.col("match_key").alias("mk_a")),
        "email_a",
    ).join(
        t.select(F.col("email").alias("email_b"), F.col("match_key").alias("mk_b")),
        "email_b",
    )


def _er_fs_weights(spark: SparkSession, sf: str) -> DataFrame:
    """G54: Fellegi–Sunter m/u probabilities and log-likelihood-ratio weights
    per agreement pattern (operators/fellegi_sunter.py) — the auditable
    learned-weights counterpart of the hand-tuned score and the IRLS
    classifier. One map-side-collapsing aggregation over the labeled pair
    stream (≤16 result rows), totals via a 1-row broadcast aggregate."""
    from email_address_parser_spark.operators.fellegi_sunter import fs_weights

    return fs_weights(_scored_labeled(spark, sf))


def _er_snm_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """G57: sorted-neighborhood candidate pairs (operators/snm.py) — the
    classic sliding-window blocking over a fuzzy sort key, with the global
    rank computed distributed (range partition + per-partition window +
    prefix-summed offsets) and proven equal to the textbook single-node
    row_number by the DuckDB twin."""
    from email_address_parser_spark.operators.blocking import uniq_valid_mentions
    from email_address_parser_spark.operators.snm import snm_pairs

    return snm_pairs(uniq_valid_mentions(_mentions(spark, sf)))


def _er_fs_match_f1(spark: SparkSession, sf: str) -> DataFrame:
    """G56: held-out evaluation of the Fellegi–Sunter decision rule — weights
    estimated on a deterministic md5 half of the labeled pairs, the
    likelihood-ratio test (llr >= 0, unseen patterns abstain to non-match)
    applied to the other half. One metrics row in the er_match_f1 format;
    at sf0.01 the learned rule reproduces the hand-tuned scorer's F1 = 1.0
    on held-out pairs."""
    from email_address_parser_spark.operators.fellegi_sunter import fs_evaluate

    return fs_evaluate(_scored_labeled(spark, sf))


def _er_trained_match_f1(spark: SparkSession, sf: str) -> DataFrame:
    """G46 made driver-visible (round-5 verdict item 6): TWO frozen Newton/
    IRLS iterations of the logistic pair scorer (operators/classifier.py)
    from beta = 0, weights applied at the 0.5-probability threshold, one
    er_match_f1-shaped metrics row PLUS the trained weights themselves —
    so the oracle certifies the training computation, not just the scoring.
    The DuckDB twin replays the whole thing in SQL: each iteration is one
    aggregation (X^T W X / X^T (y - p)) and the 5×5 solve is Cramer's rule
    with generated 120-term determinants (oracles.trained_match_f1_oracle).
    Cross-engine numerics: features quantized to 6 decimals before any sum
    (so engines differ only by addition order, ~1e-15), ridge scaled to the
    row count (1e-4·n — the pair features are collinear enough that a token
    ridge let the solve amplify 1e-15 sum noise to ~1e-5 weight
    disagreement, measured; the scaled ridge floors the eigenvalues and
    bounds the condition number so both engines agree to ~1e-10), weights
    rounded to 4 decimals (+0.0 so -0.0 can't mismatch) before the
    decision pass — at 6 decimals a residual ~1e-10 solve disagreement
    straddled a grid boundary; the 1e-4 grid makes that ~1e-6-probable.
    Unbounded-iteration training stays pytest-certified
    (test_classifier.py, the iterative-op convention)."""
    import numpy as np

    from email_address_parser_spark.operators.classifier import (
        logistic_score,
        logistic_train,
        with_pair_features,
    )

    feats = ["x0", "x1", "x2", "x3"]
    df = (
        with_pair_features(_scored_labeled(spark, sf))
        .select(
            F.round("jw_local", 6).alias("x0"),
            F.round("norm_lev", 6).alias("x1"),
            F.round("norm_dom", 6).alias("x2"),
            F.col("dotless_eq").alias("x3"),
            (F.col("mk_a") == F.col("mk_b")).cast("double").alias("label"),
        )
        # read 3× (two training aggregations + the decision pass) — persist
        # is the checkpoint the production trainer would take anyway
        .persist()
    )
    ridge = 1e-4 * df.count()  # df is persisted; the count doubles as its fill
    beta = np.round(logistic_train(df, features=feats, iters=2, ridge=ridge), 4) + 0.0
    ev = logistic_score(df, beta, features=feats)
    pred = F.col("prob") >= F.lit(0.5)
    truth = F.col("label") == F.lit(1.0)
    # the decision pass is the frame's LAST consumer: evaluate the 1-row
    # aggregate eagerly so the cache can be released before returning
    # (otherwise this would be the one query that leaks a persisted pair
    # frame into the rest of the driver session), and hand back the tiny
    # localized row as the result plan
    agg_row = ev.agg(
        F.sum((pred & truth).cast("long")).alias("tp"),
        F.sum((pred & ~truth).cast("long")).alias("fp"),
        F.sum((~pred & truth).cast("long")).alias("fn"),
    ).collect()[0]
    df.unpersist()
    agg = spark.createDataFrame([agg_row], "tp long, fp long, fn long")
    p_raw = F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))
    r_raw = F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))
    wnames = ["w_jw", "w_lev", "w_dom", "w_dotless", "w_intercept"]
    return (
        agg.withColumn("_p", p_raw)
        .withColumn("_r", r_raw)
        .select(
            *[F.lit(float(beta[k])).alias(wnames[k]) for k in range(5)],
            "tp",
            "fp",
            "fn",
            F.round(F.col("_p"), 6).alias("precision"),
            F.round(F.col("_r"), 6).alias("recall"),
            F.round(
                F.when(
                    F.col("_p") + F.col("_r") > 0,
                    F.lit(2.0) * F.col("_p") * F.col("_r") / (F.col("_p") + F.col("_r")),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("f1"),
        )
    )


def _er_phonetic_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """G72: phonetic (Soundex-family) blocking — the fourth classic
    blocking strategy (operators/phonetic.py): house soundex key over the
    dotless-insensitive local, capped same-key self-join, cross-domain by
    design. The oracle replays the IDENTICAL regexp chain (generated from
    the same _STEPS table) so key parity is by construction.

    On THIS corpus the result is 0 rows, and that is the operator working
    correctly: every synthetic local is phonetically degenerate (all
    `Customer#...` → one C235 block of all 6,240 distinct emails —
    er_phonetic_blocks shows it), and the over-cap purge rightly refuses
    to emit a 19M-pair junk block. Realistic-name behavior (jon/john,
    smith/smyth collide; caps bound blocks) is pinned by
    tests/test_phonetic.py including a corpus-scale Spark↔DuckDB key
    parity check."""
    from email_address_parser_spark.operators.blocking import uniq_valid_mentions
    from email_address_parser_spark.operators.phonetic import phonetic_pairs

    return phonetic_pairs(uniq_valid_mentions(_mentions(spark, sf)))


def _er_phonetic_blocks(spark: SparkSession, sf: str) -> DataFrame:
    """G72 companion audit: the phonetic block census (pkey, n_emails) the
    blocking-quality reviewer reads BEFORE enabling the channel — here it
    shows the single corpus-wide degenerate block that explains
    er_phonetic_pairs' empty (capped) output."""
    from email_address_parser_spark.operators.blocking import uniq_valid_mentions
    from email_address_parser_spark.operators.phonetic import phonetic_key

    uniq = uniq_valid_mentions(_mentions(spark, sf))
    return (
        uniq.select(phonetic_key(F.col("local_canon")).alias("pkey"))
        .where(F.col("pkey") != "")
        .groupBy("pkey")
        .agg(F.count(F.lit(1)).alias("n_emails"))
    )


def _er_domain_aliases(spark: SparkSession, sf: str) -> DataFrame:
    """G55: corpus-learned domain alias map (operators/aliases.py) — typo'd
    domains resolved to their most-populous near-spelling neighbor. The
    whole operator runs on the domain DIMENSION (gram-block join + edit
    confirm), never on mentions; the result is the broadcast-sized alias
    dim an ingest-time canonicalizer would consume."""
    from email_address_parser_spark.operators.aliases import domain_aliases
    from email_address_parser_spark.operators.blocking import uniq_valid_mentions

    return domain_aliases(uniq_valid_mentions(_mentions(spark, sf)))


def _graded_systems(spark: SparkSession, sf: str):
    """The two clusterings every cluster-quality metric grades — shared by
    er_bcubed / er_ari / er_muc so the ablation definition and the
    pipeline knobs cannot drift per-metric: `engine` (the full
    blocking→scoring→CC pipeline) and `exact_canonical` (min email per
    (local_canon, domain_canon) — the string-identity ablation whose
    sub-1 rows quantify the recall the fuzzy + cross-domain channels
    buy), plus the labeled truth (testdata.truth_labels)."""
    from email_address_parser_spark.operators.blocking import uniq_valid_mentions
    from email_address_parser_spark.sources.testdata import truth_labels
    from pyspark.sql.window import Window

    m = _mentions(spark, sf)
    truth = truth_labels(spark, sf)
    engine = cluster_mentions(
        m, match_edges(score_pairs(candidate_pairs(m, hot_threshold=1 << 40)))
    )
    exactc = uniq_valid_mentions(m).select(
        "email",
        F.min("email")
        .over(Window.partitionBy("local_canon", "domain_canon"))
        .alias("cluster_id"),
    )
    return engine, exactc, truth


def _er_bcubed(spark: SparkSession, sf: str) -> DataFrame:
    """B-cubed precision/recall/F1 (operators/evaluation.py) of two
    clusterings against the labeled truth (testdata.truth_labels):

      * `engine` — the full blocking→scoring→CC pipeline. Expected 1.0
        everywhere (the er_clusters triple-match certifies engine ==
        truth clustering, which licenses the oracle's match-key replay).
      * `exact_canonical` — the ablation that stops at exact-canonical
        identity (min email per (local_canon, domain_canon)); its B³
        recall < 1 is exactly the domain-typo recall the fuzzy + cross-
        domain channels buy, now measured per-item instead of pairwise.
    """
    from email_address_parser_spark.operators.evaluation import bcubed

    engine, exactc, truth = _graded_systems(spark, sf)
    return bcubed(engine, truth, label="engine").unionByName(
        bcubed(exactc, truth, label="exact_canonical")
    )


def _er_channel_contribution(spark: SparkSession, sf: str) -> DataFrame:
    """Channel attribution of the accepted match edges (score ≥ 0.90): how
    many edges each candidate channel contributed, and how many of them are
    TRUE matches under the labeled truth — the per-channel recall/precision
    audit an ER operator reads before retuning caps or thresholds.

    No tag is plumbed through the hot blocking path: the four channels
    STRATIFY the pair space by (same/different canonical domain) ×
    (same/different dotless local) — the disjointness invariant pinned in
    tests/test_blocking_channels.py — so an edge's channel is a pure
    function of its feature columns (dom_edit = 0 ⟺ same domain;
    dotless_eq splits the cross-domain channels). Same CASE on both
    engines."""
    from email_address_parser_spark.sources.testdata import truth_labels

    uniq = truth_labels(spark, sf)
    edges = _scored(spark, sf).where(F.col("score") >= 0.90)
    j = (
        edges.join(
            uniq.select(F.col("email").alias("email_a"), F.col("match_key").alias("mk_a")),
            "email_a",
        ).join(
            uniq.select(F.col("email").alias("email_b"), F.col("match_key").alias("mk_b")),
            "email_b",
        )
    )
    channel = (
        F.when(F.col("dom_edit") == 0, F.lit("same_domain"))
        .when(F.col("dotless_eq") == 1.0, F.lit("cross_domain_local"))
        .otherwise(F.lit("cross_domain_lsh"))
    )
    return (
        j.groupBy(channel.alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.sum((F.col("mk_a") == F.col("mk_b")).cast("long")).alias("n_true"),
        )
    )


def _er_comention(spark: SparkSession, sf: str) -> DataFrame:
    """Conversation co-mention affinity edges (operators/comention.py):
    distinct conversations in which both addresses appear, over
    conversations with ≤ 16 distinct addresses — the transcript-structure
    context signal a downstream scorer consumes alongside the string
    features (and the SAME capped per-group quadratic shape as the
    blocking channels, so it holds at 10^12 turns)."""
    from email_address_parser_spark.operators.comention import comention_edges

    return comention_edges(_mentions(spark, sf))


def _er_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """Batch-incremental cluster maintenance (operators/incremental.py):
    cluster the ~80% of conversations whose conv_id hashes below the split
    point with the batch pipeline, then fold the remaining ~20% in with
    `incremental_cluster_update` — which extracts/blocks/scores ONLY pairs
    touching a genuinely new email and re-runs CC only on the affected
    subgraph. The oracle is the FULL-corpus match-key clustering (same SQL
    as er_clusters), so the triple-match certifies incremental == full
    recompute, the operator's contract."""
    from email_address_parser_spark.operators.blocking import uniq_valid_mentions
    from email_address_parser_spark.operators.incremental import (
        incremental_cluster_update,
    )

    t = derive_transcripts(spark, sf)
    is_prev = F.pmod(F.xxhash64("conv_id"), F.lit(5)) < 4
    prev_m = _mentions_of(t.where(is_prev))
    prev_clusters = cluster_mentions(
        prev_m,
        match_edges(score_pairs(candidate_pairs(prev_m, hot_threshold=1 << 40))),
    )
    out = incremental_cluster_update(
        spark,
        t.where(~is_prev),
        prev_clusters,
        uniq_valid_mentions(prev_m),
        hot_threshold=1 << 40,
    )
    return out["clusters"]


def _er_incremental_fold(spark: SparkSession, sf: str) -> DataFrame:
    """v2 of G24 (operators/incremental.py `fold_batch`): bootstrap the fold
    state (uniq + reps + domain_counts + bucket_counts + clusters) from the
    ~80% split, then fold the ~20% batch in. Unlike v1
    (`incremental_cluster_update`), every derived statistic is min-/count-
    merged from state rather than re-aggregated over the corpus dim, and the
    fold's native output is a DELTA of assignments; here we return the full
    updated view so the SAME full-corpus clustering oracle as er_clusters /
    er_incremental certifies fold == from-scratch recompute."""
    from email_address_parser_spark.operators.incremental import (
        build_incremental_state,
        fold_batch,
    )

    t = derive_transcripts(spark, sf)
    is_prev = F.pmod(F.xxhash64("conv_id"), F.lit(5)) < 4
    state = build_incremental_state(spark, t.where(is_prev), hot_threshold=1 << 40)
    out = fold_batch(spark, t.where(~is_prev), state, hot_threshold=1 << 40)
    return out["clusters"].select("email", "cluster_id")


def _mentions_of(transcripts: DataFrame) -> DataFrame:
    return with_canonical(extract_mentions(transcripts))


def _er_threshold_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """G59 cluster-level threshold stability: the CLUSTERING consequences of
    moving the match cut — complement of er_threshold_sweep, which scores
    thresholds at the PAIR level. Transitive closure amplifies threshold
    changes super-linearly (one borderline edge can merge two whole
    identities), so the operating report an ER owner actually reads before
    retuning is this one: clusters / multi-member clusters / max component
    size / edge count at each candidate cut. One scored pass is shared
    (lazily pinned); per threshold the edge set shrinks and the adaptive CC
    (cc.py) solves it — at review thresholds the graph is far below the
    driver bound, so the ladder costs 4 tiny solves, not 4 shuffle loops.
    The oracle replays the full pairs+scoring SQL once and runs ONE
    recursive min-root walk keyed by (threshold, node) — triple-match
    certifies every clustering in the ladder, not just the default cut."""
    m = _mentions(spark, sf)
    scored = score_pairs(
        candidate_pairs(m, hot_threshold=1 << 40)
    ).localCheckpoint(eager=False)
    outs = []
    for t in (0.80, 0.85, 0.90, 0.95):
        edges = match_edges(scored, t)
        sizes = (
            cluster_mentions(m, edges)
            .groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("sz"))
        )
        stats = sizes.agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("sz").cast("long").alias("n_emails"),
            F.sum((F.col("sz") >= 2).cast("long")).alias("n_multi"),
            F.max("sz").alias("max_size"),
        )
        outs.append(
            edges.agg(F.count(F.lit(1)).alias("n_edges"))
            .crossJoin(stats)
            .select(
                F.lit(float(t)).alias("threshold"),
                "n_edges",
                "n_clusters",
                "n_multi",
                "max_size",
                "n_emails",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def _er_constrained_split(spark: SparkSession, sf: str) -> DataFrame:
    """G61 cannot-link repair (operators/repair.py): enforce
    reviewer-declared non-matches by splitting each constrained cluster at
    the minimal edge-score level that separates the pair — the immediate
    consequence of a negative label that G44's annotator surface produces
    (its model-side counterpart being G46 retraining). Scenario here: for
    every cluster of ≥4 members, the reviewer declares its min and max
    member distinct (a shared-mailbox reassignment), so the cluster must
    shed its weakest internal evidence level(s) until the two separate;
    smaller clusters pass through untouched. Whole-level removal keeps the
    rule unique under score ties; the oracle replays the minimal-level
    search with a walk keyed by (cluster, level) and certifies the repaired
    assignment bit-for-bit."""
    from email_address_parser_spark.operators.repair import constrained_split

    m = _mentions(spark, sf)
    scored = score_pairs(
        candidate_pairs(m, hot_threshold=1 << 40)
    ).localCheckpoint(eager=False)
    edges = match_edges(scored)
    clusters = cluster_mentions(m, edges).localCheckpoint(eager=False)
    cons = (
        clusters.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.min("email").alias("email_x"),
            F.max("email").alias("email_y"),
        )
        .where(F.col("_n") >= 4)
        .select("email_x", "email_y")
    )
    return constrained_split(clusters, edges, cons)


def _er_merge_tree(spark: SparkSession, sf: str) -> DataFrame:
    """G60 merge provenance (operators/explain.py): the BFS spanning tree of
    every resolved cluster — per clustered email its hop distance from the
    cluster root, the lexicographically-smallest depth-1 neighbor it joined
    through, and that deciding edge's score. The audit artifact for "why did
    we merge these?": two addresses can share a cluster whose direct pair
    was never even scored, and the weak hop in a big tree is where an
    erroneous merge hides. Deterministic min-parent BFS per bounded cluster
    inside applyInPandas; the oracle replays it with a depth-bounded
    recursive walk + min-depth/min-parent reduction, so the triple-match
    certifies the whole forest."""
    from email_address_parser_spark.operators.explain import cluster_merge_tree

    m = _mentions(spark, sf)
    edges = match_edges(score_pairs(candidate_pairs(m, hot_threshold=1 << 40)))
    return cluster_merge_tree(cluster_mentions(m, edges), edges)


def _er_must_link_merge(spark: SparkSession, sf: str) -> DataFrame:
    """G62 must-link merge (operators/repair.py): enforce reviewer-confirmed
    MATCHES — the positive half of the review loop whose negative half is
    G61 — by transitive closure over the cluster quotient graph. Scenario:
    the reviewer confirms the top-50 near-miss pairs from the G44
    hard-negative band (score in [0.70, 0.90), the annotator's natural work
    queue) as true matches; each confirmation that straddles two clusters
    merges them, relabeled min-email. The oracle replays the quotient walk
    recursively, so the triple-match certifies both the binding rule
    (same-cluster confirmations are no-ops) and the merged labeling."""
    from email_address_parser_spark.operators.repair import must_link_merge

    m = _mentions(spark, sf)
    scored = score_pairs(
        candidate_pairs(m, hot_threshold=1 << 40)
    ).localCheckpoint(eager=False)
    clusters = cluster_mentions(m, match_edges(scored))
    cons = (
        scored.where((F.col("score") >= 0.70) & (F.col("score") < 0.90))
        .orderBy(F.col("score").desc(), "email_a", "email_b")
        .limit(50)
        .select(
            F.col("email_a").alias("email_x"), F.col("email_b").alias("email_y")
        )
    )
    return must_link_merge(clusters, cons)


def _er_best_match_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """G63 best-match (1-NN star) clustering (operators/bestmatch.py): the
    precision-leaning alternative to full transitive closure — every email
    keeps only its single best-scoring candidate ≥ 0.70 (ties → smallest
    neighbor), clusters are components of the kept pseudoforest, min-email
    labels, candidate-less emails singleton. Run next to er_clusters it
    measures how much of the clustering is carried by strongest-evidence
    edges alone; the oracle replays the argmax window and the walk."""
    from email_address_parser_spark.operators.bestmatch import (
        best_match_clusters,
    )

    m = _mentions(spark, sf)
    return best_match_clusters(m, _scored(spark, sf), floor=0.70)


def _er_ari(spark: SparkSession, sf: str) -> DataFrame:
    """G64 Adjusted Rand Index (operators/evaluation.py) of the same two
    clusterings er_bcubed grades — `engine` (full pipeline) and
    `exact_canonical` (ablation) — against the labeled truth. ARI is the
    chance-corrected pair-counting metric: the ablation's sub-1 row is the
    same domain-typo recall gap B³ shows, on the third standard scale.
    All sums are integer-valued doubles (exact), so the triple-match is
    bit-for-bit."""
    from email_address_parser_spark.operators.evaluation import adjusted_rand

    engine, exactc, truth = _graded_systems(spark, sf)
    return adjusted_rand(engine, truth, label="engine").unionByName(
        adjusted_rand(exactc, truth, label="exact_canonical")
    )


def _er_muc(spark: SparkSession, sf: str) -> DataFrame:
    """G65 MUC link-based F1 (operators/evaluation.py) for the same two
    systems as er_bcubed/er_ari — the fourth lens of the metric suite
    (pairwise F1 quadratic, B³ linear, ARI chance-corrected, MUC
    link-minimal). MUC ignores singletons entirely, so the ablation row
    isolates the LINK recall the fuzzy channels buy, undiluted by the
    mass of correctly-singleton addresses. Integer sums → bit-exact."""
    from email_address_parser_spark.operators.evaluation import muc

    engine, exactc, truth = _graded_systems(spark, sf)
    return muc(engine, truth, label="engine").unionByName(
        muc(exactc, truth, label="exact_canonical")
    )


def _er_clustering_compare(spark: SparkSession, sf: str) -> DataFrame:
    """G69 — the closure-strategy scoreboard: B³ precision/recall/F1 for
    every clustering strategy the engine ships, graded against the labeled
    truth on ONE shared scored-pair pass:

      * `engine`            — full transitive closure at the 0.90 cut;
      * `exact_canonical`   — string-identity ablation (no fuzzy channels);
      * `best_match_070`    — 1-NN star closure over floor-0.70 candidates
                              (G63, precision-leaning);
      * `collective_099`    — conservative 0.99 cut + co-mention promotion
                              (G66, relational evidence).

    This is the table an ER operator reads when choosing a closure
    strategy for a new corpus: how much recall the ablation loses, whether
    best-match's precision insurance costs anything here, and whether
    context can replace threshold slack. The oracle rebuilds all four
    partitions in SQL (match-key replay licensed by er_clusters; the
    window ablation; the argmax-walk and promotion-walk replays from
    er_best_match_clusters / er_collective_clusters) and runs the same
    cell decomposition, so the whole scoreboard triple-matches."""
    from email_address_parser_spark.operators.bestmatch import (
        best_match_clusters,
    )
    from email_address_parser_spark.operators.blocking import uniq_valid_mentions
    from email_address_parser_spark.operators.comention import (
        collective_clusters,
    )
    from email_address_parser_spark.operators.evaluation import bcubed
    from email_address_parser_spark.sources.testdata import truth_labels
    from pyspark.sql.window import Window

    m = _mentions(spark, sf)
    scored = score_pairs(
        candidate_pairs(m, hot_threshold=1 << 40)
    ).localCheckpoint(eager=False)
    truth = truth_labels(spark, sf)
    engine = cluster_mentions(m, match_edges(scored))
    exactc = uniq_valid_mentions(m).select(
        "email",
        F.min("email")
        .over(Window.partitionBy("local_canon", "domain_canon"))
        .alias("cluster_id"),
    )
    bm = best_match_clusters(m, scored, floor=0.70)
    coll = collective_clusters(
        m, scored, threshold=0.99, band=(0.90, 0.99), min_convs=1
    )
    return (
        bcubed(engine, truth, label="engine")
        .unionByName(bcubed(exactc, truth, label="exact_canonical"))
        .unionByName(bcubed(bm, truth, label="best_match_070"))
        .unionByName(bcubed(coll, truth, label="collective_099"))
    )


def _er_collective_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """G66 collective entity resolution (operators/comention.py): cluster
    over the accepted string edges UNION the context-promoted near-misses —
    pairs whose string score falls below the cut but whose addresses are
    co-mentioned in the same conversations (the G47 affinity graph as
    relational evidence, Bhattacharya & Getoor's collective-ER family).
    Scenario: at this corpus the default 0.90 cut is already perfect, so
    the demo runs the CONSERVATIVE operator — cut 0.99, promotion band
    [0.90, 0.99), one shared conversation — showing relational evidence
    buying back the recall a stricter cut gives up; at a production
    threshold the same mechanism promotes the [0.70, 0.90) band. The
    oracle replays affinity, promotion, and the walk in full SQL."""
    from email_address_parser_spark.operators.comention import (
        collective_clusters,
    )

    m = _mentions(spark, sf)
    return collective_clusters(
        m,
        _scored(spark, sf),
        threshold=0.99,
        band=(0.90, 0.99),
        min_convs=1,
    )


def _pprl_scored(spark: SparkSession, sf: str) -> DataFrame:
    """Shared G67 chain: field-wise CLK Bloom encodings of every distinct
    valid email (256 bits, 2 md5 hashes, padded bigrams; dotless local and
    canonical domain encoded separately) compared over the candidate pairs
    with the 0.7/0.3 weighted Dice composite."""
    from email_address_parser_spark.operators.blocking import uniq_valid_mentions
    from email_address_parser_spark.operators.pprl import (
        clk_composite_pairs,
        with_dotless,
    )

    m = _mentions(spark, sf)
    uniq = with_dotless(uniq_valid_mentions(m))
    pairs = candidate_pairs(m, hot_threshold=1 << 40).select(
        "email_a", "email_b"
    )
    return clk_composite_pairs(pairs, uniq)


def _er_pprl_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """G67 privacy-preserving record linkage (operators/pprl.py): Schnell
    et al.'s CLK Bloom-filter encodings matched on Dice similarity — the
    comparison consumes only (surrogate → bit positions), never the
    plaintext address. Field-wise filters (dotless local, canonical domain)
    with a 0.7/0.3 composite, because every candidate pair shares most of
    its domain bigrams and a whole-string filter has no discriminating
    power. The oracle replays bigrams, both md5 hash positions, filter
    weights, intersections, and the rounded composite bit-for-bit."""
    return _pprl_scored(spark, sf)


def _er_pprl_match_f1(spark: SparkSession, sf: str) -> DataFrame:
    """G67 quality: (tp, fp, fn, precision, recall, f1) of the CLK
    composite at the fixed 0.975 cut vs the labeled truth — the measured
    privacy tax. On this corpus recall stays 1.0 (every true pair clears
    the cut) and precision pays ≈ 4-9 points vs the plaintext scorer's
    1.0: bigram-set encodings cannot distinguish the near-domain
    collisions plaintext edit distance separates. Same float shapes as
    er_match_f1, so the comparison is bit-exact."""
    from email_address_parser_spark.sources.testdata import truth_labels

    scored = _pprl_scored(spark, sf)
    t = truth_labels(spark, sf)
    j = scored.join(
        t.select(F.col("email").alias("email_a"), F.col("match_key").alias("mk_a")),
        "email_a",
    ).join(
        t.select(F.col("email").alias("email_b"), F.col("match_key").alias("mk_b")),
        "email_b",
    )
    pred = F.col("clk_score") >= F.lit(0.975)
    truth = F.col("mk_a") == F.col("mk_b")
    agg = j.agg(
        F.sum((pred & truth).cast("long")).alias("tp"),
        F.sum((pred & ~truth).cast("long")).alias("fp"),
        F.sum((~pred & truth).cast("long")).alias("fn"),
    )
    p_raw = F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))
    r_raw = F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))
    return (
        agg.withColumn("_p", p_raw)
        .withColumn("_r", r_raw)
        .select(
            "tp",
            "fp",
            "fn",
            F.round(F.col("_p"), 6).alias("precision"),
            F.round(F.col("_r"), 6).alias("recall"),
            F.round(
                F.when(
                    F.col("_p") + F.col("_r") > 0,
                    F.lit(2.0) * F.col("_p") * F.col("_r") / (F.col("_p") + F.col("_r")),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("f1"),
        )
    )


def _er_pprl_blocking_metrics(spark: SparkSession, sf: str) -> DataFrame:
    """G68 privacy-preserving blocking (operators/pprl.py clk_lsh_pairs):
    banded minhash-LSH over the local-field CLK bit positions, so candidate
    generation ALSO runs on encodings (Durham et al.'s Hamming-LSH blocking
    family) — with G67 scoring this closes the loop: nothing in the
    pipeline touches plaintext. Same one-row report as er_blocking_metrics
    (reduction ratio + pair completeness vs the labeled truth); identical
    filters collide in every band, so exact-variant recall is structural —
    measured PC 1.0 with RR ≈ 0.92 at sf0.001."""
    from email_address_parser_spark.operators.blocking import uniq_valid_mentions
    from email_address_parser_spark.operators.pprl import (
        clk_encode,
        clk_lsh_pairs,
        with_dotless,
    )
    from email_address_parser_spark.sources.testdata import truth_labels

    m = _mentions(spark, sf)
    uniqv = with_dotless(uniq_valid_mentions(m))
    uniq = truth_labels(spark, sf)
    cand = clk_lsh_pairs(clk_encode(uniqv, text_col="dotless"))
    n = uniq.agg(F.count(F.lit(1)).alias("n_emails"))
    candm = (
        cand.join(
            uniq.select(F.col("email").alias("email_a"), F.col("match_key").alias("mk_a")),
            "email_a",
        )
        .join(
            uniq.select(F.col("email").alias("email_b"), F.col("match_key").alias("mk_b")),
            "email_b",
        )
        .agg(
            F.count(F.lit(1)).alias("candidate_pairs"),
            F.coalesce(
                F.sum((F.col("mk_a") == F.col("mk_b")).cast("long")),
                F.lit(0).cast("long"),
            ).alias("covered_true_pairs"),
        )
    )
    true_p = (
        uniq.groupBy("match_key")
        .agg(F.count(F.lit(1)).alias("_c"))
        .agg(
            F.coalesce(
                F.sum(F.expr("_c * (_c - 1) DIV 2")), F.lit(0)
            ).alias("true_pairs")
        )
    )
    return (
        n.crossJoin(candm)
        .crossJoin(true_p)
        .select(
            "n_emails",
            F.expr("n_emails * (n_emails - 1) DIV 2").alias("possible_pairs"),
            "candidate_pairs",
            F.round(
                F.lit(1.0)
                - F.col("candidate_pairs")
                / F.greatest(F.expr("n_emails * (n_emails - 1) DIV 2"), F.lit(1)),
                6,
            ).alias("reduction_ratio"),
            "true_pairs",
            "covered_true_pairs",
            F.round(
                F.col("covered_true_pairs") / F.greatest(F.col("true_pairs"), F.lit(1)),
                6,
            ).alias("pair_completeness"),
        )
    )


def _er_pprl_e2e_f1(spark: SparkSession, sf: str) -> DataFrame:
    """G67+G68 end-to-end: the FULLY private pipeline — CLK-LSH blocking
    (G68) feeding the field-wise Dice composite (G67) at the 0.975 cut —
    graded against ALL labeled true pairs, blocking misses included
    (fn = true_pairs − tp, unlike er_pprl_match_f1's candidate-scoped fn).
    The one-row answer to "what does full privacy cost end to end?"."""
    from email_address_parser_spark.operators.blocking import uniq_valid_mentions
    from email_address_parser_spark.operators.pprl import (
        clk_composite_pairs,
        clk_encode,
        clk_lsh_pairs,
        with_dotless,
    )
    from email_address_parser_spark.sources.testdata import truth_labels

    m = _mentions(spark, sf)
    uniqv = with_dotless(uniq_valid_mentions(m))
    t = truth_labels(spark, sf)
    cand = clk_lsh_pairs(clk_encode(uniqv, text_col="dotless"))
    scored = clk_composite_pairs(cand, uniqv)
    j = scored.join(
        t.select(F.col("email").alias("email_a"), F.col("match_key").alias("mk_a")),
        "email_a",
    ).join(
        t.select(F.col("email").alias("email_b"), F.col("match_key").alias("mk_b")),
        "email_b",
    )
    pred = F.col("clk_score") >= F.lit(0.975)
    truth = F.col("mk_a") == F.col("mk_b")
    agg = j.agg(
        F.sum((pred & truth).cast("long")).alias("tp"),
        F.sum((pred & ~truth).cast("long")).alias("fp"),
    )
    true_p = (
        t.groupBy("match_key")
        .agg(F.count(F.lit(1)).alias("_c"))
        .agg(
            F.coalesce(
                F.sum(F.expr("_c * (_c - 1) DIV 2")), F.lit(0)
            ).alias("true_pairs")
        )
    )
    stats = agg.crossJoin(true_p).withColumn(
        "fn", F.col("true_pairs") - F.col("tp")
    )
    p_raw = F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))
    r_raw = F.col("tp") / F.greatest(F.col("true_pairs"), F.lit(1))
    return (
        stats.withColumn("_p", p_raw)
        .withColumn("_r", r_raw)
        .select(
            "tp",
            "fp",
            "fn",
            "true_pairs",
            F.round(F.col("_p"), 6).alias("precision"),
            F.round(F.col("_r"), 6).alias("recall"),
            F.round(
                F.when(
                    F.col("_p") + F.col("_r") > 0,
                    F.lit(2.0) * F.col("_p") * F.col("_r") / (F.col("_p") + F.col("_r")),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("f1"),
        )
    )


def _er_pprl_sweep(spark: SparkSession, sf: str) -> DataFrame:
    """G67 tuning curve: P/R/F1 at every 0.01-wide clk_score bucket in one
    pass — the er_threshold_sweep report for the privacy-preserving scorer,
    the evidence behind the fixed 0.975 cut (the match-composite floor sits
    at 0.9757, so recall is 1.0 down to that bucket and precision decays
    below it). Same map-side bucket collapse: the pair stream reduces to
    ≤101 rows before any window sees it."""
    from email_address_parser_spark.sources.testdata import truth_labels
    from pyspark.sql.window import Window

    scored = _pprl_scored(spark, sf)
    uniq = truth_labels(spark, sf)
    j = scored.join(
        uniq.select(F.col("email").alias("email_a"), F.col("match_key").alias("mk_a")),
        "email_a",
    ).join(
        uniq.select(F.col("email").alias("email_b"), F.col("match_key").alias("mk_b")),
        "email_b",
    )
    buckets = j.groupBy(
        F.floor(F.col("clk_score") * F.lit(100)).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("pairs"),
        F.sum((F.col("mk_a") == F.col("mk_b")).cast("long")).alias("true_pairs"),
    )
    # INTENTIONAL unpartitioned windows: only the ≤101-row bucket dim
    # (floor(score*100) ∈ 0..100, collapsed map-side before the exchange —
    # plan-pinned) ever reaches them, so the WindowExec single-partition
    # warning they emit is a non-smell here; a constant partitionBy(lit(0))
    # does NOT silence it (Catalyst folds the literal out of the spec,
    # measured round 5)
    w_desc = Window.orderBy(F.col("bucket").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = buckets.select(
        "bucket",
        "pairs",
        "true_pairs",
        F.sum("pairs").over(w_desc).alias("_cp"),
        F.sum("true_pairs").over(w_desc).alias("_ct"),
        F.sum("true_pairs").over(w_all).alias("_tt"),
    )
    p_raw = F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1)).cast("double")
    r_raw = F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1)).cast("double")
    return (
        cum.select(
            "bucket",
            (F.col("bucket") / F.lit(100.0)).alias("threshold"),
            "pairs",
            "true_pairs",
            F.col("_ct").alias("tp"),
            (F.col("_cp") - F.col("_ct")).alias("fp"),
            (F.col("_tt") - F.col("_ct")).alias("fn"),
        )
        .withColumn("_p", p_raw)
        .withColumn("_r", r_raw)
        .select(
            "bucket",
            "threshold",
            "pairs",
            "true_pairs",
            "tp",
            "fp",
            "fn",
            F.round(F.col("_p"), 6).alias("precision"),
            F.round(F.col("_r"), 6).alias("recall"),
            F.round(
                F.when(
                    F.col("_p") + F.col("_r") > 0,
                    F.lit(2.0) * F.col("_p") * F.col("_r") / (F.col("_p") + F.col("_r")),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("f1"),
        )
    )


def _er_pprl_anonymity(spark: SparkSession, sf: str) -> DataFrame:
    """G67 audit: the anonymity-class histogram of the CLK filters — how
    many distinct filters are shared by exactly k encoded locals
    (multiplicity, n_filters, n_emails). The PPRL literature's standard
    risk lens: a filter in a k=1 class is uniquely linkable under a
    frequency attack (the attacker aligns filter frequencies with known
    plaintext frequencies), while larger classes form k-anonymity sets.
    Filters are equal iff their position sets are equal, so the oracle
    groups by the sorted position list while Spark groups by the packed
    mask words — same partition of emails, bit-exact counts."""
    from email_address_parser_spark.operators.blocking import uniq_valid_mentions
    from email_address_parser_spark.operators.pprl import (
        clk_encode,
        clk_masks,
        with_dotless,
    )

    m = _mentions(spark, sf)
    uniqv = with_dotless(uniq_valid_mentions(m))
    masks = clk_masks(clk_encode(uniqv, text_col="dotless"))
    classes = masks.groupBy("m0", "m1", "m2", "m3").agg(
        F.count(F.lit(1)).alias("k")
    )
    return (
        classes.groupBy(F.col("k").alias("multiplicity"))
        .agg(
            F.count(F.lit(1)).alias("n_filters"),
            F.sum("k").alias("n_emails"),
        )
    )


def _er_pprl_index_incr(spark: SparkSession, sf: str) -> DataFrame:
    """G70 incremental private-index maintenance (operators/pprl.py
    fold_clk): bootstrap the CLK position index from the ~80% of addresses
    whose email hashes below the split point, then fold the remaining ~20%
    in — only never-seen addresses are encoded (one email-keyed anti-join),
    the append is batch-sized (append-only MoR buckets, pytest pins the
    disk path + re-fold no-op). The oracle is the FULL-corpus encode
    replay, so the triple-match certifies fold == from-scratch re-encode —
    the same equivalence contract as the cluster/dedup/ANN folds."""
    from email_address_parser_spark.operators.blocking import uniq_valid_mentions
    from email_address_parser_spark.operators.pprl import (
        build_clk_state,
        fold_clk,
        with_dotless,
    )

    m = _mentions(spark, sf)
    uniqv = with_dotless(uniq_valid_mentions(m)).localCheckpoint(eager=False)
    is_prev = F.pmod(F.xxhash64("email"), F.lit(5)) != 0
    state = build_clk_state(uniqv.where(is_prev))
    out = fold_clk(uniqv.where(~is_prev), state)
    return out["state"]["clk_pos"]


def _er_forget(spark: SparkSession, sf: str) -> DataFrame:
    """G58 right-to-be-forgotten (operators/forget.py): erase the identity
    (whole resolved cluster) containing a target address from the maintained
    ER state with batch-sized updates — eq-delete ledger for the append-only
    uniq table, all-null tombstones for keyed tables, count decrements from
    the doomed representatives. The target is the min clustered email
    (deterministic, collect-free: it rides a broadcast 1-row aggregate).
    The oracle is the full-corpus clustering SQL minus the target's
    component, so the triple-match certifies that forgetting removes exactly
    the identity's connected component and nothing else — the erasure
    analog of the fold == from-scratch certifications. Disk-path equality
    (MoR append + read_er_state == this in-memory apply) is pinned by
    tests/test_forget.py."""
    from email_address_parser_spark.operators.forget import (
        forget_apply,
        forget_payload,
    )
    from email_address_parser_spark.operators.incremental import (
        build_incremental_state,
    )

    t = derive_transcripts(spark, sf)
    state = build_incremental_state(spark, t, hot_threshold=1 << 40)
    target = state["clusters"].agg(F.min("email").alias("email"))
    after = forget_apply(state, forget_payload(state, target))
    return after["clusters"].select("email", "cluster_id")


def _er_membership_history(spark: SparkSession, sf: str) -> DataFrame:
    """G43 (operators/history.py): SCD2 membership timeline across two
    epochs. Epoch 0 clusters the EVEN turns of every conversation and
    snapshots it; epoch 1 folds the odd turns in with the G24 v2 state fold
    and folds the updated assignments into the history. The turn split (a
    predicate DuckDB replays exactly, unlike xxhash64) is what makes
    closures reachable: identities are conversation-local here, so only a
    split WITHIN conversations lets a later turn introduce a
    lexicographically-smaller variant that relabels an existing cluster
    (1,328 closed rows at sf0.01, all three SCD2 transitions live). The
    oracle rebuilds the SCD2 table from the two slice clusterings directly
    (_ORACLE_HISTORY), so the triple-match certifies snapshot+fold ==
    from-scratch history."""
    from email_address_parser_spark.operators.history import (
        fold_history,
        snapshot_history,
    )
    from email_address_parser_spark.operators.incremental import (
        build_incremental_state,
        fold_batch,
    )

    t = derive_transcripts(spark, sf)
    is_prev = F.col("turn_idx") % 2 == 0
    state = build_incremental_state(spark, t.where(is_prev), hot_threshold=1 << 40)
    h0 = snapshot_history(
        state["clusters"].select("email", "cluster_id"), 0
    )
    out = fold_batch(spark, t.where(~is_prev), state, hot_threshold=1 << 40)
    h1 = fold_history(h0, out["clusters"].select("email", "cluster_id"), 1)
    return h1["history"]


def _er_golden_record_incr(spark: SparkSession, sf: str) -> DataFrame:
    """G42 (operators/incremental_golden.py): bootstrap golden records from
    the ~80% split, fold the ~20% batch — the cluster fold (G24 v2) and the
    survivorship fold compose, recomputing only touched clusters. The oracle
    is the SAME full-corpus survivorship SQL as er_golden_record, so the
    triple-match certifies fold == from-scratch golden records."""
    from email_address_parser_spark.operators.incremental import (
        build_incremental_state,
        fold_batch,
    )
    from email_address_parser_spark.operators.incremental_golden import (
        build_golden_state,
        fold_golden,
    )

    t = derive_transcripts(spark, sf)
    is_prev = F.pmod(F.xxhash64("conv_id"), F.lit(5)) < 4
    state = build_incremental_state(spark, t.where(is_prev), hot_threshold=1 << 40)
    gstate = build_golden_state(_mentions_of(t.where(is_prev)), state["clusters"])
    new_mentions = _mentions_of(t.where(~is_prev))
    out = fold_batch(
        spark, t.where(~is_prev), state,
        hot_threshold=1 << 40, new_mentions=new_mentions,
    )
    gout = fold_golden(
        spark, new_mentions, out["delta"], out["clusters"],
        state["clusters"], gstate,
    )
    return gout["golden"]


def _er_blocking_metrics(spark: SparkSession, sf: str) -> DataFrame:
    """One row: blocking-quality metrics of the candidate generator against
    the generative ground truth (match_key identity) — the standard ER
    literature pair: reduction_ratio (how much of the quadratic pair space
    blocking prunes) and pair_completeness (what fraction of TRUE match
    pairs survive into the candidate set; the recall ceiling of the whole
    pipeline). Truth = the labeled table (see _er_match_f1 — with the
    domain-typo variant, identity is not derivable from the mention string).
    Integer arithmetic uses DIV so DuckDB replays exactly."""
    from email_address_parser_spark.sources.testdata import truth_labels

    uniq = truth_labels(spark, sf)
    n = uniq.agg(F.count(F.lit(1)).alias("n_emails"))
    cand = (
        _pairs(spark, sf)
        .join(
            uniq.select(F.col("email").alias("email_a"), F.col("match_key").alias("mk_a")),
            "email_a",
        )
        .join(
            uniq.select(F.col("email").alias("email_b"), F.col("match_key").alias("mk_b")),
            "email_b",
        )
        .agg(
            F.count(F.lit(1)).alias("candidate_pairs"),
            F.sum((F.col("mk_a") == F.col("mk_b")).cast("long")).alias(
                "covered_true_pairs"
            ),
        )
    )
    true_p = (
        uniq.groupBy("match_key")
        .agg(F.count(F.lit(1)).alias("_c"))
        .agg(
            F.coalesce(
                F.sum(F.expr("_c * (_c - 1) DIV 2")), F.lit(0)
            ).alias("true_pairs")
        )
    )
    return (
        n.crossJoin(cand)
        .crossJoin(true_p)
        .select(
            "n_emails",
            F.expr("n_emails * (n_emails - 1) DIV 2").alias("possible_pairs"),
            "candidate_pairs",
            F.round(
                F.lit(1.0)
                - F.col("candidate_pairs")
                / F.greatest(F.expr("n_emails * (n_emails - 1) DIV 2"), F.lit(1)),
                6,
            ).alias("reduction_ratio"),
            "true_pairs",
            "covered_true_pairs",
            F.round(
                F.col("covered_true_pairs") / F.greatest(F.col("true_pairs"), F.lit(1)),
                6,
            ).alias("pair_completeness"),
        )
    )


def _er_clusters_diff_golden(spark: SparkSession, sf: str) -> DataFrame:
    """F14 set operators as a golden-diff: the engine's clustering vs the
    match_key clustering (min email per key). One row:
    (n_only_engine, n_only_golden, n_common) via exceptAll / exceptAll /
    intersect. All three should be (0, 0, |distinct emails|) — the oracle
    asserts exactly that, so any clustering regression fails the hash gate."""
    m = _mentions(spark, sf)
    engine = cluster_mentions(
        m, match_edges(score_pairs(candidate_pairs(m, hot_threshold=1 << 40)))
    )
    from email_address_parser_spark.sources.testdata import truth_labels

    uniq = truth_labels(spark, sf)
    golden = uniq.join(
        uniq.groupBy("match_key").agg(F.min("email").alias("cluster_id")),
        "match_key",
    ).select("email", "cluster_id")
    only_engine = engine.exceptAll(golden).agg(
        F.count(F.lit(1)).alias("n_only_engine")
    )
    only_golden = golden.exceptAll(engine).agg(
        F.count(F.lit(1)).alias("n_only_golden")
    )
    common = engine.intersect(golden).agg(F.count(F.lit(1)).alias("n_common"))
    return only_engine.crossJoin(only_golden).crossJoin(common)


# ---------------------------------------------------------------------------
# training-data pipeline queries
# ---------------------------------------------------------------------------


def _docs(spark: SparkSession, sf: str) -> DataFrame:
    from email_address_parser_spark.sources.testdata import load_documents

    return load_documents(spark, sf)


def _doc_token_counts(spark: SparkSession, sf: str) -> DataFrame:
    from email_address_parser_spark.functions.text_analysis import with_token_counts

    return with_token_counts(_docs(spark, sf)).select(
        "doc_id", "n_tokens", "n_words", "n_subtokens"
    )


def _doc_quality(spark: SparkSession, sf: str) -> DataFrame:
    from email_address_parser_spark.functions.text_analysis import with_quality

    return with_quality(_docs(spark, sf)).select(
        "doc_id", "n_tokens", "alpha_ratio", "other_ratio", "stop_ratio",
        "avg_token_len", "quality_score",
    )


def _doc_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    from email_address_parser_spark.functions.text_analysis import with_lang_id

    return with_lang_id(_docs(spark, sf)).select(
        "doc_id", "score_en", "score_de", "score_fr", "score_es", "score_zh",
        "lang_pred",
    )


def _doc_fingerprints(spark: SparkSession, sf: str) -> DataFrame:
    from email_address_parser_spark.functions.text_analysis import winnow_fingerprints

    return winnow_fingerprints(_docs(spark, sf))


def _doc_repetition(spark: SparkSession, sf: str) -> DataFrame:
    """G28 (functions/text_analysis.py): Gopher-style repetition filters —
    word-gram type-token ratio, top-bigram occupancy, duplicate bigram/5-gram
    occurrence fractions, and the combined keep flag."""
    from email_address_parser_spark.functions.text_analysis import with_repetition

    return with_repetition(_docs(spark, sf))


def _doc_tfidf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """G29 (operators/ranking.py): smoothed TF-IDF top-5 terms per document;
    the vocabulary-sized DF dim rides a broadcast join."""
    from email_address_parser_spark.operators.ranking import tfidf_topk

    return tfidf_topk(_docs(spark, sf), k=5)


def _dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    from email_address_parser_spark.operators.dedup import exact_dedup

    return exact_dedup(_docs(spark, sf))


def _dedup_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    from email_address_parser_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(spark, sf), threshold=0.05)


def _dedup_minhash(spark: SparkSession, sf: str) -> DataFrame:
    from email_address_parser_spark.operators.dedup import minhash_near_dup

    return minhash_near_dup(_docs(spark, sf), threshold=0.2)


def _dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    from email_address_parser_spark.operators.dedup import simhash_near_dup

    # max_hamming=3: the radius the 4×16 banding is recall-COMPLETE for
    # (pigeonhole), making the result the exact hamming-ball pair set — which
    # is what the full-self-join DuckDB oracle checks. max_bucket is the
    # scale-path guard; 10k is non-binding at test scale (≤5k docs), so the
    # exactness contract holds while the plan keeps the cap operator.
    return simhash_near_dup(_docs(spark, sf), max_hamming=3, max_bucket=10_000)


ANN_QUERY_IDS = list(range(10))


def _ann_topk(spark: SparkSession, sf: str) -> DataFrame:
    from email_address_parser_spark.operators.similarity import brute_force_topk

    return brute_force_topk(
        load_table(spark, sf, "embeddings"), ANN_QUERY_IDS, k=10
    )


def _ann_topk_lsh(spark: SparkSession, sf: str) -> DataFrame:
    from email_address_parser_spark.operators.similarity import lsh_topk

    return lsh_topk(load_table(spark, sf, "embeddings"), ANN_QUERY_IDS, k=10)


def _ann_topk_ivf(spark: SparkSession, sf: str) -> DataFrame:
    from email_address_parser_spark.operators.similarity import ivf_topk

    return ivf_topk(
        load_table(spark, sf, "embeddings"), ANN_QUERY_IDS, k=10,
        n_centroids=16, n_probe=4,
    )


def _ann_topk_ivf_incr(spark: SparkSession, sf: str) -> DataFrame:
    """G27 (operators/incremental_ann.py): bootstrap the IVF index from the
    id-ordered first ~80% of embeddings (the quantizer model predates the
    batch, as in any deployed index), fold the rest in, and query the folded
    state — certified by the SAME full-corpus quantizer-replay SQL as
    ann_topk_ivf."""
    from email_address_parser_spark.operators.incremental_ann import (
        build_ivf_state,
        fold_embeddings,
        ivf_topk_from_state,
    )

    emb = load_table(spark, sf, "embeddings")
    # collect-free 80/20 split: the cut rides a broadcast 1-row aggregate
    # instead of a driver collect (vec_ids are dense, so floor(0.8 * max) is
    # the 80th percentile; the id-ORDERED split matters — the frozen
    # quantizer sample, the n lowest ids, must predate the batch AND equal
    # the full-corpus quantizer the oracle replays)
    bound = F.broadcast(
        emb.agg(F.floor(F.max("vec_id") * 0.8).cast("long").alias("_cut"))
    )
    prev = emb.crossJoin(bound).where(F.col("vec_id") <= F.col("_cut")).drop("_cut")
    batch = emb.crossJoin(bound).where(F.col("vec_id") > F.col("_cut")).drop("_cut")
    state = build_ivf_state(spark, prev, n_centroids=16)
    out = fold_embeddings(spark, batch, state)
    return ivf_topk_from_state(out["state"], ANN_QUERY_IDS, k=10, n_probe=4)


def _emb_near_dup(spark: SparkSession, sf: str) -> DataFrame:
    from email_address_parser_spark.operators.similarity import near_dup_pairs

    return near_dup_pairs(load_table(spark, sf, "embeddings"), threshold=0.4)


def _mm_features(spark: SparkSession, sf: str) -> DataFrame:
    """G12 — REAL image decode: payloads are genuine PNG bytes
    (functions/png.py) and every feature below derives from the decoded
    pixel array. The oracle replays the deterministic pixel LAW in SQL
    (multimodal.py module comment); the byte-true codec round trip
    (tests/test_png.py) certifies decoded == law, so the triple-match
    certifies the whole chain. digest/decode_ok are API extras outside
    the SQL-replayable subset (md5 over raw pixel bytes — DuckDB can't
    build that blob)."""
    from email_address_parser_spark.operators.multimodal import (
        attach_image_payload,
        extract_image_features,
    )

    return extract_image_features(attach_image_payload(_docs(spark, sf))).select(
        "doc_id", "width", "height", "n_pixels", "checksum", "mean_lum",
        "thumb_w", "thumb_h", "thumb_checksum",
    )


def _mm_metadata(spark: SparkSession, sf: str) -> DataFrame:
    from email_address_parser_spark.operators.multimodal import (
        attach_image_payload,
        media_metadata,
    )

    return media_metadata(attach_image_payload(_docs(spark, sf)))


def _mm_frames(spark: SparkSession, sf: str) -> DataFrame:
    from email_address_parser_spark.operators.multimodal import sample_frames

    return sample_frames(_docs(spark, sf), stride=16)


def _dedup_semantic(spark: SparkSession, sf: str) -> DataFrame:
    """G30 (operators/similarity.py): SemDeDup over the embeddings table —
    coarse-quantizer cells (same literal quantizer as ann_topk_ivf), exact
    cosine within a cell, drop rule = has a lower-id in-cell neighbor with
    cosine ≥ 0.3. Threshold chosen for the synthetic embeddings' cosine
    range (max pairwise ≈ 0.51) so the drop set is non-trivial at sf0.01."""
    from email_address_parser_spark.operators.similarity import semantic_dedup
    from email_address_parser_spark.sources.testdata import load_embeddings

    return semantic_dedup(
        load_embeddings(spark, sf), threshold=0.3, n_centroids=16
    )


def _doc_sample_weighted(spark: SparkSession, sf: str) -> DataFrame:
    from email_address_parser_spark.operators.sampling import weighted_sample

    return weighted_sample(_docs(spark, sf), "n_chars", n=100)


def _doc_splits(spark: SparkSession, sf: str) -> DataFrame:
    from email_address_parser_spark.operators.sampling import split_assign

    return split_assign(_docs(spark, sf)).select("doc_id", "u", "split")


def _doc_decontam(spark: SparkSession, sf: str) -> DataFrame:
    """Training-data hygiene: flag train-split documents sharing word
    8-grams with the test split (operators/decontam.py). The benchmark gram
    set rides a broadcast, so the corpus side never shuffles before its one
    groupBy(doc_id)."""
    from email_address_parser_spark.operators.decontam import ngram_decontaminate
    from email_address_parser_spark.operators.sampling import split_assign

    assigned = split_assign(_docs(spark, sf))
    return ngram_decontaminate(
        assigned.where(F.col("split") == "train"),
        assigned.where(F.col("split") == "test"),
    )


def _doc_curation(spark: SparkSession, sf: str) -> DataFrame:
    """G71 (operators/curation.py): the end-to-end curation pipeline as one
    manifest — language gate (en) + Gopher repetition gate + quality floor
    (0.70, ≈ the corpus p10), then exact dedup and keep-best near-dup
    RE-ELECTED over the shrinking survivor set (intersecting the
    standalone stage outputs would resurrect filtered canonicals), then
    the deterministic split hash. The oracle replays the whole chain
    stage-for-stage, so the triple-match certifies the composition, not
    just the pieces."""
    from email_address_parser_spark.operators.curation import curate_corpus

    return curate_corpus(_docs(spark, sf))


def _doc_packing(spark: SparkSession, sf: str) -> DataFrame:
    from email_address_parser_spark.functions.text_analysis import with_token_counts
    from email_address_parser_spark.operators.sampling import pack_sequences

    toks = with_token_counts(_docs(spark, sf)).select("doc_id", "source", "n_tokens")
    # shard_width=128 exercises the hierarchical (multi-shard) path even at
    # sf0.01 (500 docs); bin ids are shard-width-invariant by construction
    return pack_sequences(toks, "n_tokens", budget=2048, shard_width=128)


def _doc_redact(spark: SparkSession, sf: str) -> DataFrame:
    from email_address_parser_spark.functions.redact import redact_pii

    return redact_pii(_docs(spark, sf))


def _dedup_keep_best(spark: SparkSession, sf: str) -> DataFrame:
    from email_address_parser_spark.operators.dedup import dedup_keep_best

    return dedup_keep_best(_docs(spark, sf), threshold=0.6)


def _dedup_keep_best_lsh(spark: SparkSession, sf: str) -> DataFrame:
    from email_address_parser_spark.operators.dedup import dedup_keep_best

    # banded minhash buckets as the block key (no metadata column): the
    # 100 TB-shape of keep-best dedup; threshold matches dedup_minhash so
    # the edge set is the oracle-replayed verified pair set
    return dedup_keep_best(_docs(spark, sf), threshold=0.2, use_lsh=True)


def _dedup_keep_best_incr(spark: SparkSession, sf: str) -> DataFrame:
    """G26 (operators/incremental_dedup.py): bootstrap keep-best dedup state
    from the ~80% of documents whose doc_id hashes low, fold the remaining
    ~20% batch in, and return the full updated view — certified against the
    full-corpus LSH keep-best SQL (same oracle as dedup_keep_best_lsh)."""
    from email_address_parser_spark.operators.incremental_dedup import (
        build_dedup_state,
        fold_docs,
    )

    d = _docs(spark, sf)
    is_prev = F.pmod(F.xxhash64("doc_id"), F.lit(5)) < 4
    state = build_dedup_state(spark, d.where(is_prev), threshold=0.2, max_bucket=64)
    out = fold_docs(spark, d.where(~is_prev), state, threshold=0.2, max_bucket=64)
    return out["clusters"].select(
        F.col("id").alias("doc_id"), "cluster_id", "quality_score", "is_kept"
    )


def _domain_kmv(spark: SparkSession, sf: str) -> DataFrame:
    from email_address_parser_spark.operators.sampling import kmv_sketch

    m = _mentions(spark, sf).where(F.col("valid_lax"))
    return kmv_sketch(m, "domain_canon", "email", k=64)


def _cents(col) -> F.Column:
    return F.floor(col * F.lit(10000)).cast("long")


def _q1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate with map-side partial agg."""
    li = load_table(spark, sf, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _sum_cents(F.col("l_quantity")).alias("sum_qty_e4"),
            _sum_cents(F.col("l_extendedprice")).alias("sum_base_price_e4"),
            _sum_cents(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            ).alias("sum_disc_price_e4"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _sum_cents(col) -> F.Column:
    return F.sum(_cents(col)).cast("long")


def _q3_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + top-k (broadcast of the small dims)."""
    cust = load_table(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf, "orders").where(F.col("o_orderdate") < F.lit("1998-03-15"))
    li = load_table(spark, sf, "lineitem").where(F.col("l_shipdate") > F.lit("1998-03-15"))
    return (
        li.join(F.broadcast(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_sum_cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("revenue_e4"))
        .orderBy(F.desc("revenue_e4"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
            "revenue_e4",
        )
    )


def _top_order_per_customer(spark: SparkSession, sf: str) -> DataFrame:
    """Window operator (F13): highest-value order per customer."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            F.col("o_orderkey").alias("top_orderkey"),
            _cents(F.col("o_totalprice")).alias("top_totalprice_e4"),
        )
    )


def _region_customer_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Star join rollup (broadcast dims): customers + balance cents per region."""
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _sum_cents(F.col("c_acctbal")).alias("sum_acctbal_e4"),
        )
    )


def _orders_without_lineitem(spark: SparkSession, sf: str) -> DataFrame:
    """Anti-join / set-difference operator (F14)."""
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_orders_without_lineitem"))
    )


def _events_daily(spark: SparkSession, sf: str) -> DataFrame:
    """Event-stream style rollup: per (event_type, day) counts + value cents."""
    ev = load_table(spark, sf, "events")
    return ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        _sum_cents(F.col("value")).alias("sum_value_e4"),
    )


def _events_sessions(spark: SparkSession, sf: str) -> DataFrame:
    """G32 (operators/sessions.py): gap-based sessionization of the events
    table per user (gap = 12 h, chosen so the synthetic ~2 events/user/day
    stream yields real multi-event sessions), rolled up to one row per
    session. All timestamp math in integer microseconds so the oracle
    replays it bit-exactly."""
    from email_address_parser_spark.operators.sessions import session_stats

    return session_stats(load_table(spark, sf, "events"), gap_s=12 * 3600)


def _events_last_touch(spark: SparkSession, sf: str) -> DataFrame:
    """G33 (operators/asof.py): for every purchase event, the user's most
    recent click at or before it — last-touch attribution via the
    union-and-fill as-of join (one shuffle, no range-join blow-up)."""
    from email_address_parser_spark.operators.asof import asof_join

    ev = load_table(spark, sf, "events")
    out = asof_join(
        ev.where(F.col("event_type") == "purchase"),
        ev.where(F.col("event_type") == "click"),
        on="user_id",
        ts_col="ts",
        right_id="event_id",
        value_cols=("event_id", "ts"),
    )
    from email_address_parser_spark.operators.sessions import _ts_micros

    ts_us = _ts_micros(F.col("ts"))
    asof_us = _ts_micros(F.col("asof_ts"))
    return out.select(
        "event_id",
        "user_id",
        ts_us.alias("ts_us"),
        F.col("asof_event_id"),
        asof_us.alias("asof_ts_us"),
        F.round((ts_us - asof_us) / F.lit(1e6), 6).alias("gap_s"),
    )


def _events_rolling(spark: SparkSession, sf: str) -> DataFrame:
    """G35 (operators/rolling.py): per event, count + value sum over the
    user's trailing 7 days — RANGE frame on epoch_us, one shuffle."""
    from email_address_parser_spark.operators.rolling import rolling_agg

    return rolling_agg(load_table(spark, sf, "events"), window_s=7 * 86400).select(
        "event_id", "user_id", "ts_us", "n_trailing", "sum_value_e4_trailing"
    )


def _events_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """Exact per-event-type value quantiles (linear-interpolation
    percentile, the SQL-standard definition both engines share). Exact
    percentile is a per-group sort — fine for a bounded group count; at
    100 TB swap F.percentile for F.approx_percentile (t-digest, mergeable,
    no sort) and accept the documented error bound."""
    ev = load_table(spark, sf, "events")
    pct = F.percentile(F.col("value"), F.lit([0.5, 0.9, 0.99]))
    return ev.groupBy("event_type").agg(
        F.round(pct[0], 6).alias("p50"),
        F.round(pct[1], 6).alias("p90"),
        F.round(pct[2], 6).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def _events_pivot(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot: per-day event-type count matrix. Values are listed explicitly
    so Catalyst skips the distinct-discovery job and plans ONE aggregation
    (pivot_first), not a shuffle per column."""
    ev = load_table(spark, sf, "events")
    out = (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .pivot("event_type", list(_PIVOT_TYPES))
        .count()
    )
    return out.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in _PIVOT_TYPES]
    )


def _events_props_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Schema-on-read over the semi-structured `props` JSON column:
    `from_json` with an explicit schema stays JVM-side (a Jackson parse per
    row inside codegen — no Python), and at 100 TB the explicit schema is
    what lets the parser skip unused keys. Rollup: count + value cents per
    extracted k."""
    ev = load_table(spark, sf, "events")
    k = F.from_json(F.col("props"), "k INT")["k"]
    return (
        ev.select(k.alias("k"), "value")
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _sum_cents(F.col("value")).alias("sum_value_e4"),
        )
    )


def _doc_sample_stratified(spark: SparkSession, sf: str) -> DataFrame:
    """G34 (operators/sampling.py): exactly 10 docs from each of the 20
    sources, deterministic md5 draw, per-stratum heap (WindowGroupLimit)."""
    from email_address_parser_spark.operators.sampling import stratified_sample

    return stratified_sample(
        _docs(spark, sf), strata_col="source", n_per_stratum=10
    )


def _events_retention(spark: SparkSession, sf: str) -> DataFrame:
    """G41: cohort retention matrix — users bucketed by first-active day,
    distinct-user counts at each day offset. Two aggregations + one join,
    all keyed on user_id (exchange reuse); the output is
    cohorts × offsets, tiny at any corpus scale."""
    ev = load_table(spark, sf, "events")
    act = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    coh = act.groupBy("user_id").agg(F.min("day").alias("cday"))
    return (
        act.join(coh, "user_id")
        .groupBy(
            F.date_format("cday", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("day", "cday").cast("int").alias("offset_days"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


def _er_cluster_density(spark: SparkSession, sf: str) -> DataFrame:
    """F12 diagnostics: per-cluster cohesion — member count, confirmed match
    edges, edge density vs the complete graph, mean/min edge score. The ER
    quality dashboard a steward reads to find under- and over-merged
    clusters. Edges attribute to their src endpoint's cluster (src and dst
    always co-cluster by construction: the edges DEFINE the clusters)."""
    m = _mentions(spark, sf)
    scored = score_pairs(candidate_pairs(m, hot_threshold=1 << 40))
    # edges feed BOTH the clustering and the per-cluster edge stats; pin the
    # (pair-scoring-sized) subtree so it runs once (tfidf_topk pattern)
    edges = match_edges(scored).localCheckpoint(eager=False)
    clusters = cluster_mentions(m, edges).localCheckpoint(eager=False)
    memb = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    eagg = (
        edges.join(
            clusters.withColumnRenamed("email", "src"), "src"
        )
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.round(F.avg("score"), 6).alias("avg_score"),
            F.min("score").alias("min_score"),
        )
    )
    possible = (F.col("n_members") * (F.col("n_members") - 1) / F.lit(2.0))
    return (
        memb.join(eagg, "cluster_id", "left")
        .select(
            "cluster_id",
            "n_members",
            F.coalesce(F.col("n_edges"), F.lit(0)).alias("n_edges"),
            F.when(
                F.col("n_members") > 1,
                F.round(F.coalesce(F.col("n_edges"), F.lit(0)) / possible, 6),
            ).alias("density"),
            "avg_score",
            "min_score",
        )
    )


def _events_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """G38 (operators/funnel.py): ordered view→click→purchase funnel per
    user — step k is the earliest event of its type strictly after step
    k-1. All stages hash on user_id; micros-long timestamps."""
    from email_address_parser_spark.operators.funnel import funnel

    return funnel(load_table(spark, sf, "events"))


def _doc_collocations(spark: SparkSession, sf: str) -> DataFrame:
    """G39 (operators/ranking.py): global top-100 bigram collocations by
    PMI with min_count=5 — word-count aggs + broadcast unigram dims."""
    from email_address_parser_spark.operators.ranking import collocations_topk

    return collocations_topk(_docs(spark, sf), k=100, min_count=5)


def _er_golden_record(spark: SparkSession, sf: str) -> DataFrame:
    """G40 (operators/survivorship.py): golden record per cluster —
    counts + mention-weighted mode survivorship of domain_canon."""
    from email_address_parser_spark.operators.survivorship import golden_records

    m = _mentions(spark, sf)
    clusters = cluster_mentions(
        m, match_edges(score_pairs(candidate_pairs(m, hot_threshold=1 << 40)))
    )
    return golden_records(m, clusters)


# ---------------------------------------------------------------------------
# oracles (DuckDB SQL over the same parquet views)
# ---------------------------------------------------------------------------

# Candidate replay: channel 1 (unsalted exact-domain — channel 2 is empty by
# construction when nothing is salted, pinned by test_unsalted_lsh_adds_nothing)
# UNION ALL channel 3 (cross-domain exact dotless local, block-capped)
# UNION ALL channel 4 (cross-domain cross-local full-email minhash LSH replay,
# bucket-capped; oracles.email_lsh_pairs_cte re-computes the fixed-seed
# signatures in pure SQL). Channels are disjoint (blocking.py docstring), so
# UNION ALL introduces no duplicates.
_ORACLE_PAIRS = MENTIONS_EXPECTED_CTE + """,
uniq AS (
    SELECT DISTINCT email, local_canon, domain_canon, match_key,
           replace(local_canon, '.', '') AS dotless,
           concat(local_canon, '@', domain_canon) AS canon_email
    FROM mentions_expected WHERE valid_lax
),
local_sizes AS (SELECT dotless, count(*) AS ln FROM uniq GROUP BY dotless),
""" + _oracles.email_lsh_pairs_cte(max_bucket=50) + """,
pairs AS (
    SELECT a.email AS email_a, b.email AS email_b,
           a.local_canon AS local_canon_a, b.local_canon AS local_canon_b,
           a.domain_canon AS domain_canon_a, b.domain_canon AS domain_canon_b,
           a.match_key AS mk_a, b.match_key AS mk_b
    FROM uniq a JOIN uniq b
      ON a.domain_canon = b.domain_canon AND a.email < b.email
    UNION ALL
    SELECT a.email, b.email, a.local_canon, b.local_canon,
           a.domain_canon, b.domain_canon, a.match_key, b.match_key
    FROM uniq a
    JOIN uniq b ON a.dotless = b.dotless
       AND a.domain_canon <> b.domain_canon AND a.email < b.email
    JOIN local_sizes ls ON ls.dotless = a.dotless
    WHERE ls.ln <= 50
    UNION ALL
    SELECT x.email_a, x.email_b, a.local_canon, b.local_canon,
           a.domain_canon, b.domain_canon, a.match_key, b.match_key
    FROM xd_lsh x
    JOIN uniq a ON a.email = x.email_a
    JOIN uniq b ON b.email = x.email_b
),
features AS (
    SELECT email_a, email_b, mk_a, mk_b,
        -- jw/lev over the DOTLESS locals (scoring.score_pairs: dot placement
        -- is canonically insignificant, so it never spends edit budget)
        jaro_winkler_similarity(replace(local_canon_a, '.', ''),
                                replace(local_canon_b, '.', '')) AS jw_local,
        CAST(levenshtein(replace(local_canon_a, '.', ''),
                         replace(local_canon_b, '.', '')) AS INT) AS lev_local,
        CAST(levenshtein(domain_canon_a, domain_canon_b) AS INT) AS dom_edit,
        CASE WHEN replace(local_canon_a, '.', '') = replace(local_canon_b, '.', '')
             THEN 1.0 ELSE 0.0 END AS dotless_eq,
        greatest(length(replace(local_canon_a, '.', '')),
                 length(replace(local_canon_b, '.', '')), 1) AS _mll,
        greatest(length(domain_canon_a), length(domain_canon_b), 1) AS _mdl
    FROM pairs
),
scored AS (
    SELECT email_a, email_b, mk_a, mk_b, jw_local, lev_local, dom_edit, dotless_eq,
        round(0.35 * jw_local + 0.20 * (1.0 - lev_local / _mll)
              + 0.25 * (1.0 - dom_edit / _mdl) + 0.20 * dotless_eq, 6) AS score
    FROM features
)
"""

# shared replay CTE chunks (assume the _ORACLE_PAIRS layout: uniq, scored)
_BM_CTES = """bm_above AS (
            SELECT email_a, email_b, score FROM scored WHERE score >= 0.70
        ),
        bm_sym AS (
            SELECT email_a AS node, email_b AS nbr, score FROM bm_above
            UNION ALL
            SELECT email_b, email_a, score FROM bm_above
        ),
        bm_best AS (
            SELECT node AS a, nbr AS b FROM (
                SELECT node, nbr, row_number() OVER (
                    PARTITION BY node ORDER BY score DESC, nbr ASC
                ) AS rn
                FROM bm_sym
            ) WHERE rn = 1
        ),
        bm_und AS (SELECT a, b FROM bm_best UNION SELECT b, a FROM bm_best),
        bm_walk(node, root) AS (
            SELECT email, email FROM uniq
            UNION
            SELECT s.b, w.root
            FROM bm_walk w JOIN bm_und s ON s.a = w.node
        )"""

_CX_CTES = """cx_ce AS (
            SELECT DISTINCT conv_id, email
            FROM mentions_expected WHERE valid_lax
        ),
        cx_small AS (
            SELECT conv_id FROM cx_ce GROUP BY conv_id HAVING count(*) <= 16
        ),
        cx_kept AS (
            SELECT c.conv_id, c.email FROM cx_ce c JOIN cx_small USING (conv_id)
        ),
        cx_aff AS (
            SELECT a.email AS email_a, b.email AS email_b,
                   CAST(count(*) AS BIGINT) AS n_convs
            FROM cx_kept a
            JOIN cx_kept b ON a.conv_id = b.conv_id AND a.email < b.email
            GROUP BY a.email, b.email
        ),
        cx_promoted AS (
            SELECT s.email_a AS a, s.email_b AS b
            FROM scored s
            JOIN cx_aff f
              ON f.email_a = s.email_a AND f.email_b = s.email_b
            WHERE s.score >= 0.90 AND s.score < 0.99 AND f.n_convs >= 1
        ),
        cx_edges AS (
            SELECT email_a AS a, email_b AS b FROM scored WHERE score >= 0.99
            UNION ALL SELECT a, b FROM cx_promoted
        ),
        cx_sym AS (SELECT a, b FROM cx_edges UNION SELECT b, a FROM cx_edges),
        cx_walk(node, root) AS (
            SELECT email, email FROM uniq
            UNION
            SELECT s.b, w.root
            FROM cx_walk w JOIN cx_sym s ON s.a = w.node
        )"""


_ORACLE_CLUSTERS = MENTIONS_EXPECTED_CTE + """,
uniq AS (
    SELECT DISTINCT email, match_key FROM mentions_expected WHERE valid_lax
),
clusters AS (
    SELECT email, min(email) OVER (PARTITION BY match_key) AS cluster_id FROM uniq
)
"""


# G43 SCD2 replay: rebuild the membership history from the two slice
# clusterings directly (epoch 0 = even turns, epoch 1 = full corpus).
# Corpus growth never removes an email,
# so every epoch-0 email exists at epoch 1 (inner join is total) and the
# history is: epoch-0 rows closed iff the assignment changed, plus open
# epoch-1 rows for changed/new emails.
_ORACLE_HISTORY = MENTIONS_EXPECTED_CTE + """,
uniq0 AS (
    SELECT DISTINCT email, match_key FROM mentions_expected
    WHERE valid_lax AND turn_idx % 2 = 0
),
c0 AS (
    SELECT email, min(email) OVER (PARTITION BY match_key) AS cid FROM uniq0
),
uniq1 AS (
    SELECT DISTINCT email, match_key FROM mentions_expected WHERE valid_lax
),
c1 AS (
    SELECT email, min(email) OVER (PARTITION BY match_key) AS cid FROM uniq1
)
SELECT email, cluster_id, valid_from, valid_to, is_current FROM (
    SELECT c0.email, c0.cid AS cluster_id, CAST(0 AS BIGINT) AS valid_from,
        CASE WHEN c1.cid <> c0.cid THEN CAST(1 AS BIGINT) END AS valid_to,
        (c1.cid = c0.cid) AS is_current
    FROM c0 JOIN c1 USING (email)
    UNION ALL
    SELECT c1.email, c1.cid AS cluster_id, CAST(1 AS BIGINT) AS valid_from,
        CAST(NULL AS BIGINT) AS valid_to, TRUE AS is_current
    FROM c1 LEFT JOIN c0 USING (email)
    WHERE c0.cid IS NULL OR c0.cid <> c1.cid
)
"""


def _funnel_oracle() -> str:
    from email_address_parser_spark.operators.funnel import funnel_oracle

    return funnel_oracle()


# G40 survivorship replay over the ground-truth clusters (equality of the
# engine's clustering with these is separately pinned by er_clusters)
_ORACLE_GOLDEN = _ORACLE_CLUSTERS + """,
gm AS (
    SELECT c.cluster_id, me.email, me.conv_id, me.domain_canon
    FROM mentions_expected me JOIN clusters c USING (email)
    WHERE me.valid_lax
),
gbase AS (
    SELECT cluster_id,
        CAST(count(DISTINCT email) AS BIGINT) AS n_members,
        CAST(count(*) AS BIGINT) AS n_mentions,
        CAST(count(DISTINCT conv_id) AS BIGINT) AS n_conversations
    FROM gm GROUP BY 1
),
gdom AS (
    SELECT cluster_id, domain_canon, count(*) AS cnt FROM gm GROUP BY 1, 2
),
gtop AS (
    SELECT cluster_id, domain_canon AS top_domain,
        CAST(cnt AS BIGINT) AS top_domain_mentions
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY cluster_id ORDER BY cnt DESC, domain_canon ASC) AS rn
        FROM gdom
    ) WHERE rn = 1
)
SELECT b.cluster_id, b.n_members, b.n_mentions, b.n_conversations,
    t.top_domain, t.top_domain_mentions
FROM gbase b JOIN gtop t USING (cluster_id)
"""


def _redact_oracle() -> str:
    from email_address_parser_spark.functions.redact import (
        EMAIL_TOKEN_RE,
        IPV4_RE,
        PHONE_RE,
    )

    return _oracles.doc_redact_oracle(EMAIL_TOKEN_RE, IPV4_RE, PHONE_RE)


def _phonetic_key_cte() -> str:
    """Shared prefix of the two G72 oracles: distinct locals → house
    phonetic key (generated from phonetic._STEPS — one source of truth)."""
    from email_address_parser_spark.operators.phonetic import phonetic_key_sql

    return (
        MENTIONS_EXPECTED_CTE
        + f""",
        pu AS (
            SELECT DISTINCT email, local_canon
            FROM mentions_expected WHERE valid_lax
        ),
        pk AS (
            SELECT email, {phonetic_key_sql('local_canon')} AS pkey FROM pu
        )"""
    )


def _phonetic_pairs_oracle(max_block: int = 50) -> str:
    # max_block must track phonetic_pairs' default (the Spark query uses it)
    return (
        _phonetic_key_cte()
        + f""",
        pkx AS (SELECT * FROM pk WHERE pkey <> ''),
        psz AS (SELECT pkey, count(*) AS n FROM pkx GROUP BY pkey),
        pbd AS (
            SELECT pkx.* FROM pkx JOIN psz USING (pkey)
            WHERE n <= {max_block}
        )
        SELECT a.email AS email_a, b.email AS email_b, a.pkey AS pkey
        FROM pbd a JOIN pbd b ON a.pkey = b.pkey AND a.email < b.email"""
    )


def _phonetic_blocks_oracle() -> str:
    return (
        _phonetic_key_cte()
        + """
        SELECT pkey, CAST(count(*) AS BIGINT) AS n_emails
        FROM pk WHERE pkey <> '' GROUP BY pkey"""
    )


def _oracle_sql_impl() -> dict[str, str]:
    return {
        "er_mentions": MENTIONS_EXPECTED_CTE
        + "SELECT conv_id, turn_idx, mention_idx, raw, local_part, domain,"
        "  valid_strict, valid_lax, email FROM mentions_expected",
        "er_mentions_by_domain": MENTIONS_EXPECTED_CTE
        + """SELECT domain_canon,
                CAST(count(*) AS BIGINT) AS n_mentions,
                CAST(count(DISTINCT email) AS BIGINT) AS n_distinct_emails
             FROM mentions_expected WHERE valid_lax GROUP BY domain_canon""",
        "er_candidate_pairs": _ORACLE_PAIRS + "SELECT email_a, email_b FROM pairs",
        "er_pair_features": _ORACLE_PAIRS
        + "SELECT email_a, email_b, jw_local, lev_local, dom_edit, dotless_eq, score FROM scored",
        "er_hard_negatives": _ORACLE_PAIRS
        + "SELECT email_a, email_b, jw_local, lev_local, score FROM scored "
        + "WHERE score >= 0.70 AND score < 0.90 "
        + "ORDER BY score DESC, email_a, email_b LIMIT 500",
        "er_edges": _ORACLE_PAIRS
        + """SELECT email_a AS src, email_b AS dst, score FROM scored
             WHERE score >= 0.90""",
        "er_roundtrip": MENTIONS_EXPECTED_CTE
        + """SELECT conv_id, turn_idx, mention_idx,
                concat(local_part, '@', domain) = raw AS display_roundtrip,
                email = raw AS email_eq_raw
             FROM mentions_expected WHERE valid_lax""",
        "er_clusters": _ORACLE_CLUSTERS + "SELECT email, cluster_id FROM clusters",
        # incremental == full recompute: the oracle IS the full-corpus clustering
        "er_incremental": _ORACLE_CLUSTERS + "SELECT email, cluster_id FROM clusters",
        "er_incremental_fold": _ORACLE_CLUSTERS
        + "SELECT email, cluster_id FROM clusters",
        # erasure == exactly the target's component removed, nothing else
        "er_forget": _ORACLE_CLUSTERS
        + """
        SELECT email, cluster_id FROM clusters
        WHERE cluster_id <> (SELECT min(email) FROM uniq)""",
        # minimal-level split replayed with a walk keyed by (cluster, level):
        # cut = the smallest in-cluster score level whose >-filtered edge set
        # separates the constraint pair; repaired labels = min-root
        # components at that level
        "er_constrained_split": _ORACLE_PAIRS.replace(
            "\nWITH ", "\nWITH RECURSIVE ", 1
        )
        + """,
        cs_clusters AS (
            SELECT email, min(email) OVER (PARTITION BY match_key)
                AS cluster_id
            FROM uniq
        ),
        cs_doomed AS (
            SELECT cluster_id, min(email) AS x, max(email) AS y
            FROM cs_clusters GROUP BY cluster_id HAVING count(*) >= 4
        ),
        cs_e AS (
            SELECT c.cluster_id, s.email_a AS a, s.email_b AS b, s.score
            FROM (SELECT DISTINCT email_a, email_b, score FROM scored
                  WHERE score >= 0.90) s
            JOIN cs_clusters c ON c.email = s.email_a
            JOIN cs_doomed d ON d.cluster_id = c.cluster_id
        ),
        cs_lv AS (
            SELECT DISTINCT cluster_id, score AS level FROM cs_e
        ),
        cs_sym AS (
            SELECT cluster_id, a, b, score FROM cs_e
            UNION ALL SELECT cluster_id, b, a, score FROM cs_e
        ),
        cs_members AS (
            SELECT DISTINCT cluster_id, a AS node FROM cs_sym
        ),
        cs_walk(cluster_id, level, node, root) AS (
            SELECT m.cluster_id, l.level, m.node, m.node
            FROM cs_members m JOIN cs_lv l USING (cluster_id)
            UNION
            SELECT w.cluster_id, w.level, s.b, w.root
            FROM cs_walk w
            JOIN cs_sym s ON s.cluster_id = w.cluster_id
                AND s.a = w.node AND s.score > w.level
        ),
        cs_comp AS (
            SELECT cluster_id, level, node, min(root) AS comp
            FROM cs_walk GROUP BY 1, 2, 3
        ),
        cs_cut AS (
            SELECT c.cluster_id, min(c.level) AS cut
            FROM (
                SELECT cx.cluster_id, cx.level
                FROM cs_comp cx
                JOIN cs_doomed d ON d.cluster_id = cx.cluster_id
                    AND d.x = cx.node
                JOIN cs_comp cy ON cy.cluster_id = cx.cluster_id
                    AND cy.level = cx.level AND cy.node = d.y
                WHERE cx.comp <> cy.comp
            ) c GROUP BY 1
        ),
        cs_repaired AS (
            SELECT p.node AS email, p.comp AS cluster_id
            FROM cs_comp p JOIN cs_cut k
                ON k.cluster_id = p.cluster_id AND k.cut = p.level
        )
        SELECT email, cluster_id FROM cs_repaired
        UNION ALL
        SELECT c.email, c.cluster_id FROM cs_clusters c
        LEFT JOIN cs_doomed d USING (cluster_id)
        WHERE d.cluster_id IS NULL""",
        # must-link merge replayed at the cluster-quotient level: top-50
        # near-miss confirmations → binding (cross-cluster) constraints →
        # recursive walk over the quotient graph → min-label remap
        "er_must_link_merge": _ORACLE_PAIRS.replace(
            "\nWITH ", "\nWITH RECURSIVE ", 1
        )
        + """,
        ml_clusters AS (
            SELECT email, min(email) OVER (PARTITION BY match_key)
                AS cluster_id
            FROM uniq
        ),
        ml_cons AS (
            SELECT email_a AS x, email_b AS y FROM scored
            WHERE score >= 0.70 AND score < 0.90
            ORDER BY score DESC, email_a, email_b LIMIT 50
        ),
        ml_q AS (
            SELECT DISTINCT cx.cluster_id AS a, cy.cluster_id AS b
            FROM ml_cons c
            JOIN ml_clusters cx ON cx.email = c.x
            JOIN ml_clusters cy ON cy.email = c.y
            WHERE cx.cluster_id <> cy.cluster_id
        ),
        ml_sym AS (SELECT a, b FROM ml_q UNION SELECT b, a FROM ml_q),
        ml_nodes AS (SELECT DISTINCT a AS n FROM ml_sym),
        ml_walk(node, root) AS (
            SELECT n, n FROM ml_nodes
            UNION
            SELECT s.b, w.root
            FROM ml_walk w JOIN ml_sym s ON s.a = w.node
        ),
        ml_remap AS (
            SELECT node AS cluster_id, min(root) AS merged
            FROM ml_walk GROUP BY node
        )
        SELECT c.email, coalesce(r.merged, c.cluster_id) AS cluster_id
        FROM ml_clusters c LEFT JOIN ml_remap r USING (cluster_id)""",
        # 1-NN star clustering replayed: argmax window over the symmetrized
        # scored pairs (ties → smallest neighbor), then a min-root walk over
        # the kept pseudoforest seeded with every valid email (singletons)
        "er_best_match_clusters": _ORACLE_PAIRS.replace(
            "\nWITH ", "\nWITH RECURSIVE ", 1
        )
        + ",\n"
        + _BM_CTES
        + """
        SELECT node AS email, min(root) AS cluster_id
        FROM bm_walk GROUP BY node""",
        # collective ER replayed: capped co-mention affinity → promotion of
        # the [0.90, 0.99) band at the 0.99 cut → min-root walk over the
        # union edge set seeded with every valid email
        "er_collective_clusters": _ORACLE_PAIRS.replace(
            "\nWITH ", "\nWITH RECURSIVE ", 1
        )
        + ",\n"
        + _CX_CTES
        + """
        SELECT node AS email, min(root) AS cluster_id
        FROM cx_walk GROUP BY node""",
        # G69 scoreboard: all four partitions rebuilt in SQL + the B-cubed
        # cell decomposition (same shapes as er_bcubed, four systems)
        "er_clustering_compare": _ORACLE_PAIRS.replace(
            "\nWITH ", "\nWITH RECURSIVE ", 1
        )
        + ",\n"
        + _BM_CTES
        + ",\n"
        + _CX_CTES
        + """,
        cmp_bm AS (
            SELECT node AS email, min(root) AS cluster_id
            FROM bm_walk GROUP BY node
        ),
        cmp_cx AS (
            SELECT node AS email, min(root) AS cluster_id
            FROM cx_walk GROUP BY node
        ),
        cmp_labeled AS (
            SELECT 'engine' AS system,
                   min(email) OVER (PARTITION BY match_key) AS cluster_id,
                   match_key
            FROM uniq
            UNION ALL
            SELECT 'exact_canonical',
                   min(email) OVER (PARTITION BY local_canon, domain_canon),
                   match_key
            FROM uniq
            UNION ALL
            SELECT 'best_match_070', l.cluster_id, u.match_key
            FROM cmp_bm l JOIN uniq u ON u.email = l.email
            UNION ALL
            SELECT 'collective_099', l.cluster_id, u.match_key
            FROM cmp_cx l JOIN uniq u ON u.email = l.email
        ),
        cmp_cells AS (
            SELECT system, cluster_id, match_key,
                   CAST(count(*) AS BIGINT) AS n_ck
            FROM cmp_labeled GROUP BY system, cluster_id, match_key
        ),
        cmp_pred AS (
            SELECT system, cluster_id, CAST(sum(n_ck) AS BIGINT) AS n_c
            FROM cmp_cells GROUP BY system, cluster_id
        ),
        cmp_tr AS (
            SELECT system, match_key, CAST(sum(n_ck) AS BIGINT) AS n_k
            FROM cmp_cells GROUP BY system, match_key
        ),
        cmp_stats AS (
            SELECT c.system,
                   CAST(sum(n_ck) AS BIGINT) AS n_emails,
                   sum((CAST(n_ck AS DOUBLE) * n_ck) / n_c) AS _sp,
                   sum((CAST(n_ck AS DOUBLE) * n_ck) / n_k) AS _sr
            FROM cmp_cells c
            JOIN cmp_pred p ON c.system = p.system
                AND c.cluster_id = p.cluster_id
            JOIN cmp_tr t ON c.system = t.system
                AND c.match_key = t.match_key
            GROUP BY c.system
        )
        SELECT system, n_emails,
               round(_sp / n_emails, 6) AS b3_precision,
               round(_sr / n_emails, 6) AS b3_recall,
               round(2.0 * _sp * _sr / (n_emails * (_sp + _sr)), 6) AS b3_f1
        FROM cmp_stats""",
        # depth-bounded recursive BFS walk + min-depth/min-parent reduction
        # replays the deterministic spanning forest exactly
        "er_merge_tree": _ORACLE_PAIRS.replace(
            "\nWITH ", "\nWITH RECURSIVE ", 1
        )
        + """,
        mt_clusters AS (
            SELECT email, min(email) OVER (PARTITION BY match_key)
                AS cluster_id
            FROM uniq
        ),
        mt_e AS (
            SELECT DISTINCT email_a AS a, email_b AS b, score
            FROM scored WHERE score >= 0.90
        ),
        mt_sym AS (
            SELECT a, b, score FROM mt_e
            UNION ALL SELECT b, a, score FROM mt_e
        ),
        mt_walk(cluster_id, node, depth) AS (
            SELECT DISTINCT cluster_id, cluster_id, 0 FROM mt_clusters
            UNION
            SELECT w.cluster_id, s.b, w.depth + 1
            FROM mt_walk w JOIN mt_sym s ON s.a = w.node
            WHERE w.depth < 32
        ),
        mt_lvl AS (
            SELECT cluster_id, node, min(depth) AS depth
            FROM mt_walk GROUP BY 1, 2
        ),
        mt_par AS (
            SELECT l.cluster_id, l.node AS email,
                CAST(l.depth AS INT) AS depth, min(s.a) AS parent
            FROM mt_lvl l
            JOIN mt_sym s ON s.b = l.node
            JOIN mt_lvl lp ON lp.cluster_id = l.cluster_id
                AND lp.node = s.a AND lp.depth = l.depth - 1
            WHERE l.depth > 0
            GROUP BY 1, 2, 3
        )
        SELECT p.cluster_id, p.email, p.depth, p.parent,
            s2.score AS parent_score
        FROM mt_par p JOIN mt_sym s2
            ON s2.a = p.parent AND s2.b = p.email
        UNION ALL
        SELECT DISTINCT cluster_id, cluster_id AS email,
            CAST(0 AS INT) AS depth, CAST(NULL AS VARCHAR) AS parent,
            CAST(NULL AS DOUBLE) AS parent_score
        FROM mt_clusters""",
        # one recursive min-root walk keyed by (threshold, node) certifies
        # the whole clustering ladder, not just the default 0.90 cut (the
        # leading WITH needs the RECURSIVE keyword for the walk CTE)
        "er_threshold_clusters": _ORACLE_PAIRS.replace(
            "\nWITH ", "\nWITH RECURSIVE ", 1
        )
        + """,
        thr AS (SELECT CAST(t AS DOUBLE) AS threshold
                FROM (VALUES (0.80), (0.85), (0.90), (0.95)) v(t)),
        tedges AS (
            SELECT t.threshold, s.email_a AS a, s.email_b AS b
            FROM (SELECT DISTINCT email_a, email_b, score FROM scored) s
            JOIN thr t ON s.score >= t.threshold
        ),
        tsym AS (SELECT threshold, a, b FROM tedges
                 UNION ALL SELECT threshold, b, a FROM tedges),
        twalk(threshold, id, root) AS (
            SELECT t.threshold, u.email, u.email FROM uniq u CROSS JOIN thr t
            UNION
            SELECT w.threshold, s.b, w.root
            FROM twalk w JOIN tsym s
              ON s.threshold = w.threshold AND s.a = w.id
        ),
        tcomp AS (SELECT threshold, id, min(root) AS cluster_id
                  FROM twalk GROUP BY threshold, id),
        tsizes AS (SELECT threshold, cluster_id, count(*) AS sz
                   FROM tcomp GROUP BY 1, 2),
        tne AS (SELECT threshold, CAST(count(*) AS BIGINT) AS n_edges
                FROM tedges GROUP BY 1)
        SELECT s.threshold,
            coalesce(e.n_edges, 0) AS n_edges,
            CAST(count(*) AS BIGINT) AS n_clusters,
            CAST(sum(CASE WHEN sz >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_multi,
            CAST(max(sz) AS BIGINT) AS max_size,
            CAST(sum(sz) AS BIGINT) AS n_emails
        FROM tsizes s LEFT JOIN tne e USING (threshold)
        GROUP BY s.threshold, e.n_edges""",
        "er_golden_record": _ORACLE_GOLDEN,
        # fold == full recompute: the oracle IS the full-corpus survivorship
        "er_golden_record_incr": _ORACLE_GOLDEN,
        # snapshot+fold == from-scratch SCD2 rebuild from both clusterings
        "er_membership_history": _ORACLE_HISTORY,
        # density replay: ground-truth clusters (engine equality pinned by
        # er_clusters) + the same >= 0.90 edge set as er_edges, attributed
        # via the src endpoint exactly like the engine side
        "er_cluster_density": _ORACLE_PAIRS + """,
        dclusters AS (
            SELECT email, min(email) OVER (PARTITION BY match_key) AS cluster_id
            FROM uniq
        ),
        dedges AS (
            SELECT c.cluster_id, s.score
            FROM scored s JOIN dclusters c ON c.email = s.email_a
            WHERE s.score >= 0.90
        ),
        dmemb AS (
            SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members
            FROM dclusters GROUP BY 1
        ),
        deagg AS (
            SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_edges,
                round(avg(score), 6) AS avg_score, min(score) AS min_score
            FROM dedges GROUP BY 1
        )
        SELECT m.cluster_id, m.n_members,
            coalesce(e.n_edges, 0) AS n_edges,
            CASE WHEN m.n_members > 1 THEN
                round(coalesce(e.n_edges, 0)
                      / (m.n_members * (m.n_members - 1) / 2.0), 6)
            END AS density,
            e.avg_score, e.min_score
        FROM dmemb m LEFT JOIN deagg e USING (cluster_id)""",
        "er_cluster_sizes": _ORACLE_CLUSTERS
        + """SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members
             FROM clusters GROUP BY cluster_id""",
        "er_blocking_metrics": _ORACLE_PAIRS
        + """,
        n AS (SELECT CAST(count(*) AS BIGINT) AS n_emails FROM uniq),
        cand AS (
            SELECT CAST(count(*) AS BIGINT) AS candidate_pairs,
                CAST(coalesce(sum(CASE WHEN mk_a = mk_b
                                       THEN 1 ELSE 0 END), 0) AS BIGINT)
                    AS covered_true_pairs
            FROM pairs
        ),
        t AS (
            SELECT CAST(coalesce(sum((c * (c - 1)) // 2), 0) AS BIGINT)
                AS true_pairs
            FROM (SELECT CAST(count(*) AS BIGINT) AS c FROM uniq
                  GROUP BY match_key)
        )
        SELECT n_emails,
            (n_emails * (n_emails - 1)) // 2 AS possible_pairs,
            candidate_pairs,
            round(1.0 - candidate_pairs /
                CAST(greatest((n_emails * (n_emails - 1)) // 2, 1) AS DOUBLE),
                6) AS reduction_ratio,
            true_pairs, covered_true_pairs,
            round(covered_true_pairs / CAST(greatest(true_pairs, 1) AS DOUBLE),
                6) AS pair_completeness
        FROM n, cand, t""",
        # G48 channel attribution: same scored CTE; channel is a pure
        # function of the features because the channels stratify the pair
        # space (dom_edit = 0 <=> same domain; dotless_eq splits the rest)
        "er_channel_contribution": _ORACLE_PAIRS
        + """
        SELECT CASE WHEN dom_edit = 0 THEN 'same_domain'
                    WHEN dotless_eq = 1.0 THEN 'cross_domain_local'
                    ELSE 'cross_domain_lsh' END AS channel,
               CAST(count(*) AS BIGINT) AS n_edges,
               CAST(sum(CASE WHEN mk_a = mk_b THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_true
        FROM scored WHERE score >= 0.90
        GROUP BY 1""",
        # G47 co-mention affinity: distinct (conv, email) -> small-conv cap
        # -> per-conv pair join -> pair count; same shapes as the Spark side
        "er_comention": MENTIONS_EXPECTED_CTE
        + """,
        ce AS (
            SELECT DISTINCT conv_id, email
            FROM mentions_expected WHERE valid_lax
        ),
        small AS (
            SELECT conv_id FROM ce GROUP BY conv_id HAVING count(*) <= 16
        ),
        kept AS (
            SELECT ce.conv_id, ce.email FROM ce JOIN small USING (conv_id)
        )
        SELECT a.email AS email_a, b.email AS email_b,
               CAST(count(*) AS BIGINT) AS n_convs
        FROM kept a
        JOIN kept b ON a.conv_id = b.conv_id AND a.email < b.email
        GROUP BY a.email, b.email""",
        # G45 B-cubed: the 'engine' replay (min email per truth match_key) is
        # licensed by the er_clusters triple-match; 'exact_canonical' replays
        # the string-identity ablation directly. Same cell/size/sum shapes as
        # the Spark side so the 6-decimal rounds agree.
        "er_bcubed": MENTIONS_EXPECTED_CTE
        + """,
        uniq AS (
            SELECT DISTINCT email, local_canon, domain_canon, match_key
            FROM mentions_expected WHERE valid_lax
        ),
        labeled AS (
            SELECT 'engine' AS system,
                   min(email) OVER (PARTITION BY match_key) AS cluster_id,
                   match_key
            FROM uniq
            UNION ALL
            SELECT 'exact_canonical' AS system,
                   min(email) OVER (PARTITION BY local_canon, domain_canon),
                   match_key
            FROM uniq
        ),
        cells AS (
            SELECT system, cluster_id, match_key,
                   CAST(count(*) AS BIGINT) AS n_ck
            FROM labeled GROUP BY system, cluster_id, match_key
        ),
        pred_sz AS (
            SELECT system, cluster_id, CAST(sum(n_ck) AS BIGINT) AS n_c
            FROM cells GROUP BY system, cluster_id
        ),
        truth_sz AS (
            SELECT system, match_key, CAST(sum(n_ck) AS BIGINT) AS n_k
            FROM cells GROUP BY system, match_key
        ),
        stats AS (
            SELECT c.system,
                   CAST(sum(n_ck) AS BIGINT) AS n_emails,
                   sum((CAST(n_ck AS DOUBLE) * n_ck) / n_c) AS _sp,
                   sum((CAST(n_ck AS DOUBLE) * n_ck) / n_k) AS _sr
            FROM cells c
            JOIN pred_sz p ON c.system = p.system AND c.cluster_id = p.cluster_id
            JOIN truth_sz t ON c.system = t.system AND c.match_key = t.match_key
            GROUP BY c.system
        )
        SELECT system, n_emails,
               round(_sp / n_emails, 6) AS b3_precision,
               round(_sr / n_emails, 6) AS b3_recall,
               round(2.0 * _sp * _sr / (n_emails * (_sp + _sr)), 6) AS b3_f1
        FROM stats""",
        # G64 ARI over the same two systems; every sum is an integer-valued
        # double (C2 of bigints), so the comparison is bit-exact
        "er_ari": MENTIONS_EXPECTED_CTE
        + """,
        uniq AS (
            SELECT DISTINCT email, local_canon, domain_canon, match_key
            FROM mentions_expected WHERE valid_lax
        ),
        labeled AS (
            SELECT 'engine' AS system,
                   min(email) OVER (PARTITION BY match_key) AS cluster_id,
                   match_key
            FROM uniq
            UNION ALL
            SELECT 'exact_canonical' AS system,
                   min(email) OVER (PARTITION BY local_canon, domain_canon),
                   match_key
            FROM uniq
        ),
        cells AS (
            SELECT system, cluster_id, match_key,
                   CAST(count(*) AS BIGINT) AS n_ck
            FROM labeled GROUP BY system, cluster_id, match_key
        ),
        pred_sz AS (
            SELECT system, cluster_id, CAST(sum(n_ck) AS BIGINT) AS n_c
            FROM cells GROUP BY system, cluster_id
        ),
        truth_sz AS (
            SELECT system, match_key, CAST(sum(n_ck) AS BIGINT) AS n_k
            FROM cells GROUP BY system, match_key
        ),
        base AS (
            SELECT system, CAST(sum(n_ck) AS BIGINT) AS n_emails,
                sum(CAST(n_ck AS DOUBLE) * (CAST(n_ck AS DOUBLE) - 1.0)
                    / 2.0) AS _idx
            FROM cells GROUP BY system
        ),
        pc AS (
            SELECT system,
                sum(CAST(n_c AS DOUBLE) * (CAST(n_c AS DOUBLE) - 1.0)
                    / 2.0) AS _sc
            FROM pred_sz GROUP BY system
        ),
        tc AS (
            SELECT system,
                sum(CAST(n_k AS DOUBLE) * (CAST(n_k AS DOUBLE) - 1.0)
                    / 2.0) AS _sk
            FROM truth_sz GROUP BY system
        ),
        ari_in AS (
            SELECT b.system, b.n_emails, b._idx, pc._sc, tc._sk,
                CAST(n_emails AS DOUBLE)
                    * (CAST(n_emails AS DOUBLE) - 1.0) / 2.0 AS _tot
            FROM base b
            JOIN pc ON pc.system = b.system
            JOIN tc ON tc.system = b.system
        ),
        ari_g AS (
            SELECT system, n_emails, _idx, _sc, _sk,
                CASE WHEN _tot > 0 THEN _sc * _sk / _tot ELSE 0.0 END AS _exp,
                (_sc + _sk) / 2.0 AS _max
            FROM ari_in
        )
        SELECT system, n_emails,
            round(_idx, 6) AS index_pairs,
            round(_exp, 6) AS expected_pairs,
            round(_max, 6) AS max_pairs,
            round(CASE WHEN _max - _exp > 0
                       THEN (_idx - _exp) / (_max - _exp)
                       ELSE 1.0 END, 6) AS ari
        FROM ari_g""",
        # G65 MUC: link-edit counting over the same cells; integer sums,
        # three final divisions — bit-exact
        "er_muc": MENTIONS_EXPECTED_CTE
        + """,
        uniq AS (
            SELECT DISTINCT email, local_canon, domain_canon, match_key
            FROM mentions_expected WHERE valid_lax
        ),
        labeled AS (
            SELECT 'engine' AS system,
                   min(email) OVER (PARTITION BY match_key) AS cluster_id,
                   match_key
            FROM uniq
            UNION ALL
            SELECT 'exact_canonical' AS system,
                   min(email) OVER (PARTITION BY local_canon, domain_canon),
                   match_key
            FROM uniq
        ),
        cells AS (
            SELECT system, cluster_id, match_key,
                   CAST(count(*) AS BIGINT) AS n_ck
            FROM labeled GROUP BY system, cluster_id, match_key
        ),
        by_k AS (
            SELECT system, match_key, CAST(sum(n_ck) AS BIGINT) AS n_k,
                   CAST(count(*) AS BIGINT) AS p_k
            FROM cells GROUP BY system, match_key
        ),
        by_c AS (
            SELECT system, cluster_id, CAST(sum(n_ck) AS BIGINT) AS n_c,
                   CAST(count(*) AS BIGINT) AS p_c
            FROM cells GROUP BY system, cluster_id
        ),
        base AS (
            SELECT system, CAST(sum(n_ck) AS BIGINT) AS n_emails
            FROM cells GROUP BY system
        ),
        rk AS (
            SELECT system, CAST(sum(n_k - p_k) AS BIGINT) AS _rn,
                   CAST(sum(n_k - 1) AS BIGINT) AS _rd
            FROM by_k GROUP BY system
        ),
        pk AS (
            SELECT system, CAST(sum(n_c - p_c) AS BIGINT) AS _pn,
                   CAST(sum(n_c - 1) AS BIGINT) AS _pd
            FROM by_c GROUP BY system
        )
        ,
        muc_g AS (
            SELECT b.system, b.n_emails,
                CASE WHEN _pd > 0 THEN CAST(_pn AS DOUBLE) / _pd
                     ELSE 0.0 END AS _p,
                CASE WHEN _rd > 0 THEN CAST(_rn AS DOUBLE) / _rd
                     ELSE 0.0 END AS _r
            FROM base b
            JOIN rk ON rk.system = b.system
            JOIN pk ON pk.system = b.system
        )
        SELECT system, n_emails,
            round(_p, 6) AS muc_precision,
            round(_r, 6) AS muc_recall,
            round(CASE WHEN _p + _r > 0 THEN 2.0 * _p * _r / (_p + _r)
                       ELSE 0.0 END, 6) AS muc_f1
        FROM muc_g""",
        # blocking skew-cost: distinct emails per exact-channel block key,
        # quadratic pair cost via integer DIV, share against the broadcast
        # scalar total, deterministic top-20
        "er_block_skew": MENTIONS_EXPECTED_CTE
        + """,
        bsk_uniq AS (
            SELECT DISTINCT email, domain_canon
            FROM mentions_expected WHERE valid_lax
        ),
        bsk_sizes AS (
            SELECT domain_canon AS block_key,
                CAST(count(*) AS BIGINT) AS n_emails
            FROM bsk_uniq GROUP BY 1
        ),
        bsk_tot AS (
            SELECT CAST(coalesce(sum(n_emails * (n_emails - 1) // 2), 0)
                AS BIGINT) AS _total_cost
            FROM bsk_sizes
        )
        SELECT block_key, n_emails,
            n_emails * (n_emails - 1) // 2 AS pair_cost,
            round((n_emails * (n_emails - 1) // 2)
                  / CAST(greatest(_total_cost, 1) AS DOUBLE), 6) AS cost_share
        FROM bsk_sizes, bsk_tot
        ORDER BY n_emails DESC, block_key LIMIT 20""",
        # entity activity replay: ground-truth clusters (engine equality
        # pinned by er_clusters) x the transcript row's event time
        "er_entity_activity": _ORACLE_CLUSTERS
        + """,
        act AS (
            SELECT c.cluster_id, strftime(t.ts, '%Y-%m') AS month, m.conv_id
            FROM mentions_expected m
            JOIN transcripts t USING (conv_id, turn_idx)
            JOIN clusters c ON c.email = m.email
            WHERE m.valid_lax
        )
        SELECT cluster_id, month,
            CAST(count(*) AS BIGINT) AS n_mentions,
            CAST(count(DISTINCT conv_id) AS BIGINT) AS n_conversations
        FROM act GROUP BY 1, 2""",
        # G53 meta-blocking replay: same key construction (L:/D:/G: tokens,
        # list_distinct grams), purge at 64, CBS count join, WNP means (one
        # exact integer-sum/count division per node on both engines)
        "er_metablocking": MENTIONS_EXPECTED_CTE
        + """,
        mb_uniq AS (
            SELECT DISTINCT email, replace(local_canon, '.', '') AS dotless,
                   domain_canon
            FROM mentions_expected WHERE valid_lax
        ),
        mb_keys AS (
            SELECT email, unnest(list_concat(
                [concat('L:', dotless), concat('D:', domain_canon)],
                list_distinct(list_transform(
                    range(1, greatest(length(dotless) - 2, 1) + 1),
                    i -> concat('G:', substr(dotless, CAST(i AS INT), 3))))
            )) AS key
            FROM mb_uniq
        ),
        mb_sizes AS (SELECT key, count(*) AS n FROM mb_keys GROUP BY key),
        mb_ek AS (
            SELECT k.email, k.key FROM mb_keys k
            JOIN mb_sizes s USING (key) WHERE s.n <= 64
        ),
        mb_edges AS (
            SELECT a.email AS email_a, b.email AS email_b,
                   CAST(count(*) AS BIGINT) AS w
            FROM mb_ek a JOIN mb_ek b
              ON a.key = b.key AND a.email < b.email
            GROUP BY 1, 2
        ),
        mb_means AS (
            SELECT email, CAST(sum(w) AS DOUBLE) / count(*) AS mean_w
            FROM (SELECT email_a AS email, w FROM mb_edges
                  UNION ALL SELECT email_b AS email, w FROM mb_edges)
            GROUP BY email
        )
        SELECT e.email_a, e.email_b, e.w,
               (e.w >= ma.mean_w OR e.w >= mb.mean_w) AS kept
        FROM mb_edges e
        JOIN mb_means ma ON ma.email = e.email_a
        JOIN mb_means mb ON mb.email = e.email_b""",
        # G54 Fellegi–Sunter replay: same scored CTE, same agreement bits,
        # add-half smoothing and ln/round(6) (the doc_collocations precedent)
        "er_fs_weights": _ORACLE_PAIRS
        + """,
        fs_cells AS (
            SELECT (dotless_eq = 1.0) AS g_dotless,
                   (dom_edit = 0) AS g_domain,
                   (lev_local <= 1) AS g_lev,
                   (jw_local >= 0.94) AS g_jw,
                   CAST(sum(CASE WHEN mk_a = mk_b THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_match,
                   CAST(sum(CASE WHEN mk_a = mk_b THEN 0 ELSE 1 END) AS BIGINT)
                       AS n_unmatch
            FROM scored GROUP BY 1, 2, 3, 4
        ),
        fs_tot AS (
            SELECT CAST(sum(n_match) AS BIGINT) AS tot_match,
                   CAST(sum(n_unmatch) AS BIGINT) AS tot_unmatch
            FROM fs_cells
        )
        SELECT g_dotless, g_domain, g_lev, g_jw, n_match, n_unmatch,
               round((n_match + 0.5) / (tot_match + 1.0), 6) AS m_prob,
               round((n_unmatch + 0.5) / (tot_unmatch + 1.0), 6) AS u_prob,
               round(ln(((n_match + 0.5) / (tot_match + 1.0))
                        / ((n_unmatch + 0.5) / (tot_unmatch + 1.0))), 6)
                   AS llr_weight
        FROM fs_cells, fs_tot""",
        # G57 SNM replay: the textbook single-node form — row_number over
        # the strict total order + rank-distance self-join; equality proves
        # the distributed rank (range partition + offsets) is exact
        "er_snm_pairs": MENTIONS_EXPECTED_CTE
        + """,
        snm_uniq AS (
            SELECT DISTINCT email,
                concat(replace(local_canon, '.', ''), '|', domain_canon)
                    AS sort_key
            FROM mentions_expected WHERE valid_lax
        ),
        snm_r AS (
            SELECT email,
                row_number() OVER (ORDER BY sort_key, email) AS rn
            FROM snm_uniq
        )
        SELECT a.email AS email_a, b.email AS email_b,
               CAST(b.rn - a.rn AS INT) AS dist
        FROM snm_r a JOIN snm_r b
          ON b.rn - a.rn BETWEEN 1 AND 7""",
        # G56 held-out FS replay: same scored CTE + md5 split + train-half
        # weights LEFT-joined onto the held-out half, LLR >= 0 decision
        "er_fs_match_f1": _ORACLE_PAIRS
        + """,
        fsb AS (
            SELECT mk_a, mk_b,
                   (dotless_eq = 1.0) AS g_dotless,
                   (dom_edit = 0) AS g_domain,
                   (lev_local <= 1) AS g_lev,
                   (jw_local >= 0.94) AS g_jw,
                   """
        + _oracles.uniform_hash_sql("'fs:' || email_a || '|' || email_b")
        + """ AS _u
            FROM scored
        ),
        fsc AS (
            SELECT g_dotless, g_domain, g_lev, g_jw,
                   CAST(sum(CASE WHEN mk_a = mk_b THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_match,
                   CAST(sum(CASE WHEN mk_a = mk_b THEN 0 ELSE 1 END) AS BIGINT)
                       AS n_unmatch
            FROM fsb WHERE _u < 0.5 GROUP BY 1, 2, 3, 4
        ),
        fst AS (
            SELECT CAST(sum(n_match) AS BIGINT) AS tot_match,
                   CAST(sum(n_unmatch) AS BIGINT) AS tot_unmatch
            FROM fsc
        ),
        fsw AS (
            SELECT g_dotless, g_domain, g_lev, g_jw,
                   round(ln(((n_match + 0.5) / (tot_match + 1.0))
                            / ((n_unmatch + 0.5) / (tot_unmatch + 1.0))), 6)
                       AS llr_weight
            FROM fsc, fst
        ),
        fse AS (
            SELECT b.mk_a, b.mk_b,
                   coalesce(w.llr_weight >= 0.0, FALSE) AS pred
            FROM fsb b LEFT JOIN fsw w
              USING (g_dotless, g_domain, g_lev, g_jw)
            WHERE b._u >= 0.5
        ),
        fsa AS (
            SELECT CAST(count(*) AS BIGINT) AS n_eval,
                CAST(sum(CASE WHEN pred AND mk_a = mk_b THEN 1 ELSE 0 END)
                    AS BIGINT) AS tp,
                CAST(sum(CASE WHEN pred AND mk_a <> mk_b THEN 1 ELSE 0 END)
                    AS BIGINT) AS fp,
                CAST(sum(CASE WHEN NOT pred AND mk_a = mk_b THEN 1 ELSE 0 END)
                    AS BIGINT) AS fn
            FROM fse
        ),
        fspr AS (
            SELECT n_eval, tp, fp, fn,
                tp / CAST(greatest(tp + fp, 1) AS DOUBLE) AS _p,
                tp / CAST(greatest(tp + fn, 1) AS DOUBLE) AS _r
            FROM fsa
        )
        SELECT n_eval, tp, fp, fn,
            round(_p, 6) AS precision, round(_r, 6) AS recall,
            round(CASE WHEN _p + _r > 0 THEN 2.0 * _p * _r / (_p + _r)
                       ELSE 0.0 END, 6) AS f1
        FROM fspr""",
        # G46 trained-scorer replay: frozen 2-iteration IRLS as CTE chain,
        # 5×5 Newton solves via generated Cramer determinants
        "er_trained_match_f1": _ORACLE_PAIRS
        + _oracles.trained_match_f1_oracle(),
        # G72 phonetic-blocking replay: the key SQL is generated from the
        # SAME step table as the Catalyst expression (phonetic.py)
        "er_phonetic_pairs": _phonetic_pairs_oracle(),
        "er_phonetic_blocks": _phonetic_blocks_oracle(),
        # G55 domain-alias replay: domain dim + distinct 4-gram block join
        # (purged at 10000), strict population orientation, levenshtein<=2,
        # per-alias winner by (n_canon DESC, canonical ASC)
        "er_domain_aliases": MENTIONS_EXPECTED_CTE
        + """,
        da_uniq AS (
            SELECT DISTINCT email, domain_canon
            FROM mentions_expected WHERE valid_lax
        ),
        da_dim AS (
            SELECT domain_canon, CAST(count(*) AS BIGINT) AS n_emails
            FROM da_uniq GROUP BY domain_canon
        ),
        da_grams AS (
            SELECT domain_canon, n_emails, unnest(list_distinct(list_transform(
                range(1, greatest(length(domain_canon) - 3, 1) + 1),
                i -> substr(domain_canon, CAST(i AS INT), 4)))) AS gram
            FROM da_dim
        ),
        da_gsz AS (SELECT gram, count(*) AS gn FROM da_grams GROUP BY gram),
        da_g AS (
            SELECT g.domain_canon, g.n_emails, g.gram FROM da_grams g
            JOIN da_gsz s USING (gram) WHERE s.gn <= 10000
        ),
        da_cand AS (
            SELECT DISTINCT a.domain_canon AS alias_domain,
                   a.n_emails AS n_alias,
                   b.domain_canon AS canonical_domain, b.n_emails AS n_canon
            FROM da_g a JOIN da_g b
              ON a.gram = b.gram AND a.n_emails < b.n_emails
        ),
        da_lev AS (
            SELECT alias_domain, canonical_domain,
                   CAST(levenshtein(alias_domain, canonical_domain) AS INT)
                       AS edit,
                   n_alias, n_canon
            FROM da_cand
            WHERE levenshtein(alias_domain, canonical_domain) <= 2
        )
        SELECT alias_domain, canonical_domain, edit, n_alias, n_canon
        FROM (SELECT *, row_number() OVER (PARTITION BY alias_domain
                  ORDER BY n_canon DESC, canonical_domain ASC) AS rn
              FROM da_lev)
        WHERE rn = 1""",
        # one-pass PR curve: same scored CTE; buckets are floor(score*100)
        # (score rounded 6dp on both engines => bit-deterministic boundary),
        # cumulative sums descend from the top bucket
        "er_threshold_sweep": _ORACLE_PAIRS
        + """,
        tsw_buckets AS (
            SELECT CAST(floor(score * 100) AS BIGINT) AS bucket,
                CAST(count(*) AS BIGINT) AS pairs,
                CAST(sum(CASE WHEN mk_a = mk_b THEN 1 ELSE 0 END) AS BIGINT)
                    AS true_pairs
            FROM scored GROUP BY 1
        ),
        tsw_cum AS (
            SELECT bucket, pairs, true_pairs,
                sum(pairs) OVER (ORDER BY bucket DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _cp,
                sum(true_pairs) OVER (ORDER BY bucket DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _ct,
                sum(true_pairs) OVER () AS _tt
            FROM tsw_buckets
        ),
        tsw_pr AS (
            SELECT bucket, bucket / 100.0 AS threshold, pairs, true_pairs,
                CAST(_ct AS BIGINT) AS tp,
                CAST(_cp - _ct AS BIGINT) AS fp,
                CAST(_tt - _ct AS BIGINT) AS fn,
                _ct / CAST(greatest(_cp, 1) AS DOUBLE) AS _p,
                _ct / CAST(greatest(_tt, 1) AS DOUBLE) AS _r
            FROM tsw_cum
        )
        SELECT bucket, threshold, pairs, true_pairs, tp, fp, fn,
            round(_p, 6) AS precision, round(_r, 6) AS recall,
            round(CASE WHEN _p + _r > 0 THEN 2.0 * _p * _r / (_p + _r)
                       ELSE 0.0 END, 6) AS f1
        FROM tsw_pr""",
        # provenance: the expected-mentions view joined back to its own
        # transcript row (one mention per turn) for role/tool
        "er_mention_provenance": MENTIONS_EXPECTED_CTE
        + """
        SELECT t.role, coalesce(t.tool, 'none') AS tool,
            CAST(count(*) AS BIGINT) AS n_mentions,
            CAST(sum(CASE WHEN m.valid_strict THEN 1 ELSE 0 END) AS BIGINT)
                AS n_strict,
            CAST(sum(CASE WHEN m.valid_lax THEN 1 ELSE 0 END) AS BIGINT)
                AS n_lax,
            CAST(count(DISTINCT m.email) AS BIGINT) AS n_distinct_emails,
            round(sum(CASE WHEN m.valid_lax THEN 1 ELSE 0 END)
                  / CAST(count(*) AS DOUBLE), 6) AS lax_rate
        FROM mentions_expected m
        JOIN transcripts t USING (conv_id, turn_idx)
        GROUP BY 1, 2""",
        "er_match_f1": _ORACLE_PAIRS
        + """,
        agg AS (
            SELECT
                CAST(sum(CASE WHEN score >= 0.90 AND mk_a = mk_b THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                CAST(sum(CASE WHEN score >= 0.90 AND mk_a <> mk_b THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                CAST(sum(CASE WHEN score < 0.90 AND mk_a = mk_b THEN 1 ELSE 0 END) AS BIGINT) AS fn
            FROM scored
        ),
        pr AS (
            SELECT tp, fp, fn,
                tp / CAST(greatest(tp + fp, 1) AS DOUBLE) AS _p,
                tp / CAST(greatest(tp + fn, 1) AS DOUBLE) AS _r
            FROM agg
        )
        SELECT tp, fp, fn,
            round(_p, 6) AS precision, round(_r, 6) AS recall,
            round(CASE WHEN _p + _r > 0 THEN 2.0 * _p * _r / (_p + _r)
                       ELSE 0.0 END, 6) AS f1
        FROM pr""",
        # G67 PPRL: CLK bigram/hash/Dice replay over the same candidate set
        "er_pprl_pairs": _ORACLE_PAIRS
        + ","
        + _oracles.pprl_cte()
        + """
        SELECT email_a, email_b, dice_local, dice_domain, clk_score
        FROM pp_scored""",
        "er_pprl_match_f1": _ORACLE_PAIRS
        + ","
        + _oracles.pprl_cte()
        + """,
        pp_agg AS (
            SELECT
                CAST(sum(CASE WHEN clk_score >= 0.975 AND mk_a = mk_b THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                CAST(sum(CASE WHEN clk_score >= 0.975 AND mk_a <> mk_b THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                CAST(sum(CASE WHEN clk_score < 0.975 AND mk_a = mk_b THEN 1 ELSE 0 END) AS BIGINT) AS fn
            FROM pp_scored
        ),
        pp_pr AS (
            SELECT tp, fp, fn,
                tp / CAST(greatest(tp + fp, 1) AS DOUBLE) AS _p,
                tp / CAST(greatest(tp + fn, 1) AS DOUBLE) AS _r
            FROM pp_agg
        )
        SELECT tp, fp, fn,
            round(_p, 6) AS precision, round(_r, 6) AS recall,
            round(CASE WHEN _p + _r > 0 THEN 2.0 * _p * _r / (_p + _r)
                       ELSE 0.0 END, 6) AS f1
        FROM pp_pr""",
        # G67 sweep: bucket collapse + cumulative windows over clk_score,
        # same shapes as er_threshold_sweep
        "er_pprl_sweep": _ORACLE_PAIRS
        + ","
        + _oracles.pprl_cte()
        + """,
        psw_buckets AS (
            SELECT CAST(floor(clk_score * 100) AS BIGINT) AS bucket,
                CAST(count(*) AS BIGINT) AS pairs,
                CAST(sum(CASE WHEN mk_a = mk_b THEN 1 ELSE 0 END) AS BIGINT)
                    AS true_pairs
            FROM pp_scored GROUP BY 1
        ),
        psw_cum AS (
            SELECT bucket, pairs, true_pairs,
                sum(pairs) OVER (ORDER BY bucket DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _cp,
                sum(true_pairs) OVER (ORDER BY bucket DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _ct,
                sum(true_pairs) OVER () AS _tt
            FROM psw_buckets
        ),
        psw_pr AS (
            SELECT bucket, bucket / 100.0 AS threshold, pairs, true_pairs,
                CAST(_ct AS BIGINT) AS tp,
                CAST(_cp - _ct AS BIGINT) AS fp,
                CAST(_tt - _ct AS BIGINT) AS fn,
                _ct / CAST(greatest(_cp, 1) AS DOUBLE) AS _p,
                _ct / CAST(greatest(_tt, 1) AS DOUBLE) AS _r
            FROM psw_cum
        )
        SELECT bucket, threshold, pairs, true_pairs, tp, fp, fn,
            round(_p, 6) AS precision, round(_r, 6) AS recall,
            round(CASE WHEN _p + _r > 0 THEN 2.0 * _p * _r / (_p + _r)
                       ELSE 0.0 END, 6) AS f1
        FROM psw_pr""",
        # G70: fold == from-scratch — the oracle is the full-corpus encode
        "er_pprl_index_incr": MENTIONS_EXPECTED_CTE
        + """,
        uniq AS (
            SELECT DISTINCT email, replace(local_canon, '.', '') AS dotless,
                   domain_canon
            FROM mentions_expected WHERE valid_lax
        ),"""
        + _oracles.pprl_encode_cte()
        + """
        SELECT email, pos FROM pp_pl""",
        # G67 audit: filters equal iff position sets equal — group by the
        # sorted position list (Spark groups by the packed words)
        "er_pprl_anonymity": _ORACLE_PAIRS
        + ","
        + _oracles.pprl_encode_cte()
        + """,
        pa_sets AS (
            SELECT email, list_sort(list(pos)) AS ps
            FROM pp_pl GROUP BY email
        ),
        pa_classes AS (
            SELECT ps, CAST(count(*) AS BIGINT) AS k
            FROM pa_sets GROUP BY ps
        )
        SELECT k AS multiplicity,
               CAST(count(*) AS BIGINT) AS n_filters,
               CAST(sum(k) AS BIGINT) AS n_emails
        FROM pa_classes GROUP BY k""",
        # G68: CLK-LSH blocking replay + the er_blocking_metrics shapes
        "er_pprl_blocking_metrics": _ORACLE_PAIRS
        + ","
        + _oracles.pprl_encode_cte()
        + ","
        + _oracles.pprl_blocking_cte()
        + """,
        pbm_n AS (SELECT CAST(count(*) AS BIGINT) AS n_emails FROM uniq),
        pbm_cand AS (
            SELECT CAST(count(*) AS BIGINT) AS candidate_pairs,
                CAST(coalesce(sum(CASE WHEN a.match_key = b.match_key
                                       THEN 1 ELSE 0 END), 0) AS BIGINT)
                    AS covered_true_pairs
            FROM pb_pairs p
            JOIN uniq a ON a.email = p.email_a
            JOIN uniq b ON b.email = p.email_b
        ),
        pbm_t AS (
            SELECT CAST(coalesce(sum((c * (c - 1)) // 2), 0) AS BIGINT)
                AS true_pairs
            FROM (SELECT CAST(count(*) AS BIGINT) AS c FROM uniq
                  GROUP BY match_key)
        )
        SELECT n_emails,
            (n_emails * (n_emails - 1)) // 2 AS possible_pairs,
            candidate_pairs,
            round(1.0 - candidate_pairs /
                CAST(greatest((n_emails * (n_emails - 1)) // 2, 1) AS DOUBLE),
                6) AS reduction_ratio,
            true_pairs, covered_true_pairs,
            round(covered_true_pairs / CAST(greatest(true_pairs, 1) AS DOUBLE),
                6) AS pair_completeness
        FROM pbm_n, pbm_cand, pbm_t""",
        # G67+G68 end-to-end: private blocking feeding the private scorer,
        # recall denominated in ALL true pairs
        "er_pprl_e2e_f1": _ORACLE_PAIRS
        + ","
        + _oracles.pprl_encode_cte()
        + ","
        + _oracles.pprl_blocking_cte()
        + """,
        pbx AS (
            SELECT p.email_a, p.email_b,
                   a.match_key AS mk_a, b.match_key AS mk_b
            FROM pb_pairs p
            JOIN uniq a ON a.email = p.email_a
            JOIN uniq b ON b.email = p.email_b
        ),"""
        + _oracles.pprl_compare_cte(pairs_cte="pbx")
        + """,
        pe_agg AS (
            SELECT
                CAST(sum(CASE WHEN clk_score >= 0.975 AND mk_a = mk_b THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                CAST(sum(CASE WHEN clk_score >= 0.975 AND mk_a <> mk_b THEN 1 ELSE 0 END) AS BIGINT) AS fp
            FROM pp_scored
        ),
        pe_t AS (
            SELECT CAST(coalesce(sum((c * (c - 1)) // 2), 0) AS BIGINT)
                AS true_pairs
            FROM (SELECT CAST(count(*) AS BIGINT) AS c FROM uniq
                  GROUP BY match_key)
        ),
        pe_pr AS (
            SELECT tp, fp, true_pairs - tp AS fn, true_pairs,
                tp / CAST(greatest(tp + fp, 1) AS DOUBLE) AS _p,
                tp / CAST(greatest(true_pairs, 1) AS DOUBLE) AS _r
            FROM pe_agg, pe_t
        )
        SELECT tp, fp, fn, true_pairs,
            round(_p, 6) AS precision, round(_r, 6) AS recall,
            round(CASE WHEN _p + _r > 0 THEN 2.0 * _p * _r / (_p + _r)
                       ELSE 0.0 END, 6) AS f1
        FROM pe_pr""",
        # golden-diff invariant: engine clustering ≡ match_key clustering,
        # so both exceptAll legs are empty and the intersection is every
        # distinct valid email
        "er_clusters_diff_golden": _ORACLE_CLUSTERS
        + """SELECT CAST(0 AS BIGINT) AS n_only_engine,
                    CAST(0 AS BIGINT) AS n_only_golden,
                    CAST(count(*) AS BIGINT) AS n_common
             FROM clusters""",
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                CAST(sum(CAST(floor(l_quantity * 10000) AS BIGINT)) AS BIGINT) AS sum_qty_e4,
                CAST(sum(CAST(floor(l_extendedprice * 10000) AS BIGINT)) AS BIGINT) AS sum_base_price_e4,
                CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS sum_disc_price_e4,
                CAST(count(*) AS BIGINT) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus""",
        "q3_shipping_priority": """
            SELECT l_orderkey,
                strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
                o_orderpriority,
                CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
              AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue_e4 DESC, l_orderkey ASC
            LIMIT 10""",
        "top_order_per_customer": """
            WITH ranked AS (
                SELECT o_custkey, o_orderkey, o_totalprice,
                    row_number() OVER (PARTITION BY o_custkey
                                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
                FROM orders
            )
            SELECT c_name, o_orderkey AS top_orderkey,
                CAST(floor(o_totalprice * 10000) AS BIGINT) AS top_totalprice_e4
            FROM ranked JOIN customer ON o_custkey = c_custkey
            WHERE rn = 1""",
        "region_customer_rollup": """
            SELECT r_name, CAST(count(*) AS BIGINT) AS n_customers,
                CAST(sum(CAST(floor(c_acctbal * 10000) AS BIGINT)) AS BIGINT) AS sum_acctbal_e4
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name""",
        "orders_without_lineitem": """
            SELECT CAST(count(*) AS BIGINT) AS n_orders_without_lineitem
            FROM orders WHERE NOT EXISTS (
                SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)""",
        "events_daily": """
            SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(CAST(floor(value * 10000) AS BIGINT)) AS BIGINT) AS sum_value_e4
            FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')""",
        "events_sessions": _oracles.events_sessions_oracle(gap_s=12 * 3600),
        "events_last_touch": _oracles.events_last_touch_oracle(
            left_type="purchase", right_type="click"
        ),
        "events_rolling": _oracles.events_rolling_oracle(window_s=7 * 86400),
        "events_funnel": _funnel_oracle(),
        "events_retention": """
            WITH activity AS (
                SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
            ),
            cohort AS (
                SELECT user_id, min(day) AS cday FROM activity GROUP BY 1
            )
            SELECT strftime(c.cday, '%Y-%m-%d') AS cohort_day,
                CAST(date_diff('day', c.cday, a.day) AS INT) AS offset_days,
                CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
            FROM activity a JOIN cohort c USING (user_id)
            GROUP BY 1, 2""",
        "events_props_stats": """
            SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(CAST(floor(value * 10000) AS BIGINT)) AS BIGINT) AS sum_value_e4
            FROM events GROUP BY 1""",
        "events_quantiles": """
            SELECT event_type,
                round(quantile_cont(value, 0.5), 6) AS p50,
                round(quantile_cont(value, 0.9), 6) AS p90,
                round(quantile_cont(value, 0.99), 6) AS p99,
                CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY event_type""",
        "events_pivot": """
            SELECT strftime(ts, '%Y-%m-%d') AS day,
                CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
                CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
                CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
                CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
                CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view
            FROM events GROUP BY 1""",
        # --- training-data pipeline oracles --------------------------------
        "doc_token_counts": r"""
            SELECT doc_id,
                CAST(len(regexp_extract_all(text, '\S+')) AS INT) AS n_tokens,
                CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS INT) AS n_words,
                CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS INT) AS n_subtokens
            FROM documents""",
        "doc_quality": r"""
            WITH q AS (
                SELECT doc_id,
                    length(text) AS n_chars,
                    len(regexp_extract_all(text, '\s')) AS n_ws,
                    len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha,
                    len(regexp_extract_all(text, '[0-9]')) AS n_digit,
                    len(regexp_extract_all(text, '\S+')) AS n_tokens,
                    len(regexp_extract_all(lower(text), '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS n_stop
                FROM documents
            )
            SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
                round(n_alpha / CAST(greatest(n_chars, 1) AS DOUBLE), 6) AS alpha_ratio,
                round((n_chars - n_ws - n_alpha - n_digit) / CAST(greatest(n_chars, 1) AS DOUBLE), 6) AS other_ratio,
                round(n_stop / CAST(greatest(n_tokens, 1) AS DOUBLE), 6) AS stop_ratio,
                round((n_chars - n_ws) / CAST(greatest(n_tokens, 1) AS DOUBLE), 6) AS avg_token_len,
                round(0.4 * (n_alpha / CAST(greatest(n_chars, 1) AS DOUBLE))
                    + 0.3 * (1.0 - (n_chars - n_ws - n_alpha - n_digit) / CAST(greatest(n_chars, 1) AS DOUBLE))
                    + 0.3 * least(n_tokens / 100.0, 1.0), 6) AS quality_score
            FROM q""",
        "doc_lang_id": r"""
            WITH s AS (
                SELECT doc_id,
                    len(regexp_extract_all(lower(text), '\b(the|and|is|of|to|in|that)\b')) AS s_en,
                    len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist|nicht|ein)\b')) AS s_de,
                    len(regexp_extract_all(lower(text), '\b(le|les|et|est|une|dans|pour)\b')) AS s_fr,
                    len(regexp_extract_all(lower(text), '\b(el|los|las|y|es|una|que)\b')) AS s_es,
                    len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS s_zh
                FROM documents
            )
            SELECT doc_id,
                CAST(s_en AS INT) AS score_en, CAST(s_de AS INT) AS score_de,
                CAST(s_fr AS INT) AS score_fr, CAST(s_es AS INT) AS score_es,
                CAST(s_zh AS INT) AS score_zh,
                CASE WHEN greatest(s_en, s_de, s_fr, s_es, s_zh) = 0 THEN 'und'
                     WHEN s_en = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'en'
                     WHEN s_de = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'de'
                     WHEN s_fr = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'fr'
                     WHEN s_es = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'es'
                     ELSE 'zh' END AS lang_pred
            FROM s""",
        "doc_fingerprints": r"""
            WITH d AS (
                SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
                FROM documents
            ),
            g AS (
                SELECT doc_id,
                    list_transform(range(1, greatest(length(norm) - 7, 1) + 1),
                        i -> list_reduce(
                            list_transform(range(1, 16),
                                j -> CAST(strpos('0123456789abcdef',
                                          substr(md5(substr(norm, CAST(i AS INT), 8)), CAST(j AS INT), 1)) - 1 AS BIGINT)),
                            (acc, x) -> acc * 16 + x)) AS ghash
                FROM d
            ),
            w AS (
                SELECT doc_id,
                    list_sort(list_distinct(
                        list_transform(range(1, greatest(len(ghash) - 3, 1) + 1),
                            j -> list_min(ghash[j:j+3])))) AS fp
                FROM g
            )
            SELECT doc_id, unnest(fp) AS gram_hash FROM w""",
        "doc_repetition": r"""
            WITH toks AS (
                SELECT doc_id,
                    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
                FROM documents
            ),
            g AS (
                SELECT doc_id, 1 AS n, unnest(t) AS g FROM toks
                UNION ALL
                SELECT doc_id, 2 AS n,
                    unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                        i -> array_to_string(t[i:i+1], ' '))) AS g
                FROM toks
                UNION ALL
                SELECT doc_id, 5 AS n,
                    unnest(list_transform(range(1, greatest(len(t) - 4, 0) + 1),
                        i -> array_to_string(t[i:i+4], ' '))) AS g
                FROM toks
            ),
            gc AS (SELECT doc_id, n, g, count(*) AS c FROM g GROUP BY 1, 2, 3),
            agg AS (
                SELECT doc_id,
                    sum(CASE WHEN n = 1 THEN c END) AS occ1,
                    count(CASE WHEN n = 1 THEN 1 END) AS dis1,
                    sum(CASE WHEN n = 2 THEN c END) AS occ2,
                    count(CASE WHEN n = 2 THEN 1 END) AS dis2,
                    max(CASE WHEN n = 2 THEN c END) AS top2,
                    sum(CASE WHEN n = 5 THEN c END) AS occ5,
                    count(CASE WHEN n = 5 THEN 1 END) AS dis5
                FROM gc GROUP BY 1
            )
            SELECT doc_id,
                round(coalesce(dis1, 0) / CAST(greatest(coalesce(occ1, 0), 1) AS DOUBLE), 6) AS ttr,
                round(coalesce(top2, 0) / CAST(greatest(coalesce(occ2, 0), 1) AS DOUBLE), 6) AS top_bigram_frac,
                round(coalesce(occ2 - dis2, 0) / CAST(greatest(coalesce(occ2, 0), 1) AS DOUBLE), 6) AS dup_bigram_frac,
                round(coalesce(occ5 - dis5, 0) / CAST(greatest(coalesce(occ5, 0), 1) AS DOUBLE), 6) AS dup_5gram_frac,
                round(coalesce(top2, 0) / CAST(greatest(coalesce(occ2, 0), 1) AS DOUBLE), 6) <= 0.20
                    AND round(coalesce(occ5 - dis5, 0) / CAST(greatest(coalesce(occ5, 0), 1) AS DOUBLE), 6) <= 0.10
                    AND round(coalesce(dis1, 0) / CAST(greatest(coalesce(occ1, 0), 1) AS DOUBLE), 6) >= 0.20
                    AS rep_keep
            FROM agg""",
        "doc_tfidf_topk": r"""
            WITH terms AS (
                SELECT doc_id, unnest(string_split(
                    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
                FROM documents
            ),
            tf AS (
                SELECT doc_id, term, count(*) AS tf
                FROM terms WHERE term <> '' GROUP BY 1, 2
            ),
            dft AS (SELECT term, count(*) AS df_t FROM tf GROUP BY 1),
            n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
            scored AS (
                SELECT tf.doc_id, tf.term, tf.tf,
                    round(tf.tf * (ln((n.n_docs + 1.0) / (dft.df_t + 1.0)) + 1.0), 6) AS score
                FROM tf JOIN dft USING (term) CROSS JOIN n
            )
            SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, score, CAST(rank AS INT) AS rank
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank
                FROM scored
            ) WHERE rank <= 5""",
        # PMI expression mirrors operators/ranking.collocations_topk term by
        # term ((c_xy/N_bi) / ((c_x/N_uni)*(c_y/N_uni))) so the ln/round(6)
        # replays bit-stably; DuckDB's BIGINT '/' is float division like
        # Spark's, so no explicit casts are needed
        "doc_collocations": r"""
            WITH tok AS (
                SELECT doc_id,
                    regexp_extract_all(lower(text), '[A-Za-z0-9]+') AS w
                FROM documents
            ),
            uc AS (
                SELECT term, count(*) AS c
                FROM (SELECT unnest(w) AS term FROM tok) GROUP BY 1
            ),
            bc AS (
                SELECT p['x'] AS x, p['y'] AS y, count(*) AS c_xy
                FROM (
                    SELECT unnest(list_transform(range(1, len(w)),
                        i -> struct_pack(
                            x := w[CAST(i AS INT)],
                            y := w[CAST(i AS INT) + 1]))) AS p
                    FROM tok WHERE len(w) >= 2
                ) GROUP BY 1, 2
            ),
            n1 AS (SELECT sum(c) AS n_uni FROM uc),
            n2 AS (SELECT sum(c_xy) AS n_bi FROM bc),
            cscored AS (
                SELECT bc.x || ' ' || bc.y AS bigram,
                    CAST(bc.c_xy AS BIGINT) AS c_xy,
                    CAST(ux.c AS BIGINT) AS c_x,
                    CAST(uy.c AS BIGINT) AS c_y,
                    round(ln((bc.c_xy / n2.n_bi)
                        / ((ux.c / n1.n_uni) * (uy.c / n1.n_uni))), 6) AS pmi
                FROM bc
                JOIN uc ux ON ux.term = bc.x
                JOIN uc uy ON uy.term = bc.y
                CROSS JOIN n1 CROSS JOIN n2
                WHERE bc.c_xy >= 5
            )
            SELECT bigram, c_xy, c_x, c_y, pmi, CAST(rank AS INT) AS rank
            FROM (
                SELECT *, row_number() OVER (
                    ORDER BY pmi DESC, bigram ASC) AS rank
                FROM cscored
            ) WHERE rank <= 100""",
        "dedup_exact": r"""
            WITH fp AS (
                SELECT doc_id,
                    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp_md5
                FROM documents
            ),
            c AS (SELECT fp_md5, min(doc_id) AS canonical_id FROM fp GROUP BY fp_md5)
            SELECT f.doc_id, f.fp_md5, c.canonical_id,
                   f.doc_id <> c.canonical_id AS is_duplicate
            FROM fp f JOIN c USING (fp_md5)""",
        "dedup_ngram_jaccard": r"""
            WITH g AS (
                SELECT doc_id AS id, source AS block,
                    list_distinct(CASE WHEN len(w) >= 2
                        THEN list_transform(range(1, len(w)),
                                 i -> w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1])
                        ELSE CAST([] AS VARCHAR[]) END) AS grams
                FROM (SELECT doc_id, source,
                          regexp_extract_all(lower(text), '[A-Za-z0-9]+') AS w
                      FROM documents)
            ),
            p AS (
                SELECT a.id AS id_a, b.id AS id_b,
                    round(len(list_intersect(a.grams, b.grams))
                        / CAST(greatest(len(list_distinct(list_concat(a.grams, b.grams))), 1) AS DOUBLE),
                        6) AS jaccard
                FROM g a JOIN g b ON a.block = b.block AND a.id < b.id
            )
            SELECT * FROM p WHERE jaccard >= 0.05""",
        # engine-hash replay oracles (see email_address_parser_spark/oracles.py):
        # the fixed-seed minhash/simhash/hyperplane kernels re-computed in pure
        # DuckDB SQL from the same Python constants
        "dedup_minhash": _oracles.dedup_minhash_oracle(threshold=0.2, max_bucket=64),
        "dedup_simhash": _oracles.dedup_simhash_oracle(max_hamming=3),
        "ann_topk_lsh": _oracles.ann_topk_lsh_oracle(ANN_QUERY_IDS, k=10),
        "ann_topk_ivf": _oracles.ann_topk_ivf_oracle(
            ANN_QUERY_IDS, k=10, n_centroids=16, n_probe=4
        ),
        # incremental fold == full re-index: same full-corpus SQL
        "ann_topk_ivf_incr": _oracles.ann_topk_ivf_oracle(
            ANN_QUERY_IDS, k=10, n_centroids=16, n_probe=4
        ),
        "ann_topk": r"""
            WITH n AS (
                SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
                FROM (SELECT vec_id,
                          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                      FROM embeddings)
            ),
            q AS (
                SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM n
                WHERE vec_id IN (0,1,2,3,4,5,6,7,8,9)
            ),
            s AS (
                SELECT query_id, n.vec_id AS neighbor_id,
                    round(list_sum(list_transform(range(1, len(qv) + 1),
                              i -> qv[CAST(i AS INT)] * v[CAST(i AS INT)]))
                          / greatest(qnrm * nrm, 1e-12), 6) AS cosine
                FROM q JOIN n ON n.vec_id <> q.query_id
            ),
            r AS (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
                FROM s
            )
            SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
            FROM r WHERE rank <= 10""",
        "emb_near_dup": r"""
            WITH n AS (
                SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
                FROM (SELECT vec_id,
                          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                      FROM embeddings)
            ),
            s AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                    round(list_sum(list_transform(range(1, len(a.v) + 1),
                              i -> a.v[CAST(i AS INT)] * b.v[CAST(i AS INT)]))
                          / greatest(a.nrm * b.nrm, 1e-12), 6) AS cosine
                FROM n a JOIN n b ON a.vec_id < b.vec_id
            )
            SELECT * FROM s WHERE cosine >= 0.4""",
        # replay of the deterministic pixel law (multimodal.py): Spark
        # computes these features from REAL decoded PNG bytes; DuckDB
        # regenerates the pixels arithmetically. Equality certifies the
        # decode because the codec round trip is byte-true (test_png.py).
        "mm_features": r"""
            WITH d AS (
                SELECT doc_id, doc_id % 24 + 8 AS w, (doc_id * 3) % 16 + 8 AS h
                FROM documents
            ), p AS (
                SELECT doc_id, w, h, unnest(range(0, w * h)) AS i FROM d
            ), px AS (
                SELECT doc_id, w, h, i, (doc_id * 7 + i * 13) % 256 AS pix FROM p
            )
            SELECT doc_id,
                CAST(w AS INT) AS width,
                CAST(h AS INT) AS height,
                CAST(w * h AS BIGINT) AS n_pixels,
                CAST(sum((i + 1) * pix) AS BIGINT) AS checksum,
                CAST(sum(pix) // (w * h) AS INT) AS mean_lum,
                CAST((w + 7) // 8 AS INT) AS thumb_w,
                CAST((h + 7) // 8 AS INT) AS thumb_h,
                CAST(sum(CASE WHEN (i % w) % 8 = 0 AND (i // w) % 8 = 0
                         THEN pix ELSE 0 END) AS BIGINT) AS thumb_checksum
            FROM px GROUP BY doc_id, w, h""",
        "mm_metadata": r"""
            SELECT doc_id,
                CAST(doc_id % 24 + 8 AS INT) AS width,
                CAST((doc_id * 3) % 16 + 8 AS INT) AS height,
                'image/png' AS mime
            FROM documents""",
        "doc_splits": _oracles.doc_splits_oracle(),
        "dedup_semantic": _oracles.dedup_semantic_oracle(
            threshold=0.3, n_centroids=16
        ),
        "doc_sample_weighted": _oracles.doc_sample_weighted_oracle(n=100),
        "doc_sample_stratified": _oracles.doc_sample_stratified_oracle(
            n_per_stratum=10
        ),
        "doc_packing": _oracles.doc_packing_oracle(budget=2048),
        "doc_redact": _redact_oracle(),
        "doc_decontam": _oracles.doc_decontam_oracle(),
        "doc_curation": _oracles.doc_curation_oracle(),
        "dedup_keep_best": _oracles.dedup_keep_best_oracle(threshold=0.6),
        "dedup_keep_best_lsh": _oracles.dedup_keep_best_lsh_oracle(
            threshold=0.2, max_bucket=64
        ),
        # incremental fold == full re-dedup: same full-corpus SQL
        "dedup_keep_best_incr": _oracles.dedup_keep_best_lsh_oracle(
            threshold=0.2, max_bucket=64
        ),
        "domain_kmv": _oracles.domain_kmv_oracle(MENTIONS_EXPECTED_CTE, k=64),
        "mm_frames": r"""
            WITH f AS (
                SELECT doc_id, text,
                    unnest(range(1, CAST(floor((length(text) - 1) / 16.0) AS BIGINT) + 2)) AS i
                FROM documents WHERE length(text) >= 1
            )
            SELECT doc_id, CAST(i - 1 AS INT) AS frame_idx,
                ord(substr(text, CAST((i - 1) * 16 + 1 AS INT), 1)) AS frame_code
            FROM f""",
    }


# ---------------------------------------------------------------------------
# driver check-window rotation
# ---------------------------------------------------------------------------
# The driver's per-round CORRECTNESS check covers a finite prefix of the
# `queries()` dict (~50 entries in round 4, growing ~7/round).  With 92
# registered queries, a fixed registry order would leave the same tail
# permanently outside the driver's window.  Policy (round 5+): order the
# registry by *least-recently driver-checked first* — queries never seen in
# any CORRECTNESS_r*.json lead, then those last checked longest ago, then the
# most recently checked.  The order below was derived from
# CORRECTNESS_r01..r04.json (17 never-checked, 25 last checked in r3, 50
# checked in r4, keeping each group's original thematic order).  Every key
# must appear in BOTH `_queries_impl()` and `_oracle_sql_impl()`; the
# wrappers assert full coverage so a future query added to one literal but
# not the rotation list is still served (appended at the end) rather than
# silently dropped.
_DRIVER_CHECK_ORDER = [
    # -- new in round 5 (never checked anywhere) ---------------------------
    "er_trained_match_f1",
    "er_phonetic_pairs",
    "er_phonetic_blocks",
    # -- never driver-checked through round 4 (judge-verified only) --------
    "events_quantiles", "events_pivot", "events_props_stats", "events_funnel",
    "events_retention", "doc_repetition", "doc_tfidf_topk", "doc_collocations",
    "dedup_semantic", "doc_curation", "doc_sample_weighted",
    "doc_sample_stratified", "er_metablocking", "er_fs_weights",
    "er_fs_match_f1", "er_snm_pairs", "er_domain_aliases",
    # -- last driver-checked in round 3 ------------------------------------
    "doc_token_counts", "doc_quality", "doc_lang_id", "doc_fingerprints",
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash", "dedup_simhash",
    "ann_topk", "ann_topk_lsh", "ann_topk_ivf", "ann_topk_ivf_incr",
    "emb_near_dup", "mm_features", "mm_metadata", "mm_frames", "doc_splits",
    "doc_packing", "doc_redact", "doc_decontam", "dedup_keep_best",
    "dedup_keep_best_lsh", "dedup_keep_best_incr", "er_blocking_metrics",
    "domain_kmv",
    # -- driver-checked in round 4 (most recent) ---------------------------
    "er_mentions", "er_mentions_by_domain", "er_candidate_pairs",
    "er_pair_features", "er_edges", "er_hard_negatives", "er_clusters",
    "er_roundtrip", "er_cluster_sizes", "er_match_f1", "er_threshold_sweep",
    "er_mention_provenance", "er_block_skew", "er_entity_activity",
    "er_bcubed", "er_comention", "er_channel_contribution",
    "er_golden_record", "er_cluster_density", "er_golden_record_incr",
    "er_incremental", "er_incremental_fold", "er_forget",
    "er_threshold_clusters", "er_merge_tree", "er_constrained_split",
    "er_must_link_merge", "er_best_match_clusters", "er_ari", "er_muc",
    "er_collective_clusters", "er_pprl_pairs", "er_pprl_match_f1",
    "er_pprl_blocking_metrics", "er_pprl_e2e_f1", "er_pprl_sweep",
    "er_pprl_anonymity", "er_clustering_compare", "er_pprl_index_incr",
    "er_clusters_diff_golden", "er_membership_history", "q1_pricing_summary",
    "q3_shipping_priority", "top_order_per_customer", "region_customer_rollup",
    "orders_without_lineitem", "events_daily", "events_sessions",
    "events_last_touch", "events_rolling",
]


def _rotate(d):
    # a stale name here (renamed/deleted query) would silently defeat the
    # least-recently-checked policy — fail loudly instead
    missing = [k for k in _DRIVER_CHECK_ORDER if k not in d]
    assert not missing, f"_DRIVER_CHECK_ORDER names unknown queries: {missing}"
    out = {k: d[k] for k in _DRIVER_CHECK_ORDER}
    out.update({k: v for k, v in d.items() if k not in out})
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _rotate(_queries_impl())


def oracle_sql() -> dict[str, str]:
    return _rotate(_oracle_sql_impl())
