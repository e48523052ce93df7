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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
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
        "er_clusters": lambda spark, sf: (
            lambda m: cluster_mentions(m, match_edges(score_pairs(
                candidate_pairs(m, hot_threshold=1 << 40)
            )))
        )(_mentions(spark, sf)),
        "er_cluster_sizes": lambda spark, sf: (
            lambda m: cluster_mentions(m, match_edges(score_pairs(
                candidate_pairs(m, hot_threshold=1 << 40)
            )))
        )(_mentions(spark, sf))
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_members")),
        # --- generic relational operators (F4, F8, F12-F14) ----------------
        "q1_pricing_summary": _q1_pricing_summary,
        "q3_shipping_priority": _q3_shipping_priority,
        "top_order_per_customer": _top_order_per_customer,
        "region_customer_rollup": _region_customer_rollup,
        "orders_without_lineitem": _orders_without_lineitem,
        "events_daily": _events_daily,
    }


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


# ---------------------------------------------------------------------------
# oracles (DuckDB SQL over the same parquet views)
# ---------------------------------------------------------------------------

_ORACLE_PAIRS = MENTIONS_EXPECTED_CTE + """,
uniq AS (
    SELECT DISTINCT email, local_canon, domain_canon
    FROM mentions_expected WHERE valid_lax
),
pairs AS (
    SELECT a.email AS email_a, b.email AS email_b,
           a.local_canon AS local_canon_a, b.local_canon AS local_canon_b,
           a.domain_canon AS domain_canon_a, b.domain_canon AS domain_canon_b
    FROM uniq a JOIN uniq b
      ON a.domain_canon = b.domain_canon AND a.email < b.email
),
features AS (
    SELECT email_a, email_b,
        jaro_winkler_similarity(local_canon_a, local_canon_b) AS jw_local,
        CAST(levenshtein(local_canon_a, local_canon_b) AS INT) AS lev_local,
        CAST(levenshtein(domain_canon_a, domain_canon_b) AS INT) AS dom_edit,
        CASE WHEN replace(local_canon_a, '.', '') = replace(local_canon_b, '.', '')
             THEN 1.0 ELSE 0.0 END AS dotless_eq,
        greatest(length(local_canon_a), length(local_canon_b), 1) AS _mll,
        greatest(length(domain_canon_a), length(domain_canon_b), 1) AS _mdl
    FROM pairs
),
scored AS (
    SELECT email_a, email_b, jw_local, lev_local, dom_edit, dotless_eq,
        round(0.35 * jw_local + 0.20 * (1.0 - lev_local / _mll)
              + 0.25 * (1.0 - dom_edit / _mdl) + 0.20 * dotless_eq, 6) AS score
    FROM features
)
"""

_ORACLE_CLUSTERS = MENTIONS_EXPECTED_CTE + """,
uniq AS (
    SELECT DISTINCT email, match_key FROM mentions_expected WHERE valid_lax
),
clusters AS (
    SELECT email, min(email) OVER (PARTITION BY match_key) AS cluster_id FROM uniq
)
"""


def oracle_sql() -> dict[str, str]:
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
        "er_edges": _ORACLE_PAIRS
        + """SELECT email_a AS src, email_b AS dst, score FROM scored
             WHERE score >= 0.90""",
        "er_clusters": _ORACLE_CLUSTERS + "SELECT email, cluster_id FROM clusters",
        "er_cluster_sizes": _ORACLE_CLUSTERS
        + """SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members
             FROM clusters GROUP BY cluster_id""",
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
    }
