"""The SQL surface must agree with the DataFrame surface (same plans)."""

from __future__ import annotations


def test_sql_views_agree_with_dataframes(spark):
    from email_address_parser_spark.sql_views import register_er_views

    views = register_er_views(spark, "/root/testdata/sf0.001", with_clusters=True)
    assert "er_clusters" in views

    by_domain = spark.sql(
        """SELECT domain_canon, count(*) AS n
           FROM er_mentions WHERE valid_lax
           GROUP BY domain_canon ORDER BY domain_canon"""
    ).collect()
    # five market segments -> five base domains, plus the variant-4
    # domain-typo twin of each (first char dropped, sources/testdata.py)
    domains = {r.domain_canon for r in by_domain}
    assert len(by_domain) == 10
    bases = {d for d in domains if not any(d == o[1:] for o in domains)}
    assert len(bases) == 5
    assert domains == bases | {b[1:] for b in bases}
    assert all(r.n > 0 for r in by_domain)

    joined = spark.sql(
        """SELECT count(*) AS n FROM er_clusters c
           JOIN er_uniq u ON c.email = u.email"""
    ).collect()[0].n
    n_uniq = spark.sql("SELECT count(*) AS n FROM er_uniq").collect()[0].n
    assert joined == n_uniq  # every distinct valid email is clustered

    stars = spark.sql(
        "SELECT count(*) AS n FROM er_star_edges WHERE src >= dst"
    ).collect()[0].n
    assert stars == 0  # root is always the minimum of its group

    golden = spark.sql(
        """SELECT count(*) AS n_clusters,
                  sum(n_members) AS total_members,
                  min(top_domain_mentions) AS min_top
           FROM er_golden_records"""
    ).collect()[0]
    n_clusters = spark.sql(
        "SELECT count(DISTINCT cluster_id) AS n FROM er_clusters"
    ).collect()[0].n
    assert golden.n_clusters == n_clusters  # one golden record per cluster
    assert golden.total_members == n_uniq   # members partition the emails
    assert golden.min_top >= 1

    hist = spark.sql(
        """SELECT count(*) AS n,
                  sum(CASE WHEN is_current THEN 1 ELSE 0 END) AS n_open,
                  max(valid_from) AS max_from
           FROM er_membership_history"""
    ).collect()[0]
    assert hist.n == n_uniq == hist.n_open  # snapshot: one open row per email
    assert hist.max_from == 0
    agree = spark.sql(
        """SELECT count(*) AS n FROM er_membership_history h
           JOIN er_clusters c ON h.email = c.email
           WHERE h.cluster_id = c.cluster_id AND h.is_current"""
    ).collect()[0].n
    assert agree == n_uniq  # open rows mirror the clustering

    tree = spark.sql(
        """SELECT count(*) AS n,
                  sum(CASE WHEN depth = 0 THEN 1 ELSE 0 END) AS n_roots,
                  sum(CASE WHEN depth > 0 AND parent IS NULL
                      THEN 1 ELSE 0 END) AS orphans
           FROM er_merge_tree"""
    ).collect()[0]
    assert tree.n == n_uniq          # the forest spans every clustered email
    assert tree.n_roots == n_clusters  # exactly one root per cluster
    assert tree.orphans == 0         # every non-root hop has a parent
    tree_agree = spark.sql(
        """SELECT count(*) AS n FROM er_merge_tree t
           JOIN er_clusters c ON t.email = c.email
           WHERE t.cluster_id = c.cluster_id"""
    ).collect()[0].n
    assert tree_agree == n_uniq      # tree rows mirror the clustering


def test_clk_masks_view_is_privacy_preserving_and_usable(spark):
    """The G67 SQL surface: er_clk_masks exposes only (opaque sha-256
    surrogate, packed filter words, popcount) — NO plaintext column and no
    reversible derivation of one — yet pure-SQL Dice over it reproduces
    the operator (identical dotless locals → identical masks → dice 1.0;
    the encoder party, which holds the sid mapping, joins back to verify).
    """
    from email_address_parser_spark.sql_views import register_er_views

    register_er_views(spark, "/root/testdata/sf0.001")
    cols = {f.name for f in spark.table("er_clk_masks").schema.fields}
    assert cols == {"sid", "m0", "m1", "m2", "m3", "n"}

    # SQL-side Dice between the two dot-variants of one local: the dotless
    # canon is equal, so the filters are identical and dice = 1.0. The
    # test plays the ENCODER party, recomputing sids from er_uniq; the
    # matcher party never could (sha-256 of the plaintext it lacks).
    row = spark.sql(
        """
        WITH sids AS (
            SELECT email, local_canon,
                   sha2(concat('sid:', email), 256) AS sid
            FROM er_uniq
        )
        SELECT round(2.0 * (bit_count(a.m0 & b.m0) + bit_count(a.m1 & b.m1)
                     + bit_count(a.m2 & b.m2) + bit_count(a.m3 & b.m3))
               / (a.n + b.n), 6) AS dice
        FROM er_clk_masks a
        JOIN er_clk_masks b ON a.sid < b.sid
        JOIN sids ua ON ua.sid = a.sid
        JOIN sids ub ON ub.sid = b.sid
        WHERE ua.email <> ub.email
          AND replace(ua.local_canon, '.', '') = replace(ub.local_canon, '.', '')
        LIMIT 1
        """
    ).collect()
    assert row and row[0].dice == 1.0
