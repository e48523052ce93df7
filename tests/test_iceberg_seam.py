"""The Iceberg seam (sources/iceberg.py): sandbox routing must fall back to
parquet when no catalog is configured, and the prod conf builder must emit
the documented catalog keys (round-2 VERDICT item 9)."""

from __future__ import annotations

from pyspark.sql import Row


def test_no_catalog_falls_back_to_parquet(spark, tmp_path):
    from email_address_parser_spark.sources.iceberg import (
        iceberg_available,
        read_table,
        write_table,
    )

    assert iceberg_available(spark) is False
    df = spark.createDataFrame([Row(a=1, b="x"), Row(a=2, b="y")])
    loc = str(tmp_path / "seam_tbl")
    write_table(df, loc)  # use_iceberg unresolved -> parquet path
    got = read_table(spark, loc)
    assert sorted(map(tuple, got.collect())) == [(1, "x"), (2, "y")]
    # append mode routes through parquet too
    write_table(df, loc, mode="append")
    assert read_table(spark, loc).count() == 4


def test_dotted_location_without_catalog_still_parquet(spark, tmp_path):
    """A 'db.table'-looking path must not trip the iceberg branch when no
    catalog is configured (iceberg_available gates the dotted heuristic)."""
    from email_address_parser_spark.sources.iceberg import read_table, write_table

    df = spark.createDataFrame([Row(a=7)])
    loc = str(tmp_path / "v1.0_tbl")  # contains a dot
    write_table(df, loc)
    assert read_table(spark, loc).collect()[0].a == 7


def test_submit_conf_emits_documented_catalog_keys():
    from email_address_parser_spark.sources.iceberg import iceberg_submit_conf

    conf = iceberg_submit_conf(catalog="lake", uri="http://cat:8181")
    assert conf["spark.sql.catalog.lake"] == "org.apache.iceberg.spark.SparkCatalog"
    assert conf["spark.sql.catalog.lake.type"] == "rest"
    assert conf["spark.sql.catalog.lake.uri"] == "http://cat:8181"
    assert "iceberg-spark-runtime" in conf["spark.jars.packages"]


def test_snapshot_id_none_without_catalog(spark):
    from email_address_parser_spark.sources.iceberg import current_snapshot_id

    assert current_snapshot_id(spark, "lake.db.tbl") is None
