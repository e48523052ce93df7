"""Iceberg table adapter (F1/F15 prod path).

The north rule reads/writes Iceberg at 10^12-turn scale; this sandbox has no
Iceberg runtime jar, so every engine module takes DataFrames and the
pipeline checkpoints to parquet. This adapter is the single seam where the
prod deployment differs: point `spark.sql.catalog.<name>` at an Iceberg
catalog (the standard spark-submit conf below) and pass `use_iceberg=True`
(or let `iceberg_available()` detect it).

    spark-submit \\
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \\
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \\
      --conf spark.sql.catalog.lake.type=rest \\
      --conf spark.sql.catalog.lake.uri=<catalog-uri> ...

Stage resume maps 1:1: "stage parquet dir + manifest" becomes "Iceberg table
+ its current snapshot" — `read_table` of a checkpointed stage is then a
snapshot read, and `snapshot_id` below records the lineage the sandbox
manifests emulate.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


ICEBERG_RUNTIME = "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13"


def iceberg_submit_conf(
    catalog: str = "lake",
    uri: str = "http://rest-catalog:8181",
    catalog_type: str = "rest",
    runtime_version: str = "1.9.0",
    spark_minor: str = "4.0",
    scala: str = "2.13",
) -> dict:
    """The spark-submit configuration that turns this seam on in prod (the
    docstring's recipe as data, so deploy tooling and tests consume one
    source of truth). Iceberg publishes one runtime artifact per (Spark
    MINOR, Scala) pair — pass the pair matching the cluster's Spark (e.g.
    spark_minor="3.5", scala="2.12"), not whatever this sandbox runs."""
    runtime = f"org.apache.iceberg:iceberg-spark-runtime-{spark_minor}_{scala}"
    return {
        "spark.jars.packages": f"{runtime}:{runtime_version}",
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": catalog_type,
        f"spark.sql.catalog.{catalog}.uri": uri,
    }


def iceberg_available(spark: SparkSession, catalog: str = "lake") -> bool:
    """True when an Iceberg catalog is configured on this session."""
    conf = spark.conf
    try:
        return "iceberg" in (conf.get(f"spark.sql.catalog.{catalog}", "") or "").lower()
    except Exception:  # pragma: no cover - defensive on exotic conf backends
        return False


def read_table(
    spark: SparkSession,
    location: str,
    use_iceberg: Optional[bool] = None,
    snapshot_id: Optional[int] = None,
) -> DataFrame:
    """location = 'catalog.db.table' (iceberg) or a parquet path (sandbox)."""
    if use_iceberg is None:
        use_iceberg = "." in location and iceberg_available(spark, location.split(".")[0])
    if use_iceberg:
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        return reader.load(location)
    return spark.read.parquet(location)


def write_table(
    df: DataFrame,
    location: str,
    mode: str = "overwrite",
    use_iceberg: Optional[bool] = None,
) -> None:
    if use_iceberg is None:
        use_iceberg = "." in location and iceberg_available(
            df.sparkSession, location.split(".")[0]
        )
    if use_iceberg:
        df.writeTo(location).createOrReplace() if mode == "overwrite" else df.writeTo(
            location
        ).append()
    else:
        df.write.mode(mode).parquet(location)


def current_snapshot_id(spark: SparkSession, table: str) -> Optional[int]:
    """Latest snapshot id of an Iceberg table (None when not iceberg) — the
    prod analog of the checkpoint manifest's identity."""
    if not iceberg_available(spark, table.split(".")[0]):
        return None
    row = spark.sql(
        f"SELECT snapshot_id FROM {table}.snapshots ORDER BY committed_at DESC LIMIT 1"
    ).collect()
    return int(row[0][0]) if row else None
