"""SparkSession factory with scale-oriented defaults.

Local-mode here (the sandbox tests on local[N]); the same configs are the ones
that matter on a 1000-executor cluster: AQE with skew-join splitting for the
hot-domain blocking self-join, Arrow batching for the pandas-UDF parse kernel,
and explicit shuffle-partition sizing.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "email-address-parser-spark",
    cores: Optional[str | int] = None,
    shuffle_partitions: Optional[int] = None,
    extra_conf: Optional[dict] = None,
) -> SparkSession:
    cores = str(cores or os.environ.get("SPARK_GRAFT_CPUS", "*"))
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        # AQE: runtime re-plan, skew-join splitting, partition coalescing — the
        # mechanisms that keep the blocking self-join healthy on skewed domains
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow: the JVM<->Python boundary is crossed per batch, not per row
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # deterministic timestamps across engines (oracle parity)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # plan STRINGS, not plans, are the memory hazard on deep dataflow
        # graphs: treeString expands every shared-subtree reference, so a
        # fold plan that references MoR-resolved state tables a dozen times
        # prints multiplicatively larger than it executes. Spark's default
        # cap is ~2^31 (unbounded in practice) and the QueryExecution
        # listeners build these strings even with the UI off — measured: an
        # 8 GB heap OOMed inside StringConcat.append during a chained
        # streaming fold. 8 MB keeps any diagnostic string useful and
        # harmless.
        .config("spark.sql.maxPlanStringLength", str(8 * 1024 * 1024))
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
