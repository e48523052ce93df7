#!/usr/bin/env python
"""Pinned A/B for the meta-blocking plan (G53): baseline (groupBy-sizes
purge + unpinned edges) vs window-count purge (ONE exchange on `key`, reused
by the CBS self-join — the same shape bench_cap_window_ab.py measured for the
candidate channels) + lazily pinned edges (referenced 3x: two WNP incidence
unions and the final join). Interleaved reps."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import Window
from pyspark.sql import functions as F

from email_address_parser_spark.operators.blocking import uniq_valid_mentions
from email_address_parser_spark.operators.extract import extract_mentions, with_canonical
from email_address_parser_spark.operators.metablocking import (
    DEFAULT_MAX_BLOCK,
    entity_block_keys,
    metablock_pairs,
)
from email_address_parser_spark.session import build_session
from email_address_parser_spark.sources.testdata import derive_transcripts

os.makedirs("/dev/shm/spark-local", exist_ok=True)
spark = build_session(
    app_name="metablock-ab",
    cores=32,
    shuffle_partitions=64,
    extra_conf={"spark.local.dir": "/dev/shm/spark-local"},
)
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
uniq = uniq_valid_mentions(
    with_canonical(extract_mentions(derive_transcripts(spark, sf_dir)))
).persist()
print("uniq:", uniq.count(), flush=True)


def candidate(max_block=DEFAULT_MAX_BLOCK):
    ek = entity_block_keys(uniq)
    w = Window.partitionBy("key")
    ek = (
        ek.withColumn("_n", F.count(F.lit(1)).over(w))
        .where(F.col("_n") <= max_block)
        .drop("_n")
    )
    a = ek.select("key", F.col("email").alias("email_a"))
    b = ek.select("key", F.col("email").alias("email_b"))
    edges = (
        a.join(b, "key")
        .where(F.col("email_a") < F.col("email_b"))
        .groupBy("email_a", "email_b")
        .agg(F.count(F.lit(1)).alias("w"))
        .localCheckpoint(eager=False)
    )
    incid = edges.select(F.col("email_a").alias("email"), "w").unionByName(
        edges.select(F.col("email_b").alias("email"), "w")
    )
    means = incid.groupBy("email").agg(
        (F.sum("w").cast("double") / F.count(F.lit(1))).alias("mean_w")
    )
    return (
        edges.join(
            means.select(F.col("email").alias("email_a"), F.col("mean_w").alias("mean_a")),
            "email_a",
        )
        .join(
            means.select(F.col("email").alias("email_b"), F.col("mean_w").alias("mean_b")),
            "email_b",
        )
        .select(
            "email_a", "email_b", "w",
            ((F.col("w") >= F.col("mean_a")) | (F.col("w") >= F.col("mean_b"))).alias("kept"),
        )
    )


def _force(df):
    df.write.format("noop").mode("overwrite").save()


n_base = metablock_pairs(uniq).count()
n_cand = candidate().count()
print(json.dumps({"n_base": n_base, "n_cand": n_cand, "equal": n_base == n_cand}), flush=True)
assert n_base == n_cand
k_base = metablock_pairs(uniq).where("kept").count()
k_cand = candidate().where("kept").count()
assert k_base == k_cand, (k_base, k_cand)

_force(metablock_pairs(uniq)); _force(candidate())
res = {"base": [], "cand": []}
for _ in range(3):
    t0 = time.perf_counter(); _force(metablock_pairs(uniq)); res["base"].append(round(time.perf_counter() - t0, 2))
    t0 = time.perf_counter(); _force(candidate()); res["cand"].append(round(time.perf_counter() - t0, 2))
print(json.dumps(res), flush=True)
print(json.dumps({k: min(v) for k, v in res.items()}), flush=True)
