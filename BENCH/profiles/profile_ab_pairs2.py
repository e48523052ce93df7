#!/usr/bin/env python
"""Three-way pinned A/B: old overlapping-channels plan vs new disjoint plan
vs new disjoint plan with the blocked dim persisted (shared across the five
subtree references). Full er_pairs_scored work, best-of-3 interleaved."""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..', '..')))

from email_address_parser_spark.operators.blocking import (
    _unique_mentions,
    candidate_pairs,
    minhash_bands_udf,
    with_salted_domain_block,
)
from email_address_parser_spark.operators.extract import extract_mentions, with_canonical
from email_address_parser_spark.operators.scoring import score_pairs
from email_address_parser_spark.session import build_session
from email_address_parser_spark.sources.testdata import derive_transcripts
from profile_ab_pairs import HOT, TGT, CAP, old_candidate_pairs


def new_persist_pairs(mentions, dedupe=True):
    blocked = with_salted_domain_block(
        _unique_mentions(mentions), HOT, TGT
    ).persist()

    def self_join(df, key, cross_block=False):
        a, b = df.alias("a"), df.alias("b")
        cond = F.col("a.email") < F.col("b.email")
        if cross_block:
            cond = cond & (F.col("a.block_key") != F.col("b.block_key"))
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
    with_bands = blocked.select(
        "email", "local_canon", "domain_canon", "block_key",
        F.posexplode(minhash_bands_udf(F.col("local_canon"))).alias(
            "band_idx", "band_sig"
        ),
    )
    bucket_sizes = with_bands.groupBy("band_idx", "band_sig").agg(
        F.count(F.lit(1)).alias("_bn")
    )
    bounded = with_bands.join(
        bucket_sizes.where(F.col("_bn") <= CAP), ["band_idx", "band_sig"]
    )
    lsh_pairs = self_join(
        bounded, ["band_idx", "band_sig", "domain_canon"], cross_block=True
    )
    if dedupe:
        lsh_pairs = lsh_pairs.dropDuplicates(["email_a", "email_b"])
    return pairs.unionByName(lsh_pairs), blocked


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    spark = build_session(
        app_name="ab-pairs2",
        cores=32,
        shuffle_partitions=64,
        extra_conf={
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
            "spark.local.dir": "/dev/shm/spark-local",
        },
    )
    transcripts = derive_transcripts(spark, sf_dir).persist()
    transcripts.count()
    mentions = with_canonical(extract_mentions(transcripts)).persist()
    mentions.count()
    _force(score_pairs(candidate_pairs(mentions.limit(2000), HOT, TGT)))  # warm

    dfp, blocked = new_persist_pairs(mentions)
    n_p = dfp.count()
    blocked.unpersist()
    print(f"rows persist-variant={n_p}")

    times = {"old": [], "new": [], "new+persist": []}
    for _ in range(3):
        t0 = time.perf_counter()
        _force(score_pairs(old_candidate_pairs(mentions)))
        times["old"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        _force(score_pairs(candidate_pairs(mentions, HOT, TGT)))
        times["new"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        dfp, blocked = new_persist_pairs(mentions)
        _force(score_pairs(dfp))
        blocked.unpersist()
        times["new+persist"].append(time.perf_counter() - t0)
    for k, v in times.items():
        print(f"{k}: runs={[round(x, 2) for x in v]} best={min(v):.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
