#!/usr/bin/env python
"""Pinned A/B: fused score_pairs(candidate_pairs(...)) vs staged
(persist pair set, then score the cached pairs). Arm B unpersists its pair
cache after each rep so arm A never hits a cache-substituted plan."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from email_address_parser_spark.operators.blocking import candidate_pairs
from email_address_parser_spark.operators.extract import (
    extract_mentions,
    with_canonical,
)
from email_address_parser_spark.operators.scoring import score_pairs
from email_address_parser_spark.session import build_session
from email_address_parser_spark.sources.testdata import derive_transcripts

HOT, BLK = 200, 64

os.makedirs("/dev/shm/spark-local", exist_ok=True)
spark = build_session(
    app_name="fuse-vs-stage-ab",
    cores=32,
    shuffle_partitions=64,
    extra_conf={
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
        "spark.local.dir": "/dev/shm/spark-local",
    },
)
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
mentions = with_canonical(extract_mentions(derive_transcripts(spark, sf_dir))).persist()
print("mentions:", mentions.count(), flush=True)


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def cp():
    return candidate_pairs(mentions, hot_threshold=HOT, target_block_size=BLK)


def fused():
    _force(score_pairs(cp()))


def staged():
    p = cp().persist()
    _force(p)
    _force(score_pairs(p))
    p.unpersist()


# warmup both
fused()
staged()

res = {"fused": [], "staged": []}
for _ in range(3):
    t0 = time.perf_counter()
    fused()
    res["fused"].append(round(time.perf_counter() - t0, 2))
    t0 = time.perf_counter()
    staged()
    res["staged"].append(round(time.perf_counter() - t0, 2))
print(json.dumps(res), flush=True)
print(json.dumps({k: min(v) for k, v in res.items()}), flush=True)
spark.stop()
