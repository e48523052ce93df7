#!/usr/bin/env python
"""Pinned same-session A/B: lazy vs eager materialization of the blocked
distinct-email dim under the 4-channel candidate_pairs + score_pairs chain.

Hypothesis (round-4 profiling): AQE submits the leaf exchange stages of all
four channels concurrently at query start; every stage that begins before the
persisted dim's cache is populated recomputes the dim subtree (distinct +
hot-domain agg + salt + two banding UDFs). Eagerly count()-ing the dim once
serializes that work into one small job.

Interleaved reps (A B A B A B) so drift hits both arms equally.
"""
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

HOT_THRESHOLD = 200
TARGET_BLOCK = 64

os.makedirs("/dev/shm/spark-local", exist_ok=True)
spark = build_session(
    app_name="eager-dim-ab",
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


def run(eager: bool) -> float:
    t0 = time.perf_counter()
    _force(
        score_pairs(
            candidate_pairs(
                mentions,
                hot_threshold=HOT_THRESHOLD,
                target_block_size=TARGET_BLOCK,
                eager=eager,
            )
        )
    )
    return time.perf_counter() - t0


# warmup both paths
run(False)
run(True)

res = {"lazy": [], "eager": []}
for _ in range(3):
    res["lazy"].append(round(run(False), 2))
    res["eager"].append(round(run(True), 2))
print(json.dumps(res), flush=True)
print(
    json.dumps({k: min(v) for k, v in res.items()}),
    flush=True,
)
spark.stop()
