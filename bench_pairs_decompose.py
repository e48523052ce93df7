#!/usr/bin/env python
"""Decompose er_pairs_scored at the bench config: generation-only vs
score-over-persisted-pairs, plus per-channel pair volumes."""
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
    app_name="pairs-decompose",
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


def timed(name, fn, reps=3):
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        vals.append(round(time.perf_counter() - t0, 2))
    print(json.dumps({name: vals, "best": min(vals)}), flush=True)


def cp(**kw):
    return candidate_pairs(mentions, hot_threshold=HOT, target_block_size=BLK, **kw)


# warmup
_force(score_pairs(cp()))

# volumes per channel config
for name, kw in [
    ("n_ch1", dict(use_lsh=False, use_cross_domain=False)),
    ("n_ch12", dict(use_cross_domain=False)),
    ("n_ch123", dict(use_email_lsh=False)),
    ("n_ch1234", {}),
]:
    print(json.dumps({name: cp(**kw).count()}), flush=True)

timed("gen_ch12", lambda: _force(cp(use_cross_domain=False)))
timed("gen_ch123", lambda: _force(cp(use_email_lsh=False)))
timed("gen_ch1234", lambda: _force(cp()))

pairs_c = cp().persist()
print("pairs_persisted:", pairs_c.count(), flush=True)
timed("score_only", lambda: _force(score_pairs(pairs_c)))
timed("scored_e2e", lambda: _force(score_pairs(cp())))
spark.stop()
