#!/usr/bin/env python
"""One-off diagnostic: per-channel cost of candidate_pairs at sf0.1."""
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

os.makedirs("/dev/shm/spark-local", exist_ok=True)
spark = build_session(
    app_name="profile-channels",
    cores=32,
    shuffle_partitions=64,
    extra_conf={"spark.local.dir": "/dev/shm/spark-local"},
)
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
t = derive_transcripts(spark, sf_dir)
mentions = with_canonical(extract_mentions(t)).persist()
print("mentions:", mentions.count(), flush=True)


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def timed(name, fn, reps=2):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(json.dumps({name: round(best, 2)}), flush=True)


# warmup all UDFs
_force(score_pairs(candidate_pairs(mentions)))

timed("ch12_only", lambda: _force(candidate_pairs(mentions, use_cross_domain=False)))
timed(
    "ch123",
    lambda: _force(
        candidate_pairs(mentions, use_cross_domain=True, use_email_lsh=False)
    ),
)
timed("ch1234", lambda: _force(candidate_pairs(mentions)))
timed(
    "scored_ch12",
    lambda: _force(score_pairs(candidate_pairs(mentions, use_cross_domain=False))),
)
timed("scored_ch1234", lambda: _force(score_pairs(candidate_pairs(mentions))))

# pair volumes per channel config
for name, kw in [
    ("n_ch12", dict(use_cross_domain=False)),
    ("n_ch123", dict(use_cross_domain=True, use_email_lsh=False)),
    ("n_ch1234", {}),
]:
    print(json.dumps({name: candidate_pairs(mentions, **kw).count()}), flush=True)
spark.stop()
