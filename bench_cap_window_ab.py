#!/usr/bin/env python
"""Pinned A/B: bucket-cap plan shape in candidate_pairs — groupBy-sizes +
join-back (agg) vs window count over the exploded table (window). The window
variant leaves the data hash-partitioned on the self-join key, so the SMJ can
reuse the exchange instead of re-shuffling both sides. Interleaved reps."""
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
    app_name="cap-window-ab",
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


def cp(via):
    return candidate_pairs(
        mentions, hot_threshold=HOT, target_block_size=BLK, cap_via_window=via
    )


# identical output check first (cheap at the generation layer)
n_agg = cp(False).count()
n_win = cp(True).count()
print(json.dumps({"n_agg": n_agg, "n_win": n_win, "equal": n_agg == n_win}), flush=True)
assert n_agg == n_win

# warmup both full chains
_force(score_pairs(cp(False)))
_force(score_pairs(cp(True)))

res = {"gen_agg": [], "gen_win": [], "scored_agg": [], "scored_win": []}
for _ in range(3):
    for name, fn in [
        ("gen_agg", lambda: _force(cp(False))),
        ("gen_win", lambda: _force(cp(True))),
        ("scored_agg", lambda: _force(score_pairs(cp(False)))),
        ("scored_win", lambda: _force(score_pairs(cp(True)))),
    ]:
        t0 = time.perf_counter()
        fn()
        res[name].append(round(time.perf_counter() - t0, 2))
print(json.dumps(res), flush=True)
print(json.dumps({k: min(v) for k, v in res.items()}), flush=True)
spark.stop()
