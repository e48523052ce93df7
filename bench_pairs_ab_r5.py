#!/usr/bin/env python
"""Round-5 lead item: attribute the er_pairs_scored driver-bench regression
(r3 8.89 s -> r4 14.25 s) with a same-session interleaved A/B.

One process = one (code, channel-config) cell; the orchestrator (a shell
loop) runs cells in opposite-order pairs within the same box-hour so drift
cancels. Cells:

  r3     — round-3 code (git worktree @ 5f42f1c): channels 1/2 only AND the
           round-3 synth corpus (no cross-domain typo variants).
  c12    — HEAD code, channels 1/2 only (use_cross_domain=False,
           use_email_lsh=False): isolates corpus+code drift vs r3.
  c123   — HEAD code, + channel 3 (cross-domain exact-dotless-local).
  c1234  — HEAD code, all four channels (the shipping config): c1234-c123
           isolates the channel-4 full-email minhash UDF cost.

AB_CODE_DIR selects the codebase; the session config mirrors bench.py
byte-for-byte (32 cores, 64 shuffle partitions, 16m advisory, tmpfs local
dir) so only code + channel config vary.
"""
import json
import os
import sys
import time

mode = sys.argv[1]
code_dir = os.environ["AB_CODE_DIR"]
sys.path.insert(0, code_dir)

from pyspark.sql import functions as F

from email_address_parser_spark.operators.blocking import candidate_pairs
from email_address_parser_spark.operators.extract import (
    extract_mentions,
    with_canonical,
)
from email_address_parser_spark.operators.scoring import score_pairs
from email_address_parser_spark.session import build_session
from email_address_parser_spark.sources.testdata import derive_transcripts

HOT, BLK = 200, 64
KW = {
    "r3": {},
    "c12": dict(use_cross_domain=False, use_email_lsh=False),
    "c123": dict(use_email_lsh=False),
    "c1234": {},
}[mode]

os.makedirs("/dev/shm/spark-local", exist_ok=True)
spark = build_session(
    app_name=f"pairs-ab-{mode}",
    cores=32,
    shuffle_partitions=64,
    extra_conf={
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
        "spark.local.dir": "/dev/shm/spark-local",
    },
)
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
transcripts = derive_transcripts(spark, sf_dir).persist()
transcripts.count()
mentions_c = with_canonical(extract_mentions(transcripts)).persist()
n_mentions = mentions_c.count()


def _force(df):
    df.write.format("noop").mode("overwrite").save()


# warmup: same 2% chain as bench.py, with this cell's channel config
warm = with_canonical(
    extract_mentions(
        transcripts.where(F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(50)) == 0)
    )
)
_force(score_pairs(candidate_pairs(warm, hot_threshold=HOT, target_block_size=BLK, **KW)))

runs = []
for _ in range(3):
    t0 = time.perf_counter()
    _force(
        score_pairs(
            candidate_pairs(mentions_c, hot_threshold=HOT, target_block_size=BLK, **KW)
        )
    )
    runs.append(round(time.perf_counter() - t0, 2))

n_pairs = candidate_pairs(
    mentions_c, hot_threshold=HOT, target_block_size=BLK, **KW
).count()
print(
    json.dumps(
        {
            "mode": mode,
            "code": "r3" if mode == "r3" else "HEAD",
            "runs": runs,
            "best": min(runs),
            "n_mentions": n_mentions,
            "n_pairs": n_pairs,
        }
    ),
    flush=True,
)
spark.stop()
