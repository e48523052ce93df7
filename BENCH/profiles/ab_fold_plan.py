"""Same-session pinned A/B: fold_batch with persist()-embedded lineage
(LINEAGE_PIN_MODE="persist") vs lazy-localCheckpoint truncation
("checkpoint", the shipped default). Identical state dir, identical batch,
alternating order, best-of-2 each. Quantifies the Catalyst
plan-re-optimization floor that motivated incremental._pin — see the
LINEAGE_PIN_MODE note in operators/incremental.py.
"""

import os
import shutil
import time

from pyspark.sql import functions as F

from email_address_parser_spark.operators import incremental as incr
from email_address_parser_spark.session import build_session
from email_address_parser_spark.sources.testdata import derive_transcripts
from email_address_parser_spark.streaming.incremental_stream import (
    read_state,
    write_state_mor,
)

# Two measured regimes (see BENCH/BASELINE.md "fold lineage pinning"):
#   HOT=200,  BLK=64    — bench.py's config: tiny salted blocks, deep
#                         fan-out, PLANNING-dominated -> checkpoint wins
#   HOT=10k,  BLK=5000  — big blocks, pair-heavy, EXECUTION-dominated ->
#                         persist wins (columnar cache + cache-substituted
#                         stats beat row-cached LogicalRDDs)
HOT = int(os.environ.get("AB_HOT", "200"))
BLK = int(os.environ.get("AB_BLK", "64"))
sf_dir = "/root/testdata/sf0.1"
spark = build_session()
transcripts = derive_transcripts(spark, sf_dir).persist()
transcripts.count()

root = "/dev/shm/spark-local/ab_fold_plan"
shutil.rmtree(root, ignore_errors=True)
is_prev = F.pmod(F.xxhash64("conv_id"), F.lit(5)) != 0
write_state_mor(
    incr.build_incremental_state(
        spark, transcripts.where(is_prev), hot_threshold=HOT, target_block_size=BLK
    ),
    f"{root}/er",
    mode="overwrite",
)
print("state bootstrapped", flush=True)

batch = transcripts.where(~is_prev)


def run(mode):
    incr.LINEAGE_PIN_MODE = mode
    t0 = time.time()
    out = incr.fold_batch(
        spark, batch, read_state(spark, f"{root}/er"),
        hot_threshold=HOT, target_block_size=BLK,
    )
    out["delta"].write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    incr.LINEAGE_PIN_MODE = "checkpoint"
    return time.time() - t0


results = {"persist": [], "checkpoint": []}
for name in ("persist", "checkpoint", "checkpoint", "persist"):
    results[name].append(run(name))
    print(f"{name}: {results[name][-1]:6.2f}s", flush=True)

print(
    f"best-of-2 sf0.1: persist(embedded lineage)={min(results['persist']):.2f}s  "
    f"checkpoint(lazy truncation)={min(results['checkpoint']):.2f}s",
    flush=True,
)
