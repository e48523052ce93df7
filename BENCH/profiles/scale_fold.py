"""Two-parallelism scaling of the steady-state incremental fold
(north_rule evidence on the flagship incremental operator, post
lineage-pinning).

Runs the IDENTICAL fold (read MoR state from parquet → fold_batch over the
same ~30k-turn batch → force delta) at SPARK_GRAFT_CPUS cores. The driver
invocation pins cores with taskset so the JVM and its Python workers cannot
borrow idle host cores:

    taskset -c 0,1      SPARK_GRAFT_CPUS=2 python BENCH/profiles/scale_fold.py
    taskset -c 0-7      SPARK_GRAFT_CPUS=8 python BENCH/profiles/scale_fold.py

State is bootstrapped fresh per process (untimed) so both levels fold into
byte-identical state. Reports best-of-N fold seconds + turns/sec; combine
two levels into efficiency = (thr_4N / thr_N) / 4.
"""

import json
import os
import shutil
import time

from pyspark.sql import functions as F

from email_address_parser_spark.operators.incremental import (
    build_incremental_state,
    fold_batch,
)
from email_address_parser_spark.session import build_session
from email_address_parser_spark.sources.testdata import (
    derive_transcripts,
    replicate_transcripts,
)
from email_address_parser_spark.streaming.incremental_stream import (
    read_state,
    write_state_mor,
)

HOT, BLK = 200, 64
REPS = int(os.environ.get("REPS", "3"))
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
# SCALE_FACTOR replicates corpus AND batch ×F with disjoint identity spaces
# (same device as scale_bench.py) — the fold's parallel fraction grows with
# batch size, so scaling efficiency is reported per batch size
factor = int(os.environ.get("SCALE_FACTOR", "1"))
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = build_session()
transcripts = derive_transcripts(spark, sf_dir)
if factor > 1:
    transcripts = replicate_transcripts(transcripts, factor)
transcripts = transcripts.persist()
n_total = transcripts.count()

root = f"/dev/shm/spark-local/scale_fold_{cpus}"
shutil.rmtree(root, ignore_errors=True)
is_prev = F.pmod(F.xxhash64("conv_id"), F.lit(5)) != 0
write_state_mor(
    build_incremental_state(
        spark, transcripts.where(is_prev), hot_threshold=HOT, target_block_size=BLK
    ),
    f"{root}/er",
    mode="overwrite",
)
batch = transcripts.where(~is_prev).persist()
n_batch = batch.count()
# warm the Python workers untimed (long-lived executors pay fork+import once)
batch.select(F.max(F.length("text"))).collect()

times = []
for rep in range(REPS):
    t0 = time.time()
    out = fold_batch(
        spark, batch, read_state(spark, f"{root}/er"),
        hot_threshold=HOT, target_block_size=BLK,
    )
    out["delta"].write.format("noop").mode("overwrite").save()
    times.append(round(time.time() - t0, 2))
    spark.catalog.clearCache()
    print(f"rep {rep}: {times[-1]:.2f}s", flush=True)

best = min(times)
print(json.dumps({
    "metric": "steady-state fold wall time",
    "cpus": cpus,
    "scale_factor": factor,
    "batch_turns": n_batch,
    "reps": times,
    "best_sec": best,
    "turns_per_sec": round(n_batch / best, 1),
}))
