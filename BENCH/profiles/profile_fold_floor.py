"""Where does the steady-state fold's per-fold floor go?

Phase-times one q_incr_fold-equivalent run (sf0.01 by default) by timing
each eager action the fold DAG triggers: state read + plan build, the
quotient edge localCheckpoint (which forces the whole candidate+scoring
chain), the star-forest probes, and the final delta force.
"""

import os
import shutil
import time

from pyspark.sql import functions as F

from email_address_parser_spark.operators.incremental import (
    build_incremental_state,
    fold_batch,
)
from email_address_parser_spark.session import build_session
from email_address_parser_spark.sources.testdata import derive_transcripts
from email_address_parser_spark.streaming.incremental_stream import (
    read_state,
    write_state_mor,
)

HOT_THRESHOLD = 10_000
TARGET_BLOCK = 5_000

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
spark = build_session()
transcripts = derive_transcripts(spark, sf_dir).persist()
transcripts.count()

root = "/dev/shm/spark-local/profile_fold_floor"
shutil.rmtree(root, ignore_errors=True)
is_prev = F.pmod(F.xxhash64("conv_id"), F.lit(5)) != 0
write_state_mor(
    build_incremental_state(
        spark,
        transcripts.where(is_prev),
        hot_threshold=HOT_THRESHOLD,
        target_block_size=TARGET_BLOCK,
    ),
    f"{root}/er",
    mode="overwrite",
)
print("state bootstrapped", flush=True)

for rep in range(2):
    t0 = time.time()
    state = read_state(spark, f"{root}/er")
    out = fold_batch(
        spark,
        transcripts.where(~is_prev),
        state,
        hot_threshold=HOT_THRESHOLD,
        target_block_size=TARGET_BLOCK,
    )
    t1 = time.time()
    out["delta"].write.format("noop").mode("overwrite").save()
    t2 = time.time()
    print(
        f"rep {rep}: build(eager ckpt+probes)={t1-t0:6.2f}s  "
        f"force delta={t2-t1:6.2f}s  total={t2-t0:6.2f}s",
        flush=True,
    )
