#!/usr/bin/env python
"""G26 incremental-dedup A/B: fold one document batch into persisted dedup
state (operators/incremental_dedup.fold_docs) vs re-deduplicating the union
corpus from scratch (dedup_keep_best use_lsh=True), at a FIXED batch size
while the corpus grows SPARK_GRAFT_REPL-fold.

Replicas are made gram-disjoint by tagging every word with the replica id
(near-dup structure within a replica is isomorphic to the original corpus;
no bigram is shared across replicas, so clusters never span replicas —
the same disjoint-identity-space construction bench_incremental.py uses
for transcripts). State is written to and re-read from parquet per rep,
best-of-N with the cache cleared between reps. Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import re
import time

from pyspark.sql import functions as F

from email_address_parser_spark.operators.dedup import dedup_keep_best
from email_address_parser_spark.operators.incremental_dedup import (
    DEDUP_STATE_TABLES,
    build_dedup_state,
    fold_docs,
)
from email_address_parser_spark.session import build_session

THRESHOLD = 0.2
MAX_BUCKET = 64
REPS = 3
REPL = int(os.environ.get("SPARK_GRAFT_REPL", "1"))
BATCH_DEN = 5 * REPL  # keeps the batch ~constant as the corpus grows


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    state_dir = "/dev/shm/spark-local/incr_dedup_state"
    spark = build_session(app_name="bench-incr-dedup", cores=cpus)

    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    # gram-disjoint replicas: glue a per-replica LETTER prefix onto every
    # word (the tokenizer is [A-Za-z0-9]+, so "zb" + word stays ONE token —
    # an underscore/digit separator would split and mint shared "tag word"
    # bigrams across documents, inflating intra-replica similarity). The ×1
    # point is tagged too, so every REPL measures the same per-replica
    # workload (tagging shifts the char-shingle signatures vs raw text).
    reps_df = spark.range(REPL).select(
        F.col("id").alias("_r"), F.expr("char(id + 97)").alias("_tag")
    )
    docs = base.crossJoin(reps_df).select(
        F.concat(F.col("doc_id"), F.lit("#"), F.col("_r")).alias("doc_id"),
        F.regexp_replace(
            "text",
            r"([A-Za-z0-9]+)",
            F.concat(F.lit("z"), F.col("_tag"), F.lit("$1")),
        ).alias("text"),
    )
    docs = docs.persist()
    n_docs = docs.count()
    is_prev = F.pmod(F.xxhash64("doc_id"), F.lit(BATCH_DEN)) != 0
    prev_d = docs.where(is_prev).persist()
    new_d = docs.where(~is_prev).persist()
    n_batch = new_d.count()

    # bootstrap + checkpoint state (untimed; doubles as whole-chain warmup)
    state = build_dedup_state(
        spark, prev_d, threshold=THRESHOLD, max_bucket=MAX_BUCKET
    )
    for name in DEDUP_STATE_TABLES:
        state[name].write.mode("overwrite").parquet(f"{state_dir}/{name}")

    def _load():
        return {
            n: spark.read.parquet(f"{state_dir}/{n}") for n in DEDUP_STATE_TABLES
        }

    def run_fold() -> None:
        out = fold_docs(
            spark, new_d, _load(), threshold=THRESHOLD, max_bucket=MAX_BUCKET
        )
        out["delta"].write.format("noop").mode("overwrite").save()

    def run_full() -> None:
        dedup_keep_best(
            docs, threshold=THRESHOLD, use_lsh=True, max_bucket=MAX_BUCKET
        ).write.format("noop").mode("overwrite").save()

    timings = {}
    for name, fn in (("fold_delta", run_fold), ("full", run_full)):
        best = float("inf")
        for _ in range(REPS):
            spark.catalog.clearCache()
            docs.persist(), prev_d.persist(), new_d.persist()
            new_d.count()
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    print(
        json.dumps(
            {
                "metric": "incremental dedup fold (delta) vs full re-dedup "
                f"(1/{BATCH_DEN} batch, corpus x{REPL})",
                "value": timings["fold_delta"],
                "unit": "sec",
                "queries": timings,
                "speedup_vs_full": round(
                    timings["full"] / timings["fold_delta"], 2
                ),
                "sf": sf,
                "cpus": int(cpus),
                "docs": n_docs,
                "batch_docs": n_batch,
                "repl": REPL,
                "reps": REPS,
                "aggregation": "best-of-N per variant, cache cleared between reps",
            }
        )
    )


if __name__ == "__main__":
    main()
