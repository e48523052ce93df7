#!/usr/bin/env python
"""Same-session pinned A/B for the round-4 manifest change (judge item 3).

`CheckpointManager.save` used to re-read the just-written stage table and
run two extra aggregate jobs per stage (partition histogram collect +
counters aggregate). Round 4 attaches the counters to the write pass via
`observe()` and reads the per-partition lineage from the written parquet
footers (driver-side pyarrow), so a stage write is ONE Spark job.

A first cut of this harness timed the whole checkpointed `run_pipeline`;
at sf0.1 the ~12-job saving (≈0.3-0.5 s per job floor) drowned in ±5 s of
end-to-end noise. This version isolates the thing that changed: it times
`save()` itself on the two stage shapes that exercise every counter branch
(mentions → verdict counters, scored → score counters), interleaved
best-of-N per arm, AND counts the Spark jobs each save runs via job-group
tracking — the job count is the structural claim, the wall time the bonus.

Prints ONE JSON line:
  {"stages": {stage: {"new_sec", "old_sec", "new_jobs", "old_jobs"}},
   "counters_equal": bool, "jobs_saved_per_pipeline_run": n}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from email_address_parser_spark.operators.blocking import candidate_pairs
from email_address_parser_spark.operators.extract import (
    extract_mentions,
    with_canonical,
)
from email_address_parser_spark.operators.scoring import score_pairs
from email_address_parser_spark.pipeline import CheckpointManager
from email_address_parser_spark.session import build_session
from email_address_parser_spark.sources.testdata import derive_transcripts

REPS = int(os.environ.get("SPARK_GRAFT_REPS", "4"))
N_PIPELINE_STAGES = 6  # mentions/pairs/scored/edges/star_edges/clusters


def old_save(self, stage, df):
    """Round-3 save, verbatim (git show d2142fe~1:email_address_parser_spark/
    pipeline.py): write, re-read, partition-histogram collect, counters
    aggregate — 3 jobs per stage."""
    if self.root is None:
        return df
    table, manifest = self._paths(stage)
    df.write.mode("overwrite").parquet(str(table))
    persisted = self.spark.read.parquet(str(table))
    partition_hist = (
        persisted.groupBy(F.spark_partition_id().alias("partition_id"))
        .count()
        .orderBy("partition_id")
        .collect()
    )
    counters = {}
    cols = set(persisted.columns)
    aggs = []
    if {"valid_strict", "valid_lax"} <= cols:
        aggs += [
            F.sum(F.col("valid_strict").cast("long")).alias("n_valid_strict"),
            F.sum(F.col("valid_lax").cast("long")).alias("n_valid_lax"),
        ]
    if "score" in cols:
        aggs += [
            F.min("score").alias("min_score"),
            F.max("score").alias("max_score"),
        ]
    if aggs:
        row = persisted.agg(*aggs).collect()[0]
        counters = {
            k: (None if row[k] is None else float(row[k])) for k in row.asDict()
        }
    manifest.write_text(
        json.dumps(
            {
                "stage": stage,
                "rows": sum(r["count"] for r in partition_hist),
                "partitions": {
                    str(r["partition_id"]): r["count"] for r in partition_hist
                },
                "counters": counters,
                "schema": persisted.schema.jsonValue(),
                "config_fingerprint": self.fingerprint,
            },
            indent=2,
        )
    )
    return persisted


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    spark = build_session(
        app_name=f"bench-manifest-ab-local{cpus}",
        cores=cpus,
        shuffle_partitions=max(2 * cpus, 16),
        extra_conf={"spark.local.dir": "/dev/shm/spark-local"},
    )
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # the two stage shapes that exercise every counter branch, persisted so
    # each timed save() re-runs ONLY the write, not the upstream chain
    mentions = with_canonical(extract_mentions(derive_transcripts(spark, sf_dir)))
    mentions = mentions.persist()
    mentions.count()
    scored = score_pairs(candidate_pairs(mentions)).persist()
    scored.count()
    stages = {"mentions": mentions, "scored": scored}

    ckpt_root = "/dev/shm/spark-local/manifest_ab"
    new_save = CheckpointManager.save

    def timed_save(impl, stage_name, df):
        shutil.rmtree(ckpt_root, ignore_errors=True)
        mgr = CheckpointManager(spark, ckpt_root, resume=False)
        group = f"ab-{stage_name}-{time.monotonic_ns()}"
        sc.setJobGroup(group, "manifest A/B")
        t0 = time.perf_counter()
        impl(mgr, stage_name, df)
        dt = time.perf_counter() - t0
        sc.setJobGroup("idle", "")
        jobs = len(tracker.getJobIdsForGroup(group))
        with open(f"{ckpt_root}/{stage_name}_MANIFEST.json") as f:
            m = json.load(f)
        return dt, jobs, {"rows": m["rows"], "counters": m["counters"]}

    # warmup both arms on both shapes
    for df in stages.values():
        timed_save(new_save, "w", df)
        timed_save(old_save, "w", df)

    out = {}
    counters_equal = True
    for stage_name, df in stages.items():
        best = {"new": None, "old": None}
        jobs = {}
        mans = {}
        for _ in range(REPS):  # interleaved so box drift hits both arms
            for arm, impl in (("new", new_save), ("old", old_save)):
                dt, nj, man = timed_save(impl, stage_name, df)
                best[arm] = dt if best[arm] is None else min(best[arm], dt)
                jobs[arm] = nj
                mans[arm] = man
        counters_equal &= mans["new"] == mans["old"]
        out[stage_name] = {
            "new_sec": round(best["new"], 3),
            "old_sec": round(best["old"], 3),
            "new_jobs": jobs["new"],
            "old_jobs": jobs["old"],
        }

    print(
        json.dumps(
            {
                "metric": "CheckpointManager.save: observe()+footer manifests vs round-3 re-read manifests",
                "stages": out,
                "counters_equal": counters_equal,
                "jobs_saved_per_pipeline_run": N_PIPELINE_STAGES
                * (out["scored"]["old_jobs"] - out["scored"]["new_jobs"]),
                "cpus": cpus,
                "sf_dir": sf_dir,
                "reps": REPS,
                "aggregation": "best-of-N per arm, interleaved",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
