#!/usr/bin/env python
"""Measure the CC adaptive threshold at its boundary (round-4 item 8).

`operators/cc.py` routes edge sets below LOCAL_EDGE_THRESHOLD to an exact
driver union-find and larger ones to the distributed large-star/small-star
loop. Round 3 ARGUED the bound (2^20) from per-round shuffle-barrier floors;
this campaign MEASURES it: synthetic random edge sets (string node ids, avg
degree ~2 — a giant component plus fringe, the adversarial shape for both
paths) at 0.25/0.5/1/2/4 M edges, each solved by BOTH paths
(local_threshold=2^62 forces the driver path, 0 forces the distributed
loop), best-of-N, equality of label sets asserted at the smallest size.

Prints ONE JSON line:
  {"sizes": {edges: {"local_sec": s, "dist_sec": s, "ratio": r}},
   "crossover_edges": first size where the distributed loop wins (or null)}
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from email_address_parser_spark.operators.cc import connected_components
from email_address_parser_spark.session import build_session

SIZES = [1 << 18, 1 << 19, 1 << 20, 1 << 21, 1 << 22]
REPS = 2


def _edges(spark, n_edges: int):
    """Deterministic random graph: n_edges over ~n_edges nodes (avg degree 2
    → one giant component + fringe trees), string ids like the real node
    domain (emails)."""
    n_nodes = max(n_edges, 2)
    return (
        spark.range(n_edges)
        .select(
            F.format_string(
                "n%012d", F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_nodes))
            ).alias("src"),
            F.format_string(
                "n%012d", F.pmod(F.xxhash64("id", F.lit(2)), F.lit(n_nodes))
            ).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .localCheckpoint()
    )


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    spark = build_session(
        app_name=f"bench-cc-threshold-local{cpus}",
        cores=cpus,
        shuffle_partitions=max(2 * cpus, 16),
        extra_conf={
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
            "spark.local.dir": "/dev/shm/spark-local",
        },
    )

    # warmup both paths once (worker pool, codegen)
    warm = _edges(spark, 1 << 14)
    _force(connected_components(warm, local_threshold=1 << 62))
    _force(connected_components(warm, local_threshold=0))

    # label-set equality of the two paths at the smallest campaign size
    small = _edges(spark, SIZES[0])
    a = {tuple(r) for r in connected_components(small, local_threshold=1 << 62).collect()}
    b = {tuple(r) for r in connected_components(small, local_threshold=0).collect()}
    assert a == b, "paths disagree"

    sizes = {}
    crossover = None
    for n in SIZES:
        e = _edges(spark, n)
        e.count()
        t = {}
        for name, thr in (("local_sec", 1 << 62), ("dist_sec", 0)):
            best = None
            for _ in range(REPS):
                t0 = time.perf_counter()
                _force(connected_components(e, local_threshold=thr))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            t[name] = round(best, 3)
        t["ratio"] = round(t["dist_sec"] / t["local_sec"], 2)
        sizes[str(n)] = t
        if crossover is None and t["dist_sec"] < t["local_sec"]:
            crossover = n
        e.unpersist()

    spark.stop()
    print(
        json.dumps(
            {
                "metric": "driver union-find vs distributed star loop",
                "sizes": sizes,
                "crossover_edges": crossover,
                "cpus": cpus,
                "reps": REPS,
                "aggregation": "best-of-N",
            }
        )
    )


if __name__ == "__main__":
    main()
