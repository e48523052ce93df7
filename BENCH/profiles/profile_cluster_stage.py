#!/usr/bin/env python
"""Decompose scale_bench's block_score_cluster stage at a replicated corpus:
candidate gen+score+threshold vs exact star edges vs cluster assembly (CC +
assignment joins), at SPARK_GRAFT_CPUS cores. Identifies the non-scaling
floor seen in the round-3 two-parallelism runs."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

from email_address_parser_spark.operators.blocking import (
    candidate_pairs,
    exact_match_edges,
    uniq_valid_mentions,
)
from email_address_parser_spark.operators.extract import extract_mentions, with_canonical
from email_address_parser_spark.operators.scoring import match_edges, score_pairs
from email_address_parser_spark.pipeline import cluster_mentions_collapsed
from email_address_parser_spark.session import build_session
from email_address_parser_spark.sources.testdata import (
    derive_transcripts,
    replicate_transcripts,
)


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    factor = int(os.environ.get("SCALE_FACTOR", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    spark = build_session(
        app_name=f"profile-cluster-{cpus}",
        cores=cpus,
        shuffle_partitions=2 * cpus,
        extra_conf={
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
            "spark.local.dir": "/dev/shm/spark-local",
        },
    )
    transcripts = replicate_transcripts(derive_transcripts(spark, sf_dir), factor).persist()
    transcripts.count()
    mentions = with_canonical(extract_mentions(transcripts))
    uniq = uniq_valid_mentions(mentions).persist()
    print("distinct emails:", uniq.count())

    def t(label, fn):
        t0 = time.perf_counter()
        out = fn()
        print(f"{label}: {time.perf_counter() - t0:.2f}s")
        return out

    pairs = candidate_pairs(
        mentions, hot_threshold=200, target_block_size=32,
        collapse_exact=True, dedupe=False, uniq=uniq,
    )
    fuzzy = t("pairs+score+threshold -> fuzzy edges (persist)", lambda: (
        lambda df: (df.count(), df)[1])(match_edges(score_pairs(pairs)).persist()))
    print("fuzzy edges:", fuzzy.count())
    star = t("exact star edges (persist)", lambda: (
        lambda df: (df.count(), df)[1])(exact_match_edges(mentions, uniq=uniq).persist()))
    print("star edges:", star.count())
    t("cluster_mentions_collapsed (CC + assignment)", lambda: cluster_mentions_collapsed(
        mentions, fuzzy, star, nodes=uniq).write.format("noop").mode("overwrite").save())
    t("cluster_mentions_collapsed again", lambda: cluster_mentions_collapsed(
        mentions, fuzzy, star, nodes=uniq).write.format("noop").mode("overwrite").save())
    spark.stop()


if __name__ == "__main__":
    main()
