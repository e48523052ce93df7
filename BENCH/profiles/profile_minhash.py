#!/usr/bin/env python
"""Decompose dedup_minhash at sf0.1: signature+banding vs candidate pair
generation vs relational Jaccard verification."""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

from email_address_parser_spark.operators.dedup import (
    _bucket_pairs,
    _word_bigrams,
    _word_minhash_bands,
    minhash_near_dup,
    normalized_text,
)
from email_address_parser_spark.session import build_session
from email_address_parser_spark.sources.testdata import load_documents


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(
        app_name="profile-minhash", cores=32, shuffle_partitions=64,
        extra_conf={"spark.local.dir": "/dev/shm/spark-local"},
    )
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    df = load_documents(spark, sf_dir).persist()
    print("docs:", df.count())
    _force(df.select(_word_minhash_bands(normalized_text(F.col("text")))))  # warm

    def t(label, fn):
        t0 = time.perf_counter()
        fn()
        print(f"{label}: {time.perf_counter() - t0:.2f}s")

    bands = df.select(
        F.col("doc_id").alias("id"),
        F.posexplode(_word_minhash_bands(normalized_text(F.col("text")))).alias(
            "band_idx", "band_sig"
        ),
    )
    t("A signatures+bands", lambda: _force(bands))
    cand = _bucket_pairs(bands, ["band_idx", "band_sig"], 64)
    t("B + bucket pairs", lambda: _force(cand))
    t("C full minhash_near_dup", lambda: _force(minhash_near_dup(df, threshold=0.2)))
    t("C again", lambda: _force(minhash_near_dup(df, threshold=0.2)))
    eg = df.select(F.col("doc_id").alias("id"), F.explode(_word_bigrams("text")).alias("gram"))
    t("D gram explosion alone", lambda: _force(eg))
    spark.stop()


if __name__ == "__main__":
    main()
