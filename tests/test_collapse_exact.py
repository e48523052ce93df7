"""The collapsed-representative scale path (exact-dedup before fuzzy match)
must produce EXACTLY the same clusters as the full pair-enumeration path."""

from __future__ import annotations

import pytest

from email_address_parser_spark.pipeline import PipelineConfig, run_pipeline
from email_address_parser_spark.synth import synthesize


@pytest.fixture(scope="module")
def corpus():
    return synthesize(n_convs=80, turns_per_conv=8, n_entities=20, seed=7)


def _clusters(spark, corpus, **cfg_kwargs):
    sdf = spark.createDataFrame(corpus.transcripts)
    cfg = PipelineConfig(
        checkpoint_dir=None, hot_threshold=50, target_block_size=40, **cfg_kwargs
    )
    out = run_pipeline(spark, sdf, cfg)
    return {
        r.email: r.cluster_id for r in out["clusters"].collect()
    }


def test_collapsed_path_matches_full_path(spark, corpus):
    full = _clusters(spark, corpus)
    collapsed = _clusters(spark, corpus, collapse_exact=True, dedupe_pairs=False)
    assert collapsed == full


def test_exact_match_edges_are_stars(spark, corpus):
    from email_address_parser_spark.operators.blocking import exact_match_edges
    from email_address_parser_spark.operators.extract import (
        extract_mentions,
        with_canonical,
    )

    sdf = spark.createDataFrame(corpus.transcripts)
    mentions = with_canonical(extract_mentions(sdf))
    edges = exact_match_edges(mentions)
    rows = edges.collect()
    assert all(r.src < r.dst and r.score == 1.0 for r in rows)
    # star shape: no dst is ever a src (depth-1 forest)
    srcs = {r.src for r in rows}
    dsts = {r.dst for r in rows}
    assert not (srcs & dsts)
