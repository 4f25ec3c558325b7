"""Configurable merge rule (reference merge/mod.rs:6-51 matrix):
each rule picks a different, deterministic representative for an
exact-dup group, end-to-end through the pipeline."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import types as T

from umi_collapse_rs_spark.config import DedupConfig
from umi_collapse_rs_spark.plans.pipeline import run_dedup_pipeline

_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def _ts(s):
    return datetime(2025, 1, 1, 0, 0, s, tzinfo=timezone.utc)


@pytest.fixture(scope="module")
def pages(spark):
    # one exact-dup group (identical after normalization) where every
    # rule elects a different member, plus a unique page
    rows = [
        ("u://b", _ts(30), "  HELLO    world  extra   PADDING here ", "en"),  # longest raw
        ("u://c", _ts(10), "hello world extra padding here", "en"),           # earliest
        ("u://a", _ts(20), "Hello  World extra padding HERE", "en"),          # min url
        ("u://z", _ts(40), "something entirely different on this page", "en"),
    ]
    return spark.createDataFrame(rows, _SCHEMA)


@pytest.mark.parametrize(
    "merge,winner",
    [("earliest", "u://c"), ("quality", "u://b"), ("any", "u://a")],
)
def test_pipeline_merge_rule_elects_expected_rep(spark, pages, merge, winner):
    res = run_dedup_pipeline(spark, pages, DedupConfig(merge=merge))
    rows = {r.url: r for r in res.clusters.collect()}
    assert len(rows) == 4
    group = [rows[u] for u in ("u://a", "u://b", "u://c")]
    assert all(r.canonical_url == winner for r in group)
    assert all(r.cluster_size == 3 and r.exact_dup_count == 3 for r in group)
    assert rows["u://z"].cluster_size == 1


def test_bad_merge_rule_rejected():
    with pytest.raises(ValueError, match="merge"):
        DedupConfig(merge="bogus")
