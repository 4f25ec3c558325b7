"""Property / metamorphic tests (FIXTURES.md §4) — pipeline-level
invariances on a smaller corpus to keep runtime bounded."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from umi_collapse_rs_spark.config import DedupConfig
from umi_collapse_rs_spark.fixtures import pages_spark_df
from umi_collapse_rs_spark.plans.pipeline import run_dedup_pipeline


@pytest.fixture(scope="module")
def small_pages(spark):
    return pages_spark_df(spark, 200)


def _assignments(spark, pages):
    res = run_dedup_pipeline(spark, pages, DedupConfig())
    pdf = res.clusters.toPandas()
    return dict(zip(pdf.url, pdf.canonical_url)), res


def test_permutation_invariance(spark, small_pages):
    """Shuffled input row order -> identical cluster assignments."""
    a, _ = _assignments(spark, small_pages)
    shuffled = small_pages.orderBy(F.xxhash64("url")).repartition(7)
    b, _ = _assignments(spark, shuffled)
    assert a == b


def test_monotonicity_extra_exact_copy(spark, small_pages):
    """Appending an exact copy of one url only bumps its group's
    exact_dup_count and cluster_size by one."""
    a, res_a = _assignments(spark, small_pages)
    target = small_pages.orderBy("url").limit(1).collect()[0]
    extra = spark.createDataFrame(
        [(target["url"] + "-copy", target["warc_ts"], target["html"], target["text"], target["lang"])],
        small_pages.schema,
    )
    b, res_b = _assignments(spark, small_pages.unionByName(extra))
    # original assignments unchanged
    assert {k: v for k, v in b.items() if k in a} == a
    # the copy joins the target's cluster
    assert b[target["url"] + "-copy"] == a[target["url"]]
    ca = res_a.clusters.filter(F.col("url") == target["url"]).collect()[0]
    cb = res_b.clusters.filter(F.col("url") == target["url"]).collect()[0]
    assert cb["exact_dup_count"] == ca["exact_dup_count"] + 1
    assert cb["cluster_size"] == ca["cluster_size"] + 1


def test_idempotence_on_canonicals(spark, small_pages):
    """Dedup of the deduped canonical set: exact re-collapse finds no
    duplicates (all canonicals are textually distinct)."""
    _, res = _assignments(spark, small_pages)
    canon = res.canonical_pages.select(
        "url", "warc_ts", F.lit(None).cast("binary").alias("html"), "text", "lang"
    )
    _, res2 = _assignments(spark, canon)
    pdf = res2.clusters.toPandas()
    # no exact dups remain among canonicals
    assert (pdf.exact_dup_count == 1).all()
