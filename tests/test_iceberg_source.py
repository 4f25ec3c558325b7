"""Source/sink format branches (SURVEY §2 S1/S2).

The production target is an Iceberg catalog (north_rule); this
container has no Iceberg runtime jar, so the tests fence the branch:
the parquet fallback round-trips, and when a catalog IS configured the
Iceberg code path is genuinely taken (it must fail loudly about the
missing data source, not silently fall back) — or, when the jar is
present, round-trip for real.
"""

from __future__ import annotations

import pytest

from umi_collapse_rs_spark.fixtures import pages_spark_df
from umi_collapse_rs_spark.sources.pages import read_pages, write_table


def _iceberg_jar_present(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:  # noqa: BLE001
        return False


def test_parquet_roundtrip_and_schema_coercion(spark, tmp_path):
    pages = pages_spark_df(spark, 50)
    target = str(tmp_path / "pages_out")
    write_table(pages, target)
    back = read_pages(spark, target)
    assert [f.name for f in back.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    assert back.count() == 50


def test_missing_required_columns_rejected(spark, tmp_path):
    df = spark.range(3).selectExpr("cast(id as string) AS url")
    p = str(tmp_path / "bad")
    df.write.parquet(p)
    with pytest.raises(ValueError, match="required columns"):
        read_pages(spark, p)


def test_iceberg_branch_not_dead_code(spark, tmp_path):
    """With a catalog configured, a slash-less source name must route to
    the Iceberg reader."""
    spark.conf.set("spark.sql.catalog.iceberg", "org.apache.iceberg.spark.SparkCatalog")
    try:
        if _iceberg_jar_present(spark):
            # real runtime present: full create / append / read round-trip
            pages = pages_spark_df(spark, 20)
            write_table(pages, "iceberg.db.pages_rt")
            assert read_pages(spark, "iceberg.db.pages_rt").count() == 20
            write_table(pages_spark_df(spark, 5), "iceberg.db.pages_rt", mode="append")
            assert read_pages(spark, "iceberg.db.pages_rt").count() == 25
        else:
            with pytest.raises(Exception, match="(?i)iceberg"):
                read_pages(spark, "iceberg.db.pages_rt")
    finally:
        spark.conf.unset("spark.sql.catalog.iceberg")
