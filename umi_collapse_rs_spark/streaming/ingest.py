"""Structured Streaming ingest path.

The reference is strictly batch — the whole BAM is materialized in RAM
before clustering (``/root/reference/src/deduplicate_sam.rs:194-196``)
— and the north_rule's resumability requirement is met by batch stage
checkpoints.  This module adds the streaming *ingest* half a continuous
crawl pipeline needs: exact-duplicate suppression and windowed stats on
a stream of pages, with event-time watermarks for late crawl records.
Near-dup clustering stays batch (it is a global fixpoint, not an
incremental fold); streamed, deduped pages land in a staging table the
batch pipeline consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from umi_collapse_rs_spark.functions.normalize import normalize_text_col, text_sha_col
from umi_collapse_rs_spark.sources.pages import PAGES_SCHEMA


def stream_pages(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of pages parquet drops (one file per
    micro-batch in tests; a directory listing stream in production)."""
    return spark.readStream.schema(PAGES_SCHEMA).parquet(path)


def streaming_exact_dedup(pages: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact-duplicate suppression keyed on normalized-text
    sha (the stream form of stage 2's exact collapse).

    ``dropDuplicatesWithinWatermark`` bounds the dedup state by event
    time: two byte-identical pages arriving within the watermark window
    emit once; state for older keys is reclaimed — mandatory for an
    unbounded crawl stream.
    """
    norm = pages.withColumn("text_norm", normalize_text_col("text")).withColumn(
        "text_sha", text_sha_col("text_norm")
    )
    return (
        norm.withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["text_sha"])
        .select("url", "warc_ts", "html", "text", "lang", "text_sha")
    )


def streaming_page_stats(pages: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window per-lang ingest stats with late-data handling —
    the streaming analog of the batch metrics table (SURVEY §2 A6)."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("win"), "lang")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.round(F.avg(F.length("text")), 2).alias("avg_len"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "lang",
            "n_pages",
            "avg_len",
        )
    )
