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


def stream_pages(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of pages parquet drops (one file per
    micro-batch in tests; a directory listing stream in production).
    ``max_files_per_trigger`` bounds micro-batch size — the source-side
    backpressure knob for the incremental-dedup sink."""
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


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


def streaming_exact_collapse_state(pages: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): streaming
    exact-collapse that maintains, per normalized-text sha, the running
    frequency AND the current merge-rule representative (earliest
    warc_ts, tie-min url) — the stream form of stage 2 that
    ``dropDuplicatesWithinWatermark`` cannot express (it emits a key
    once and can never update its count or representative).

    Emits one updated (text_sha, rep_url, rep_ts, freq) row per key per
    micro-batch touching it; state is explicit and per-key, the
    operator shuffles only on the state key — the standard scalable
    shape for custom streaming state.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    norm = pages.withColumn("text_norm", normalize_text_col("text")).withColumn(
        "text_sha", text_sha_col("text_norm")
    )

    out_schema = "text_sha string, rep_url string, rep_ts timestamp, freq long"
    state_schema = "rep_url string, rep_ts timestamp, freq long"

    def update(key, pdfs, state: GroupState):
        (text_sha,) = key
        rep_url, rep_ts, freq = state.get if state.exists else (None, None, 0)
        for pdf in pdfs:
            freq += len(pdf)
            # vectorized batch minimum, then compare with carried state
            best = pdf.sort_values(["warc_ts", "url"]).iloc[0]
            if rep_ts is None or (best["warc_ts"], best["url"]) < (rep_ts, rep_url):
                rep_url, rep_ts = best["url"], best["warc_ts"]
        state.update((rep_url, rep_ts, freq))
        yield pd.DataFrame(
            {"text_sha": [text_sha], "rep_url": [rep_url], "rep_ts": [rep_ts], "freq": [freq]}
        )

    return (
        norm.withWatermark("warc_ts", watermark)
        .groupBy("text_sha")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
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
