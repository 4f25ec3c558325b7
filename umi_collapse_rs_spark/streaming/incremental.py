"""Continuous dedup: Structured Streaming micro-batches absorbed into
the persisted incremental-dedup state.

``jobs/run_incremental.py`` absorbs one crawl snapshot per
spark-submit; this module is the always-on form — a file-source stream
of page drops where every micro-batch runs the SAME O(batch) assignment
plan (``plans/incremental.incremental_assign``: exact sha probe →
banded state probe with the directional gate → residual within-batch
clustering) inside ``foreachBatch`` and commits ONE O(batch) delta
segment to the log-structured store (``plans/state_store.py``).

Near-dup clustering against unbounded history cannot be expressed as a
built-in streaming aggregation (the state is a banded similarity index
probed by join, not a per-key fold), and ``applyInPandasWithState``
holds state on executors keyed by one column — the wrong shape for a
multi-key (sha + 20 band buckets) index over 10^12 docs.
``foreachBatch`` is the documented escape hatch: each micro-batch is a
batch DataFrame, so the whole existing plan — skew caps, broadcast
thresholds, oracle-checked semantics — applies unchanged.

Exactly-once: Structured Streaming re-runs a micro-batch after a
failure (at-least-once), so the sink must be idempotent.  Two halves:

1. assignments land under ``<output>/batch_id=<id>`` with
   mode=overwrite — a replay rewrites the same directory;
2. the state commit passes ``batch_id`` to
   ``StateStore.commit_delta``, which skips ids at or below the
   manifest's high-water mark (``last_batch_id``).

Assignments are written BEFORE the state commit, so every crash point
replays into the same final state: before the write → clean rerun;
between write and commit → overwrite + commit; after commit (but
before the query checkpoint advances) → overwrite + skipped commit.

Scale: per-micro-batch cost is O(batch) probes + O(batch) state bytes
(BENCH/INCREMENTAL.md measures both); the manifest log is bounded by
``compact_segments`` (compaction = one O(corpus) write amortized over
the batches it folds, and it carries the batch-id high-water mark
forward).  Backpressure comes from the source
(``maxFilesPerTrigger``), not the sink.

No reference analog: umi-collapse-rs is single-corpus per run — the
whole BAM is materialized before clustering
(deduplicate_sam.rs:194-196).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from umi_collapse_rs_spark.config import DedupConfig
from umi_collapse_rs_spark.plans.incremental import incremental_assign
from umi_collapse_rs_spark.plans.state_store import StateStore
from umi_collapse_rs_spark.streaming.ingest import stream_pages


def incremental_sink(
    spark: SparkSession,
    state_root: str,
    output_root: str,
    cfg: DedupConfig | None = None,
    index_bucket_cap: int | None = 64,
    compact_segments: int = 16,
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` function: absorb one micro-batch of
    pages into the state store and write its cluster assignments.

    The state under ``state_root`` must already be bootstrapped
    (``jobs/run_incremental.py --bootstrap``); the stream is the
    steady-state consumer, not the initial load.
    """
    cfg = cfg or DedupConfig(window_tokens=0)
    store = StateStore(spark, state_root)
    if not store.exists():
        raise RuntimeError(
            f"no committed state under {state_root} — bootstrap first "
            "(jobs/run_incremental.py --bootstrap)"
        )

    def absorb(batch_df: DataFrame, batch_id: int) -> None:
        hwm = store.last_batch_id()
        if hwm is not None and batch_id <= hwm:
            return  # full replay of a committed micro-batch
        if batch_df.isEmpty():
            return  # trigger fired with no new files
        res = incremental_assign(
            spark, store.read(), batch_df, cfg, index_bucket_cap=index_bucket_cap
        )
        # idempotent per-batch output dir; written BEFORE the state
        # commit (see module docstring for the crash-point argument)
        res.assignments.write.mode("overwrite").parquet(
            f"{output_root}/batch_id={batch_id}"
        )
        m = store.commit_delta(res.delta, batch_id=batch_id)
        if (
            compact_segments
            and not m.get("skipped_replay")
            and len(m["segments"]) >= compact_segments
        ):
            store.compact(gc=True)

    return absorb


def start_incremental_stream(
    spark: SparkSession,
    input_path: str,
    state_root: str,
    output_root: str,
    checkpoint_dir: str,
    cfg: DedupConfig | None = None,
    index_bucket_cap: int | None = 64,
    compact_segments: int = 16,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
):
    """Wire source → sink and start the query.

    ``available_now=True`` (default) drains everything currently under
    ``input_path`` in bounded micro-batches and stops — the "catch up
    on pending crawl drops" mode, and the testable one.  Pass False for
    an unbounded continuous query.  ``max_files_per_trigger`` bounds
    micro-batch size (source-side backpressure).
    """
    pages = stream_pages(spark, input_path, max_files_per_trigger)
    writer = (
        pages.writeStream.foreachBatch(
            incremental_sink(
                spark,
                state_root,
                output_root,
                cfg,
                index_bucket_cap=index_bucket_cap,
                compact_segments=compact_segments,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .queryName("incremental_dedup")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
