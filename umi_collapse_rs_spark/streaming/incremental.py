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

Micro-batch ids are monotone only WITHIN one checkpoint lineage — a
FRESH checkpoint restarts them at 0, so ``batch_id <= hwm`` alone says
nothing about whether the data was already absorbed (a new input dir,
a different ``--max-files``, or a second query over the same state all
produce low ids carrying genuinely NEW pages).  The sink therefore
records the streaming query id (stable across restarts of the same
checkpoint, read from ``<checkpoint>/metadata``) and a per-batch
content fingerprint in the manifest, and gates replays on LINEAGE:

- same query id, ``batch_id <= hwm`` → true replay, skip;
- different query id over a store with streaming history → decide by
  CONTENT: a batch whose fingerprint matches a committed batch is a
  byte-identical re-delivery (skip); anything else FAILS FAST unless
  the operator passes ``allow_new_stream=True`` (--allow-new-stream),
  which re-bases the lineage and absorbs the batch as new data.

So the guarantee is: exactly-once within a checkpoint lineage;
a LOST checkpoint recovers losslessly only when the rerun reproduces
the original batching byte-for-byte (same files, same --max-files) —
otherwise the job stops and tells the operator, rather than silently
double-counting or dropping pages.

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

import json
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from umi_collapse_rs_spark.config import DedupConfig
from umi_collapse_rs_spark.plans.incremental import incremental_assign
from umi_collapse_rs_spark.plans.state_store import StateStore
from umi_collapse_rs_spark.streaming.ingest import stream_pages


def _checkpoint_query_id(spark: SparkSession, checkpoint_dir: str) -> str | None:
    """The streaming query id persisted in ``<checkpoint>/metadata`` —
    stable across restarts of the SAME checkpoint, different for a
    fresh one.  (The runId changes on every start; the id is the
    lineage identity we want.)  None until the query has started."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(f"{checkpoint_dir.rstrip('/')}/metadata")
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(path):
        return None
    stream = fs.open(path)
    try:
        txt = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    return json.loads(txt).get("id")


def batch_fingerprint(batch_df: DataFrame) -> str:
    """Order-independent content fingerprint of a micro-batch: row
    count + XOR of per-row xxhash64 over (url, text) — url alone would
    call a re-crawl of the same urls with CHANGED text a "re-delivery".
    One O(batch) aggregate, O(1) driver bytes — never a collect of the
    batch itself."""
    row = batch_df.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(url, text))").alias("x"),
    ).head()
    return f"{row['n']}:{row['x']}"


def incremental_sink(
    spark: SparkSession,
    state_root: str,
    output_root: str,
    cfg: DedupConfig | None = None,
    index_bucket_cap: int | None = 64,
    compact_segments: int = 16,
    checkpoint_dir: str | None = None,
    allow_new_stream: bool = False,
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` function: absorb one micro-batch of
    pages into the state store and write its cluster assignments.

    The state under ``state_root`` must already be bootstrapped
    (``jobs/run_incremental.py --bootstrap``); the stream is the
    steady-state consumer, not the initial load.

    ``checkpoint_dir``: the query's checkpoint location, used to read
    the streaming query id that scopes the batch-id high-water mark to
    one checkpoint lineage (module docstring).  Callers without one
    (tests driving the sink directly) get the in-lineage gate only.

    ``allow_new_stream``: permit a NEW checkpoint lineage to absorb
    batches whose content does not match any committed batch of the
    old lineage.  Off by default — the safe failure mode for "fresh
    checkpoint over existing streaming state" is to stop, not to guess.
    """
    cfg = cfg or DedupConfig(window_tokens=0)
    store = StateStore(spark, state_root)
    if not store.exists():
        raise RuntimeError(
            f"no committed state under {state_root} — bootstrap first "
            "(jobs/run_incremental.py --bootstrap)"
        )
    sid_cache: dict[str, str | None] = {}

    def _stream_id() -> str | None:
        if checkpoint_dir is None:
            return None
        if "sid" not in sid_cache:
            sid_cache["sid"] = _checkpoint_query_id(spark, checkpoint_dir)
        return sid_cache["sid"]

    def absorb(batch_df: DataFrame, batch_id: int) -> None:
        m = store.manifest() or {}
        hwm, prev_sid = m.get("batch_id"), m.get("stream_id")
        sid = _stream_id()
        same_lineage = sid is None or prev_sid is None or sid == prev_sid
        if hwm is not None and same_lineage and batch_id <= hwm:
            return  # true replay of a committed micro-batch
        if batch_df.isEmpty():
            return  # trigger fired with no new files
        fp = batch_fingerprint(batch_df)
        if hwm is not None and not same_lineage:
            # fresh checkpoint over a store with streaming history: ids
            # restarted at 0, so <= hwm proves nothing.  Decide by
            # content (module docstring).
            if fp in (m.get("batch_fps") or {}):
                return  # byte-identical re-delivery of a committed batch
            if not allow_new_stream:
                raise RuntimeError(
                    f"micro-batch {batch_id} arrived from a NEW checkpoint "
                    f"lineage (query id {sid!r} != committed {prev_sid!r}) "
                    f"and its content matches no committed batch — "
                    "absorbing it could double-count pages the old lineage "
                    "already committed if the batching merely shifted. "
                    "Resume with the ORIGINAL checkpoint dir, or pass "
                    "--allow-new-stream after verifying the input is "
                    "genuinely new data."
                )
        res = incremental_assign(
            spark, store.read(), batch_df, cfg, index_bucket_cap=index_bucket_cap
        )
        # idempotent per-batch output dir; written BEFORE the state
        # commit (see module docstring for the crash-point argument)
        res.assignments.write.mode("overwrite").parquet(
            f"{output_root}/batch_id={batch_id}"
        )
        m2 = store.commit_delta(res.delta, batch_id=batch_id, stream_id=sid, batch_fp=fp)
        if (
            compact_segments
            and not m2.get("skipped_replay")
            and len(m2["segments"]) >= compact_segments
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
    allow_new_stream: bool = False,
):
    """Wire source → sink and start the query.

    ``available_now=True`` (default) drains everything currently under
    ``input_path`` in bounded micro-batches and stops — the "catch up
    on pending crawl drops" mode, and the testable one.  Pass False for
    an unbounded continuous query.  ``max_files_per_trigger`` bounds
    micro-batch size (source-side backpressure).
    ``allow_new_stream``: see :func:`incremental_sink`.
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
                checkpoint_dir=checkpoint_dir,
                allow_new_stream=allow_new_stream,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .queryName("incremental_dedup")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
