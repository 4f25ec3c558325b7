"""Stage 7 — canonical-representative election + clusters table.

Reference analog: ``ClusterTracker`` (``/root/reference/src/
cluster_tracker.rs:38-113``) — absorbed-member sets, summed frequency,
dense cluster ids, UMI -> cluster mapping — plus the merge-rule winner
(merge/mod.rs:6-51).  Here the clustering step already returns each
fingerprint's root (the max-freq, tie-min-url member, by construction of
the label key), so canonical election is a join, and cluster stats are
one aggregation.

cluster_id is a 64-bit sha256-derived hash of ``canonical_url``
(functions/sqlfp.hash64_col) — deterministic and stable under resume /
re-partitioning, unlike ``monotonically_increasing_id`` (SURVEY §4
explicitly forbids it), and — unlike the previous ``xxhash64`` — bit-
reproducible by the DuckDB correctness oracle.  The reference's *dense*
running-offset ids (cluster_tracker.rs / deduplicate_sam.rs:215) are an
artifact of its serial loop; the dense variant
(:func:`with_dense_cluster_ids`) exists for tests/exports but is a
global sort — not the default at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from umi_collapse_rs_spark.functions.sqlfp import hash64_col


def with_dense_cluster_ids(clusters: DataFrame) -> DataFrame:
    """Replace the sha-derived ``cluster_id`` with dense 0..n-1 ids —
    the reference's running-offset id space (``ClusterTracker`` dense
    ids, cluster_tracker.rs:61-74, offset at deduplicate_sam.rs:215).

    ``dense_rank`` over ``canonical_url`` (the cluster key) minus 1:
    deterministic, contiguous, and a pure relabeling — the partition
    induced by the dense ids is identical to the sha-id partition by
    construction.  The unpartitioned window is a GLOBAL sort, which is
    why this is an export/test helper, not the pipeline default
    (SURVEY §2 C4)."""
    w = Window.orderBy("canonical_url")
    return clusters.withColumn(
        "cluster_id", (F.dense_rank().over(w) - 1).cast("long")
    )


def build_clusters_table(
    members: DataFrame,      # (url, text_sha)            — every input page
    reps: DataFrame,         # (text_sha, url, freq, ...) — exact-collapse reps
    assignments: DataFrame,  # (url, root_id)             — rep url -> cluster root rep url
) -> DataFrame:
    """Expand rep-level cluster assignments to every page url.

    Returns (url, cluster_id, canonical_url, cluster_size,
    exact_dup_count) — FIXTURES.md §2 `clusters` schema.

    - canonical_url: the *page-level* representative of the root rep's
      exact-dup group (the root rep IS that page: earliest warc_ts,
      min url — merge rule A5 analog).
    - cluster_size: number of input pages in the cluster (sum of exact
      frequencies — cluster_tracker.rs's summed freq).
    - exact_dup_count: size of the page's own exact-dup group (the
      reference's `same_umi` tag, cli.rs:64-76).
    """
    rep_assign = (
        reps.select("text_sha", F.col("url").alias("_rep_url"), "freq")
        .join(assignments, F.col("_rep_url") == assignments["url"], "left")
        .select(
            "text_sha",
            "freq",
            F.coalesce("root_id", "_rep_url").alias("canonical_url"),
        )
    )
    cluster_sizes = rep_assign.groupBy("canonical_url").agg(
        F.sum("freq").alias("cluster_size")
    )
    return (
        members.join(rep_assign, "text_sha")
        .join(cluster_sizes, "canonical_url")
        .select(
            "url",
            hash64_col(F.col("canonical_url")).alias("cluster_id"),
            "canonical_url",
            "cluster_size",
            F.col("freq").alias("exact_dup_count"),
        )
    )
