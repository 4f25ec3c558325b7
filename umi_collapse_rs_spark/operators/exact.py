"""Stage 2 — exact-duplicate collapse (one shuffle).

Reference analog: the per-(group, UMI) merge/count upsert at
``/root/reference/src/deduplicate_sam.rs:160-176`` — first read claims
the slot, the ``Merge`` rule picks the survivor on collision
(merge/mod.rs:6-51), and ``freq`` increments either way.  Re-expressed
as ONE hash aggregation: ``groupBy(text_sha).agg(min_by(...), count)``.

The merge rule is configurable (the reference's ``any``/``avgqual``/
``mapqual`` matrix, merge/mod.rs:6-51, selected per mode at
main.rs:33-39), re-expressed as deterministic total orders — unlike
the reference's first-wins-on-tie which depends on input order (SURVEY
§2.1 D3):

- ``earliest`` (default; the ``mapqual`` analog): earliest ``warc_ts``
  wins, ties broken by lexicographically smallest ``url``.
- ``quality`` (the ``avgqual`` analog): longest raw ``text`` wins —
  within an exact-dup group the *normalized* text is identical, so raw
  length measures pre-normalization richness; ties fall back to
  (warc_ts, url).
- ``any``: smallest ``url`` (the deterministic version of the
  reference's arbitrary first-wins, merge/mod.rs:10-23).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from umi_collapse_rs_spark.functions.normalize import normalize_text_col, text_sha_col

PAGE_COLS = ["url", "warc_ts", "html", "text", "lang"]

MERGE_RULES = ("earliest", "quality", "any")


def merge_order_key(merge: str) -> Column:
    """The min_by ordering struct for a merge rule (smallest key wins).
    Requires columns (url, warc_ts[, text_len])."""
    if merge == "earliest":
        return F.struct("warc_ts", "url")
    if merge == "quality":
        return F.struct((-F.col("text_len")).alias("ql"), F.col("warc_ts"), F.col("url"))
    if merge == "any":
        return F.struct("url")
    raise ValueError(f"unknown merge rule {merge!r}")


def with_norm(pages: DataFrame) -> DataFrame:
    """Stage 1 — add ``text_norm``, ``text_sha`` and ``text_len`` (raw
    length, the quality-merge score; pure codegen)."""
    return (
        pages.withColumn("text_norm", normalize_text_col("text"))
        .withColumn("text_sha", text_sha_col("text_norm"))
        .withColumn("text_len", F.coalesce(F.length("text"), F.lit(0)))
    )


def exact_collapse(
    pages_norm: DataFrame, merge: str = "earliest"
) -> tuple[DataFrame, DataFrame]:
    """Collapse byte-identical normalized texts.

    Returns ``(reps, members)``:

    - ``reps``: one row per distinct text — (text_sha, url, warc_ts,
      text_norm, lang, freq) where the representative is picked by the
      ``merge`` rule and ``freq`` is the group size (the reference's
      UMI frequency, read_freq.rs:4-13).
    - ``members``: (url, text_sha) for every input page, used to expand
      cluster assignments back to all urls (no collect_list — a
      10^7-page exact-dup farm stays distributed).
    """
    reps = (
        pages_norm.groupBy("text_sha")
        .agg(
            F.min_by(
                F.struct("url", "warc_ts", "text_norm", "lang"),
                merge_order_key(merge),
            ).alias("rep"),
            F.count(F.lit(1)).alias("freq"),
        )
        .select(
            "text_sha",
            F.col("rep.url").alias("url"),
            F.col("rep.warc_ts").alias("warc_ts"),
            F.col("rep.text_norm").alias("text_norm"),
            F.col("rep.lang").alias("lang"),
            "freq",
        )
    )
    members = pages_norm.select("url", "text_sha")
    return reps, members
