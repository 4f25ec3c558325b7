"""Stage 2 — exact-duplicate collapse (one shuffle).

Reference analog: the per-(group, UMI) merge/count upsert at
``/root/reference/src/deduplicate_sam.rs:160-176`` — first read claims
the slot, the ``Merge`` rule picks the survivor on collision
(merge/mod.rs:6-51), and ``freq`` increments either way.  Re-expressed
as ONE hash aggregation: ``groupBy(text_sha).agg(min_by(...), count)``.

The merge rule here is the deterministic web analog of ``mapqual``
(merge/mod.rs:39-51): earliest ``warc_ts`` wins, ties broken by
lexicographically smallest ``url`` — a total order, unlike the
reference's first-wins-on-tie which depends on input order (SURVEY §2.1
D3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from umi_collapse_rs_spark.functions.normalize import normalize_text_col, text_sha_col

PAGE_COLS = ["url", "warc_ts", "html", "text", "lang"]


def with_norm(pages: DataFrame) -> DataFrame:
    """Stage 1 — add ``text_norm`` and ``text_sha`` (pure codegen)."""
    return pages.withColumn("text_norm", normalize_text_col("text")).withColumn(
        "text_sha", text_sha_col("text_norm")
    )


def exact_collapse(pages_norm: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Collapse byte-identical normalized texts.

    Returns ``(reps, members)``:

    - ``reps``: one row per distinct text — (text_sha, url, warc_ts,
      text_norm, lang, freq) where the representative is the earliest
      (warc_ts, url) and ``freq`` is the group size (the reference's
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
                F.struct("warc_ts", "url"),
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
