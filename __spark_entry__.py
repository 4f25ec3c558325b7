"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Catalog layout mirrors SURVEY.md §2's operator inventory; every
relational operator has a DuckDB oracle.  Genuinely non-SQL ops
(pandas-UDF fingerprints, LSH candidate generation, the full clustering
pipeline) are rows-only checked here and oracle-checked in tests/
against the pure-Python reference-semantics oracle instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# odd multiplier spreading small ints across ~58 bits; safe from int64
# overflow for n_chars <= 6e4 (Spark 4 runs ANSI mode: overflow throws)
_SPREAD_K = 152851387439217

_EN = r"\b(the|and|of|to|a)\b"
_DE = r"\b(der|die|das|und|ist)\b"
_FR = r"\b(le|la|les|et|est)\b"
_CJK = "[一-鿿]"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _docs_as_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents table reshaped to the pages schema (input_hint)."""
    return _t(spark, sf_dir, "documents").select(
        F.format_string("doc://%07d", "doc_id").alias("url"),
        F.timestamp_seconds(F.lit(1735689600) + F.col("doc_id") * 17).alias("warc_ts"),
        F.encode("text", "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


# ---------------------------------------------------------------------------
# relational operators (oracle-checked)
# ---------------------------------------------------------------------------


def q_exact_collapse(spark, sf_dir):
    """SURVEY §2 A1/A2: exact-dup collapse by normalized text."""
    d = _t(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    return (
        d.select(F.sha2(norm, 256).alias("text_sha"), "doc_id")
        .groupBy("text_sha")
        .agg(F.count(F.lit(1)).alias("freq"), F.min("doc_id").alias("rep_doc_id"))
    )


def q_merge_rule_best(spark, sf_dir):
    """SURVEY §2 A3-A5: merge rule = argmax per group w/ deterministic
    tie-break (max n_chars, then min doc_id) via max_by struct."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy("lang", "source")
        .agg(
            F.max_by(
                F.col("doc_id"), F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("nd"))
            ).alias("best_doc_id"),
            F.max("n_chars").alias("max_chars"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def _merge_rule_query(spark, sf_dir, merge: str):
    """SURVEY §2 A2-A5: the REAL exact-collapse operator under a chosen
    merge rule (reference merge/mod.rs:6-51).  Group key = first two
    normalized tokens (the dup-sparse documents table has no full-text
    exact dups at sf0.01; the 2-token prefix plants non-vacuous groups
    while exercising the operator unchanged)."""
    from umi_collapse_rs_spark.operators.exact import exact_collapse

    pages = _docs_as_pages(spark, sf_dir)
    norm = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    trunc = F.substring_index(norm, " ", 2)
    pages_n = pages.select(
        "url",
        "warc_ts",
        "lang",
        trunc.alias("text_norm"),
        F.sha2(trunc, 256).alias("text_sha"),
        F.length("text").alias("text_len"),
    )
    reps, _ = exact_collapse(pages_n, merge)
    return reps.select("text_sha", F.col("url").alias("rep_url"), "freq")


def q_merge_rule_earliest(spark, sf_dir):
    """Merge rule 'earliest' — the mapqual analog (merge/mod.rs:39-51)."""
    return _merge_rule_query(spark, sf_dir, "earliest")


def q_merge_rule_quality(spark, sf_dir):
    """Merge rule 'quality' — the avgqual analog (merge/mod.rs:25-37):
    longest raw text wins, deterministic tie-break."""
    return _merge_rule_query(spark, sf_dir, "quality")


def q_merge_rule_any(spark, sf_dir):
    """Merge rule 'any' — deterministic first-wins (merge/mod.rs:10-23)."""
    return _merge_rule_query(spark, sf_dir, "any")


def q_filter_stats(spark, sf_dir):
    """SURVEY §2 F1-F3 + A6: filters as counters (global stats)."""
    d = _t(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count_if(F.col("n_chars") > 400).alias("n_long"),
        F.count_if(F.col("lang") == "en").alias("n_en"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
    )


def q_grouped_stats(spark, sf_dir):
    """SURVEY §2 A6: per-group stats (unique positions / max UMIs analog)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
            F.max("n_chars").alias("max_chars"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


def q_semi_join(spark, sf_dir):
    """SURVEY §2 J4/S3: mate-recovery semi-join analog."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


def q_anti_join(spark, sf_dir):
    """SURVEY §2 J5: unclustered = unique pages analog (anti join)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_acctbal"
    )


def q_window_rank(spark, sf_dir):
    """SURVEY §2 O1: per-group rank by freq desc w/ total order."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        d.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("lang", "doc_id", "n_chars", "rnk")
    )


def q_set_ops(spark, sf_dir):
    """SURVEY §2 set ops: unionByName + dropDuplicates."""
    d = _t(spark, sf_dir, "documents")
    a = d.filter(F.col("lang") == "en").select("doc_id", "source")
    b = d.filter(F.col("n_chars") < 100).select("doc_id", "source")
    return a.unionByName(b).dropDuplicates(["doc_id"]).select("doc_id", "source")


def q_hamming_self_join(spark, sf_dir):
    """SURVEY §2 J1/J2: banded Hamming self-join, oracle = brute force.

    Fingerprint = n_chars * K (SQL-computable on both engines) so the
    banding/verify machinery is checked end-to-end against a full
    O(n^2) scan."""
    from umi_collapse_rs_spark.operators.candidates import simhash_band_pairs

    d = _t(spark, sf_dir, "documents")
    fp = d.select(
        F.col("doc_id"), (F.col("n_chars") * F.lit(_SPREAD_K)).alias("simhash"), F.lit(1).alias("freq")
    )
    return simhash_band_pairs(
        fp, hamming_k=3, bands=4, cap=1_000_000, chain_width=4, id_col="doc_id"
    ).select("src", "dst", "dist")


def q_ngram_jaccard(spark, sf_dir):
    """Training-data dedup: exact token-set Jaccard >= 0.5 within
    (lang, source) blocks via PPJoin-style prefix filtering — hot
    tokens never expand quadratically, result identical to the naive
    all-token join (operators/jaccard.py; the oracle is the naive
    formulation)."""
    from umi_collapse_rs_spark.operators.jaccard import token_jaccard_pairs

    d = _t(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    pairs = token_jaccard_pairs(
        d, 0.5, id_col="doc_id", text_col="text", block_cols=["lang", "source"]
    )
    return pairs.select("src", "dst", F.round("jaccard", 4).alias("jaccard"))


def q_token_count(spark, sf_dir):
    """Text analysis: whitespace token counting."""
    d = _t(spark, sf_dir, "documents")
    n_tok = F.when(F.length(F.trim("text")) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim("text"), r"\s+"))
    )
    return d.select("doc_id", n_tok.alias("n_tokens"))


def q_token_count_bpe(spark, sf_dir):
    """Text analysis: BPE-ish pre-tokenizer count — letter runs, digit
    runs, and single non-space punctuation each count as one token
    (the GPT-2-style pre-split shape, ASCII form so the Java and RE2
    regex engines agree; no lookarounds)."""
    d = _t(spark, sf_dir, "documents")
    pat = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit(pat)).alias("n_bpe_tokens"),
    )


def q_rolling_fingerprint(spark, sf_dir):
    """Text analysis: polynomial rolling-hash document fingerprint over
    the character stream (h = (h*31 + code) mod (2^31-1)) — the
    order-sensitive cheap fingerprint family (reference analog: the
    31-multiplier rolling hash at utils/mod.rs:17-21).  Computed as a
    fold over the char array; modular step keeps ANSI-mode int64 from
    overflowing in both engines."""
    d = _t(spark, sf_dir, "documents")
    m = 2_147_483_647
    codes = F.transform(
        F.sequence(F.lit(1), F.length("text")),
        lambda i: F.ascii(F.col("text").substr(i, F.lit(1))).cast("long"),
    )
    fp = F.aggregate(codes, F.lit(0).cast("long"), lambda acc, x: (acc * 31 + x) % m)
    return d.select(
        "doc_id",
        F.when(F.length("text") == 0, F.lit(0).cast("long")).otherwise(fp).alias("rolling_fp"),
    )


def q_quality_score(spark, sf_dir):
    """Text analysis: quality scoring (length/punct/stopword ratios)."""
    d = _t(spark, sf_dir, "documents")
    low = F.lower("text")
    n_tok = F.when(F.length(F.trim("text")) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim("text"), r"\s+"))
    )
    punct = F.length(F.regexp_replace("text", r"[^.!?,;]", ""))
    sw = F.regexp_count(low, F.lit(_EN))
    d2 = d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(punct / F.greatest(F.length("text"), F.lit(1)), 4).alias("punct_ratio"),
        F.round(sw / F.greatest(n_tok, F.lit(1)), 4).alias("stopword_ratio"),
    )
    return d2.withColumn(
        "quality",
        F.round(
            F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0))
            * (1 - F.col("punct_ratio")),
            4,
        ),
    )


def q_lang_id(spark, sf_dir):
    """Text analysis: n-gram/stopword language-ID heuristic."""
    d = _t(spark, sf_dir, "documents")
    low = F.lower("text")
    en, de, fr = (F.regexp_count(low, F.lit(p)) for p in (_EN, _DE, _FR))
    cjk = F.regexp_count("text", F.lit(_CJK))
    d2 = d.select(
        "doc_id",
        en.alias("en_hits"),
        de.alias("de_hits"),
        fr.alias("fr_hits"),
        cjk.alias("cjk_hits"),
    )
    pred = (
        F.when(F.col("cjk_hits") > 0, "zh")
        .when(
            (F.col("en_hits") >= F.col("de_hits")) & (F.col("en_hits") >= F.col("fr_hits")),
            "en",
        )
        .when(F.col("de_hits") >= F.col("fr_hits"), "de")
        .otherwise("fr")
    )
    return d2.withColumn("predicted_lang", pred)


def q_doc_fingerprint(spark, sf_dir):
    """Text analysis: stable document fingerprint (sha256 of raw text)."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", F.sha2(F.col("text"), 256).alias("fp"))


def q_multimodal_meta(spark, sf_dir):
    """Multimodal plumbing: opaque binary column + typed metadata
    (byte length, content hash) — the decode step itself is stubbed
    (see umi_collapse_rs_spark/functions/multimodal.py)."""
    d = _t(spark, sf_dir, "documents")
    blob = F.encode("text", "UTF-8")
    return d.select(
        "doc_id",
        F.length(blob).alias("n_bytes"),
        F.sha2(blob, 256).alias("content_sha"),
    )


def q_multimodal_decode(spark, sf_dir):
    """Multimodal decode through the REAL mapInPandas operator
    (functions/multimodal.extract_image_meta, fake decoder): the
    deterministic pseudo-decode derives width/height from sha256 bytes,
    so the Arrow-batched Python stage itself is oracle-checked — the
    DuckDB twin replays the same hex arithmetic."""
    from umi_collapse_rs_spark.functions.multimodal import extract_image_meta

    d = _t(spark, sf_dir, "documents")
    blobs = d.select("doc_id", F.encode("text", "UTF-8").alias("blob"))
    return extract_image_meta(blobs, "doc_id", "blob", fake=True).select(
        "id", "n_bytes", "content_sha", "width", "height"
    )


def q_multimodal_resize(spark, sf_dir):
    """Distributed image resize (functions/multimodal.resize_images,
    fake path: resized hash = sha256(hex(sha256(blob)) + ':WxH')) —
    map-only mapInPandas, one row per input."""
    from umi_collapse_rs_spark.functions.multimodal import resize_images

    d = _t(spark, sf_dir, "documents")
    blobs = d.select("doc_id", F.encode("text", "UTF-8").alias("blob"))
    return resize_images(blobs, "doc_id", "blob", target_w=64, target_h=64, fake=True)


def q_multimodal_frames(spark, sf_dir):
    """Frame sampling (functions/multimodal.sample_frames): the
    cardinality-CHANGING mapInPandas — each blob yields
    1 + byte2(sha256) % 8 frame rows, hashes replayable in SQL."""
    from umi_collapse_rs_spark.functions.multimodal import sample_frames

    d = _t(spark, sf_dir, "documents")
    blobs = d.select("doc_id", F.encode("text", "UTF-8").alias("blob"))
    return sample_frames(blobs, "doc_id", "blob", max_frames=8, fake=True)


def q_event_window_agg(spark, sf_dir):
    """Streaming analog (batch form): hourly tumbling-window aggregate.
    The same plan runs under Structured Streaming via readStream."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def q_cosine_topk(spark, sf_dir):
    """Similarity search: brute-force cosine top-3 neighbors for the
    first 10 query vectors (the exact baseline an IVF/LSH path is
    measured against)."""
    e = _t(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    dot = F.aggregate(
        F.zip_with("qe", "embedding", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    nrm = lambda c: F.sqrt(
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    pairs = (
        qv.crossJoin(e)
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn("sim", dot / (nrm(F.col("qe")) * nrm(F.col("embedding"))))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("qid", F.col("vec_id").alias("neighbor_id"), F.round("sim", 4).alias("cos_sim"), "rnk")
    )


# ---------------------------------------------------------------------------
# sql-fingerprint pipeline queries (driver-oracle-checked end to end)
#
# The production pipeline hashes shingles with pd.util.hash_array inside
# the pandas UDF ('numpy' mode — benched by bench.py, recall-verified in
# tests).  These driver queries run the SAME operators in 'sql'
# fingerprint mode (sha256-based Column expressions, functions/sqlfp.py)
# so DuckDB can recompute every value: fingerprints, candidates, verify,
# gate, clustering, clusters table all get a bit-exact oracle.
# ---------------------------------------------------------------------------

# Must stay in lockstep with umi_collapse_rs_spark/oracles.py constants.
_SQL_PIPELINE_CFG = dict(
    fingerprint="sql",
    minhash_perms=16,
    lsh_bands=16,
    window_tokens=0,     # substring pass is numpy-mode-only (empty win_hashes)
    bucket_pair_cap=10_000,  # uncapped at sf0.01 => banding is exact, oracle brute-forces
    jaccard_threshold=0.5,
)


def q_embedding_near_dup_pairs(spark, sf_dir):
    """Training-data dedup: embedding-cosine near-duplicate pairs,
    LSH-blocked (pairs whose 4-plane bucket signatures differ in <= 1
    bit) — an equi-join on probe buckets, no crossJoin in the plan.
    The oracle applies the identical blocking predicate.  Threshold
    0.35: the synthetic embeddings are near-orthogonal, so it sits
    where pairs exist and the operator is exercised non-vacuously."""
    from umi_collapse_rs_spark.functions.embeddings import lsh_blocked_near_dup_pairs

    e = _t(spark, sf_dir, "embeddings")
    return lsh_blocked_near_dup_pairs(e, "vec_id", "embedding", threshold=0.35)


def q_simhash_fingerprints(spark, sf_dir):
    """SURVEY §2 P1/X3: text -> SimHash fingerprint, sql-reproducible
    form (sha256 shingle hashes, pure Column expressions).  The numpy
    pandas-UDF twin computes the same family (unit vectors + recall in
    tests/test_fingerprint_core.py)."""
    from umi_collapse_rs_spark.functions.sqlfp import with_sql_fingerprints

    d = _t(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    return with_sql_fingerprints(
        d.select("doc_id", norm.alias("text_norm")), "text_norm", 3, 16, id_col="doc_id"
    ).select("doc_id", "simhash")


def q_minhash_lsh_pairs(spark, sf_dir):
    """SURVEY §2 J1: MinHash-LSH candidate pairs over documents —
    sql-reproducible band values through the real bucket-join operator
    (pairs_from_buckets), uncapped so the oracle is a plain band
    equi-join."""
    from umi_collapse_rs_spark.functions.sqlfp import with_sql_fingerprints
    from umi_collapse_rs_spark.operators.candidates import minhash_lsh_pairs

    d = _t(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    fp = (
        with_sql_fingerprints(
            d.select("doc_id", norm.alias("text_norm")), "text_norm", 3, 16, id_col="doc_id"
        )
        .select("doc_id", "simhash", "mh_bands")
        # cut the plan: the sha-expression fingerprints feed BOTH sides
        # of the bucket self-join — without this they are recomputed
        # per side (measured 89 s vs ~3 s at sf0.1)
        .localCheckpoint(eager=False)
    )
    return (
        minhash_lsh_pairs(fp, cap=10_000, chain_width=4, id_col="doc_id")
        .select("src", "dst")
        .dropDuplicates(["src", "dst"])
    )


def q_dedup_clusters(spark, sf_dir, algo: str = "dir"):
    """The flagship: full near-dup pipeline (SURVEY §7.1) over the
    documents table reshaped to pages, in sql-fingerprint mode so the
    DuckDB oracle recomputes the entire result (fingerprints ->
    candidates -> verify -> gate -> cluster -> clusters table).
    bench.py runs the numpy-mode pipeline for throughput."""
    from umi_collapse_rs_spark.config import DedupConfig
    from umi_collapse_rs_spark.plans.pipeline import run_dedup_pipeline

    pages = _docs_as_pages(spark, sf_dir)
    res = run_dedup_pipeline(spark, pages, DedupConfig(algo=algo, **_SQL_PIPELINE_CFG))
    return res.clusters


def q_canonical_pages(spark, sf_dir):
    """The pipeline's canonical_pages output (stage 7 -> 9): one row
    per cluster, the kept representative page with its text re-read
    from the source scan (reference analog: the BAM sink writes only
    surviving reads, deduplicate_sam.rs:339-413).  text_fp = sha256 of
    the re-read text pins the byte-identical per-url invariant through
    the output join; the oracle recomputes the full dir closure and the
    same join (r3 verdict item #7: the clusters table was hash-checked,
    this output join was previously pytest-only)."""
    from umi_collapse_rs_spark.config import DedupConfig
    from umi_collapse_rs_spark.plans.pipeline import run_dedup_pipeline

    pages = _docs_as_pages(spark, sf_dir)
    res = run_dedup_pipeline(spark, pages, DedupConfig(algo="dir", **_SQL_PIPELINE_CFG))
    return res.canonical_pages.select(
        "url", "cluster_id", "cluster_size", F.sha2("text", 256).alias("text_fp")
    )


def q_dedup_clusters_numpy(spark, sf_dir):
    """bench.py twin of q_dedup_clusters in PRODUCTION fingerprint mode
    (numpy pandas-UDF, default DedupConfig) — deliberately NOT in
    queries(): the pd.util.hash_array shingle hashes have no SQL twin,
    so its fidelity is covered by the pytest recall/golden suites while
    the sql-mode twin carries the driver oracle.  Exists so BENCH_r*
    tracks both identities under mode-tagged keys (r2 verdict item #4)."""
    from umi_collapse_rs_spark.config import DedupConfig
    from umi_collapse_rs_spark.plans.pipeline import run_dedup_pipeline

    pages = _docs_as_pages(spark, sf_dir)
    return run_dedup_pipeline(spark, pages, DedupConfig()).clusters


def q_dedup_clusters_cc(spark, sf_dir):
    """Connected-components clustering rule (SURVEY §2 C3 — advertised
    but unimplemented in the reference; native here)."""
    return q_dedup_clusters(spark, sf_dir, algo="cc")


def q_dedup_clusters_adj(spark, sf_dir):
    """One-hop greedy adjacency rule (SURVEY §2 C2, upstream-Java
    semantics; the Rust adj's max_freq=0 quirk noted in §2.1 D2)."""
    return q_dedup_clusters(spark, sf_dir, algo="adj")


def q_near_dup_pairs(spark, sf_dir):
    """Verified near-duplicate pair list (SURVEY §2 J1 + §2 edge union):
    the engine's edge evidence with signature similarity, sql-fingerprint
    mode (oracle brute-forces the same predicate over all pairs)."""
    from umi_collapse_rs_spark.config import DedupConfig
    from umi_collapse_rs_spark.plans.pipeline import run_dedup_pipeline

    pages = _docs_as_pages(spark, sf_dir)
    res = run_dedup_pipeline(spark, pages, DedupConfig(**_SQL_PIPELINE_CFG))
    return res.pairs.select(
        "src", "dst", "dist", F.round("sig_sim", 4).alias("sig_sim")
    )


def q_embedding_lsh_ann(spark, sf_dir):
    """Similarity search, scale path: multiprobe hyperplane-LSH
    bucketing with a per-bucket neighbor cap + exact cosine re-rank —
    the distributed ANN variant (dim is a parameter, no driver-side
    inference; within-bucket expansion bounded by the cap).

    Plane count auto-scales to the corpus (log2(n / bucket_cap), from
    parquet footer metadata — no Spark job) with Hamming-2 multiprobe:
    the r2-verdict fix for the recall-dead fixed-16-planes default
    (recall@3 0.004 -> 0.906 at sf0.01, BENCH/ANN.md)."""
    from umi_collapse_rs_spark.functions.embeddings import (
        hyperplane_lsh_topk,
        parquet_num_rows,
    )

    e = _t(spark, sf_dir, "embeddings")
    n = parquet_num_rows(f"{sf_dir}/embeddings.parquet")
    return hyperplane_lsh_topk(e, "vec_id", "embedding", n_rows=n, probe_hamming=2)


def q_substring_overlap_pairs(spark, sf_dir):
    """SURVEY §7.1 stage 8 family: long-verbatim-overlap pairs via
    content-defined window fingerprints, sql-reproducible form — anchor
    positions are token positions whose hash % stride == 0, window
    fingerprint = hash of the 16-token span, pairs share >= 2 windows.
    Runs the REAL window_overlap_pairs operator; the numpy-mode twin
    (64-token windows, prefix-sum hashes) is recall-tested in tests/."""
    from umi_collapse_rs_spark.functions.sqlfp import hash60_col
    from umi_collapse_rs_spark.operators.candidates import window_overlap_pairs

    W, S, min_shared = 16, 4, 2
    d = _t(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    toks = F.split(norm, " ")
    n = F.size(toks)
    anchors = F.filter(
        F.sequence(F.lit(1), F.greatest(n - W + 1, F.lit(1))),
        lambda i: hash60_col(F.element_at(toks, i)) % S == 0,
    )
    wins = F.when(n < W, F.array().cast("array<long>")).otherwise(
        F.array_distinct(
            F.transform(anchors, lambda i: hash60_col(F.array_join(F.slice(toks, i, W), " ")))
        )
    )
    docs = d.select("doc_id", wins.alias("win_hashes")).localCheckpoint(eager=False)
    # cap=10_000 (same convention as the other oracle queries): the
    # all-pairs self-join branch applies to every realistic bucket, so
    # the min_shared >= 2 evidence gate is exact and matches the
    # oracle's HAVING count(*) >= 2 regardless of boilerplate bucket
    # sizes (the old cap=33 made parity data-dependent — ADVICE r2)
    return window_overlap_pairs(
        docs, min_shared, cap=10_000, chain_width=4, id_col="doc_id"
    ).select("src", "dst")


def q_embedding_multitable_ann(spark, sf_dir):
    """Similarity search, multi-table variant: 16 independent
    hyperplane-LSH tables whose per-table plane count auto-scales to
    the corpus by the same occupancy rule as the single-table path
    (log2(n / bucket_cap) from parquet footer metadata — r3 verdict
    item #5: the fixed 6 planes left buckets far under the cap at
    sf0.01, wasting the probe budget), per-(table, bucket) neighbor
    caps, pair dedup before the exact-cosine re-rank (BENCH/ANN.md;
    functions/embeddings.multitable_lsh_topk)."""
    from umi_collapse_rs_spark.functions.embeddings import (
        multitable_lsh_topk,
        parquet_num_rows,
    )

    e = _t(spark, sf_dir, "embeddings")
    n = parquet_num_rows(f"{sf_dir}/embeddings.parquet")
    return multitable_lsh_topk(e, "vec_id", "embedding", n_rows=n)


def q_embedding_ivf_ann(spark, sf_dir):
    """Similarity search, IVF variant: deterministic unit-norm coarse
    quantizer (seed-random baseline), nprobe=5 inverted-list probing,
    capped lists, exact cosine re-rank (functions/embeddings.ivf_topk,
    defaults pinned here so docs and code stay locked together)."""
    from umi_collapse_rs_spark.functions.embeddings import ivf_topk

    e = _t(spark, sf_dir, "embeddings")
    return ivf_topk(e, "vec_id", "embedding", nprobe=5)


def q_embedding_ivf_fitted_ann(spark, sf_dir):
    """Similarity search, fitted-IVF variant: the coarse quantizer is a
    spherical k-means fit on a bounded deterministic sample of the SAME
    corpus (functions/embeddings.fit_ivf_centroids — driver-side
    pyarrow read, <=64k rows, centroids become plan literals), then the
    identical capped-inverted-list probing as embedding_ivf_ann, with
    2-way multi-assignment (each vector lives in its 2 nearest lists —
    r4 verdict item #3; k-means++ seeding measured WORSE on these
    near-uniform vectors and was rejected, see ivf_topk docstring).
    Measured recall@3 0.523 -> 0.703 -> 0.875 at the same
    nprobe x list_cap candidate bound (BENCH/ANN.md)."""
    from umi_collapse_rs_spark.functions.embeddings import fit_ivf_centroids, ivf_topk

    e = _t(spark, sf_dir, "embeddings")
    cents = fit_ivf_centroids(f"{sf_dir}/embeddings.parquet")
    return ivf_topk(
        e, "vec_id", "embedding", nprobe=5, centroids=cents, assign_replicas=2
    )


def q_incremental_assign(spark, sf_dir):
    """Incremental dedup (plans/incremental.py — no reference analog;
    the operation a 10^12-doc pipeline performs per crawl snapshot):
    documents split 80/20 by doc_id %% 5 == 4; the old 80%% runs the
    full dir pipeline (sql-fingerprint mode) and its state (sha index +
    canonical fingerprints) absorbs the new batch — the 20%% plus a
    deterministic recrawl (every doc_id %% 25 == 0 page re-fetched
    byte-identical under a recrawl:// url, exercising the exact path;
    the documents table itself has no exact dups).  Output: one row
    per new page (url, canonical_url, via in exact|near|new).  The
    oracle recomputes the whole thing: old pipeline closure, state,
    cross probe + gate, residual closure — two recursive CTEs."""
    from umi_collapse_rs_spark.config import DedupConfig
    from umi_collapse_rs_spark.plans.incremental import build_state, incremental_assign
    from umi_collapse_rs_spark.plans.pipeline import run_dedup_pipeline

    d = _t(spark, sf_dir, "documents")
    base = d.select(
        F.format_string("doc://%07d", "doc_id").alias("url"),
        F.timestamp_seconds(F.lit(1735689600) + F.col("doc_id") * 17).alias("warc_ts"),
        "text",
        "lang",
        (F.col("doc_id") % 5 == 4).alias("is_new"),
    )
    recrawl = d.filter(F.col("doc_id") % 25 == 0).select(
        F.format_string("recrawl://%07d", "doc_id").alias("url"),
        F.timestamp_seconds(
            F.lit(1735689600) + F.col("doc_id") * 17 + F.lit(1000000)
        ).alias("warc_ts"),
        "text",
        "lang",
        F.lit(True).alias("is_new"),
    )
    pages = base.unionByName(recrawl)
    cfg = DedupConfig(algo="dir", **_SQL_PIPELINE_CFG)
    res = run_dedup_pipeline(spark, pages.filter(~F.col("is_new")).drop("is_new"), cfg)
    state = build_state(res)
    inc = incremental_assign(
        spark, state, pages.filter(F.col("is_new")).drop("is_new"), cfg
    )
    return inc.assignments


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.
    Runs the production (numpy-fingerprint) pipeline."""
    from umi_collapse_rs_spark.config import DedupConfig
    from umi_collapse_rs_spark.plans.pipeline import run_dedup_pipeline

    pages = _docs_as_pages(spark, "/root/testdata/sf0.001")
    return run_dedup_pipeline(spark, pages, DedupConfig()).clusters


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "exact_collapse": q_exact_collapse,
        "merge_rule_best": q_merge_rule_best,
        "merge_rule_earliest": q_merge_rule_earliest,
        "merge_rule_quality": q_merge_rule_quality,
        "merge_rule_any": q_merge_rule_any,
        "filter_stats": q_filter_stats,
        "grouped_stats": q_grouped_stats,
        "semi_join": q_semi_join,
        "anti_join": q_anti_join,
        "window_rank": q_window_rank,
        "set_ops": q_set_ops,
        "hamming_self_join": q_hamming_self_join,
        "ngram_jaccard": q_ngram_jaccard,
        "token_count": q_token_count,
        "token_count_bpe": q_token_count_bpe,
        "rolling_fingerprint": q_rolling_fingerprint,
        "quality_score": q_quality_score,
        "lang_id": q_lang_id,
        "doc_fingerprint": q_doc_fingerprint,
        "multimodal_meta": q_multimodal_meta,
        "multimodal_decode": q_multimodal_decode,
        "multimodal_resize": q_multimodal_resize,
        "multimodal_frames": q_multimodal_frames,
        "event_window_agg": q_event_window_agg,
        "cosine_topk": q_cosine_topk,
        "embedding_near_dup_pairs": q_embedding_near_dup_pairs,
        "simhash_fingerprints": q_simhash_fingerprints,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "dedup_clusters": q_dedup_clusters,
        "canonical_pages": q_canonical_pages,
        "dedup_clusters_cc": q_dedup_clusters_cc,
        "dedup_clusters_adj": q_dedup_clusters_adj,
        "near_dup_pairs": q_near_dup_pairs,
        "embedding_lsh_ann": q_embedding_lsh_ann,
        "embedding_multitable_ann": q_embedding_multitable_ann,
        "embedding_ivf_ann": q_embedding_ivf_ann,
        "embedding_ivf_fitted_ann": q_embedding_ivf_fitted_ann,
        "substring_overlap_pairs": q_substring_overlap_pairs,
        "incremental_assign": q_incremental_assign,
    }


def oracle_sql() -> dict[str, str]:
    from umi_collapse_rs_spark import oracles
    from umi_collapse_rs_spark.functions import embeddings as _embeddings

    out = _data_dependent_oracles()
    out.update({
        "simhash_fingerprints": oracles.simhash_fingerprints_oracle_sql(),
        "minhash_lsh_pairs": oracles.minhash_lsh_pairs_oracle_sql(),
        "merge_rule_earliest": oracles.merge_rule_oracle_sql("earliest"),
        "merge_rule_quality": oracles.merge_rule_oracle_sql("quality"),
        "merge_rule_any": oracles.merge_rule_oracle_sql("any"),
        "dedup_clusters": oracles.dedup_clusters_oracle_sql("dir"),
        "canonical_pages": oracles.canonical_pages_oracle_sql(),
        "dedup_clusters_cc": oracles.dedup_clusters_oracle_sql("cc"),
        "dedup_clusters_adj": oracles.dedup_clusters_oracle_sql("adj"),
        "near_dup_pairs": oracles.near_dup_pairs_oracle_sql(),
        "substring_overlap_pairs": oracles.substring_overlap_oracle_sql(),
        "incremental_assign": oracles.incremental_assign_oracle_sql(),
        "exact_collapse": """
            SELECT sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS text_sha,
                   count(*) AS freq,
                   min(doc_id) AS rep_doc_id
            FROM documents
            GROUP BY 1
        """,
        "merge_rule_best": """
            WITH ranked AS (
                SELECT lang, source, doc_id, n_chars,
                       row_number() OVER (PARTITION BY lang, source
                                          ORDER BY n_chars DESC, doc_id ASC) AS rn
                FROM documents
            )
            SELECT r.lang, r.source, r.doc_id AS best_doc_id,
                   m.max_chars, m.n_docs
            FROM ranked r
            JOIN (SELECT lang, source, max(n_chars) AS max_chars,
                         count(*) AS n_docs
                  FROM documents GROUP BY 1, 2) m
              USING (lang, source)
            WHERE r.rn = 1
        """,
        "filter_stats": """
            SELECT count(*) AS n_total,
                   count(*) FILTER (n_chars > 400) AS n_long,
                   count(*) FILTER (lang = 'en') AS n_en,
                   count(DISTINCT lang) AS n_langs,
                   count(DISTINCT source) AS n_sources
            FROM documents
        """,
        "grouped_stats": """
            SELECT lang, count(*) AS n_docs,
                   round(avg(n_chars), 2) AS avg_chars,
                   max(n_chars) AS max_chars,
                   count(DISTINCT source) AS n_sources
            FROM documents GROUP BY lang
        """,
        "semi_join": """
            SELECT c_custkey, c_name, c_mktsegment FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 100000)
        """,
        "anti_join": """
            SELECT c_custkey, c_acctbal FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey)
        """,
        "window_rank": """
            SELECT lang, doc_id, n_chars, rnk FROM (
                SELECT lang, doc_id, n_chars,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY n_chars DESC, doc_id ASC) AS rnk
                FROM documents) t
            WHERE rnk <= 3
        """,
        "set_ops": """
            SELECT doc_id, min(source) AS source FROM (
                SELECT doc_id, source FROM documents WHERE lang = 'en'
                UNION ALL
                SELECT doc_id, source FROM documents WHERE n_chars < 100
            ) u GROUP BY doc_id
        """,
        "hamming_self_join": f"""
            WITH f AS (SELECT doc_id, n_chars * {_SPREAD_K} AS fp FROM documents)
            SELECT a.doc_id AS src, b.doc_id AS dst,
                   bit_count(xor(a.fp, b.fp)) AS dist
            FROM f a JOIN f b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.fp, b.fp)) <= 3
        """,
        "ngram_jaccard": """
            WITH d AS (SELECT * FROM documents WHERE length(trim(text)) > 0),
            tok AS (
                SELECT DISTINCT doc_id, lang, source,
                       unnest(string_split_regex(lower(text), '\\s+')) AS tok
                FROM d
            ),
            cnt AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
            inter AS (
                SELECT a.doc_id AS src, b.doc_id AS dst, count(*) AS i
                FROM tok a JOIN tok b
                  ON a.tok = b.tok AND a.lang = b.lang AND a.source = b.source
                 AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT src, dst,
                   round(i / (na.n + nb.n - i), 4) AS jaccard
            FROM inter
            JOIN cnt na ON na.doc_id = src
            JOIN cnt nb ON nb.doc_id = dst
            WHERE i / (na.n + nb.n - i) >= 0.5
        """,
        "token_count": """
            SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens
            FROM documents
        """,
        "token_count_bpe": r"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens
            FROM documents
        """,
        "rolling_fingerprint": """
            SELECT doc_id,
                   CASE WHEN length(text) = 0 THEN 0
                        ELSE list_reduce(
                               list_prepend(0::BIGINT,
                                 list_transform(range(1, length(text) + 1),
                                                i -> ascii(text[i])::BIGINT)),
                               (acc, x) -> (acc * 31 + x) % 2147483647)
                   END AS rolling_fp
            FROM documents
        """,
        "quality_score": f"""
            WITH b AS (
                SELECT doc_id,
                       CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
                       length(regexp_replace(text, '[^.!?,;]', '', 'g')) AS punct,
                       len(regexp_extract_all(lower(text), '{_EN}')) AS sw,
                       length(text) AS L
                FROM documents
            )
            SELECT doc_id, n_tokens,
                   round(punct / greatest(L, 1), 4) AS punct_ratio,
                   round(sw / greatest(n_tokens, 1), 4) AS stopword_ratio,
                   round(least(n_tokens / 100.0, 1.0) * (1 - round(punct / greatest(L, 1), 4)), 4) AS quality
            FROM b
        """,
        "lang_id": f"""
            WITH h AS (
                SELECT doc_id,
                       len(regexp_extract_all(lower(text), '{_EN}')) AS en_hits,
                       len(regexp_extract_all(lower(text), '{_DE}')) AS de_hits,
                       len(regexp_extract_all(lower(text), '{_FR}')) AS fr_hits,
                       len(regexp_extract_all(text, '{_CJK}')) AS cjk_hits
                FROM documents
            )
            SELECT doc_id, en_hits, de_hits, fr_hits, cjk_hits,
                   CASE WHEN cjk_hits > 0 THEN 'zh'
                        WHEN en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
                        WHEN de_hits >= fr_hits THEN 'de'
                        ELSE 'fr' END AS predicted_lang
            FROM h
        """,
        "doc_fingerprint": """
            SELECT doc_id, sha256(text) AS fp FROM documents
        """,
        "multimodal_meta": """
            SELECT doc_id,
                   octet_length(encode(text)) AS n_bytes,
                   sha256(text) AS content_sha
            FROM documents
        """,
        "multimodal_decode": """
            SELECT doc_id AS id,
                   octet_length(encode(text)) AS n_bytes,
                   sha256(text) AS content_sha,
                   16 + ('0x' || substr(sha256(text), 1, 2))::INT % 240 AS width,
                   16 + ('0x' || substr(sha256(text), 3, 2))::INT % 240 AS height
            FROM documents
        """,
        "multimodal_resize": """
            SELECT doc_id AS id,
                   64 AS width, 64 AS height,
                   sha256(sha256(text) || ':64x64') AS resized_sha,
                   64 * 64 * 3 AS n_bytes_out
            FROM documents
        """,
        "multimodal_frames": """
            SELECT id, f.frame_idx, f.frame_sha
            FROM (
                SELECT doc_id AS id,
                       unnest(list_transform(
                           range(1 + ('0x' || substr(sha256(text), 5, 2))::INT % 8),
                           i -> {'frame_idx': i,
                                 'frame_sha': sha256(sha256(text) || '#' || i)})) AS f
                FROM documents
            )
        """,
        "event_window_agg": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
                   event_type,
                   count(*) AS n_events,
                   round(sum(value), 2) AS sum_value,
                   count(DISTINCT user_id) AS n_users
            FROM events GROUP BY 1, 2
        """,
        "embedding_near_dup_pairs": _embeddings.lsh_blocked_near_dup_oracle_sql(0.35),
        "embedding_ivf_ann": _embeddings.ivf_topk_oracle_sql(),
        "cosine_topk": """
            WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
            pairs AS (
                SELECT q.qid, e.vec_id,
                       list_sum(list_transform(list_zip(q.qe, e.embedding),
                                x -> x[1]::DOUBLE * x[2]::DOUBLE))
                       / (sqrt(list_sum(list_transform(q.qe, v -> v::DOUBLE * v::DOUBLE)))
                          * sqrt(list_sum(list_transform(e.embedding, v -> v::DOUBLE * v::DOUBLE)))) AS sim
                FROM q, embeddings e
                WHERE e.vec_id != q.qid
            ),
            ranked AS (
                SELECT qid, vec_id, sim,
                       row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS rnk
                FROM pairs
            )
            SELECT qid, vec_id AS neighbor_id, round(sim, 4) AS cos_sim, rnk
            FROM ranked WHERE rnk <= 3
        """,
    })
    return out


def _data_dependent_oracles() -> dict[str, str]:
    """ANN oracle entries whose SQL embeds data-derived literals (auto
    plane counts, fitted k-means centroids).  The driver compares Spark
    vs oracle at sf=0.01, so these are derived from the SAME parquet
    file the Spark queries read at that sf — resolved from
    SPARK_GRAFT_ORACLE_SF_DIR (default the driver's /root/testdata/
    sf0.01) instead of a hardcoded path, and SKIPPED (the driver then
    records a rows-only check) rather than crashing the whole registry
    when the fixture is absent on this host (ADVICE r3: building the
    dict for ANY query used to do file I/O + a 20-iteration k-means fit
    against a hardcoded absolute path)."""
    import os

    from umi_collapse_rs_spark.functions import embeddings as _embeddings

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    emb_path = f"{sf_dir}/embeddings.parquet"
    if not os.path.exists(emb_path):
        return {}
    n = _embeddings.parquet_num_rows(emb_path)
    return {
        "embedding_lsh_ann": _embeddings.hyperplane_lsh_topk_oracle_sql(
            n_rows=n, probe_hamming=2
        ),
        "embedding_multitable_ann": _embeddings.multitable_lsh_topk_oracle_sql(
            n_rows=n
        ),
        "embedding_ivf_fitted_ann": _embeddings.ivf_topk_oracle_sql(
            centroids=_embeddings.fit_ivf_centroids(emb_path), assign_replicas=2
        ),
    }
