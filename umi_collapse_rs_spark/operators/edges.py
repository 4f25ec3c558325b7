"""Stage 5 — edge construction: union pair sources, verify, gate.

Reference analog: the eligibility predicate inside ``remove_near``
(``/root/reference/src/data/naive.rs:31``):
``dist <= k && (dist == 0 || freq <= max_freq)`` where directional
clustering passes ``max_freq = (p * (freq_parent + 1)) as i32``
(``directional.rs:38``, p defaults to 0.5, cli.rs:25-26) — the UMI-tools
rule ``2*f_child <= f_parent + 1``, f32 truncation included (SURVEY
§2.1 D5).  The gate is reproduced here exactly, as a Column expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def candidate_pairs_with_dist(
    pair_dfs: list[DataFrame],
    fp: DataFrame,
    id_col: str = "url",
) -> DataFrame:
    """Union candidate-pair sources into one row per (src, dst) with
    source provenance and SimHash Hamming distance.

    Dedup happens ONCE here across all sources (one shuffle instead of
    one per source).  ``dist`` is always populated: the directional rule
    needs dist==0 to absorb identical fingerprints unconditionally
    (naive.rs:31); this universal join carries ONLY the 8-byte simhash
    per side.

    The output feeds two verify branches in :func:`verify_pairs`;
    materialize it between the two calls (the pipeline checkpoints it
    as stage s4) — otherwise Catalyst executes this whole subtree, and
    every candidate generator under it, once per branch.
    """
    all_pairs = pair_dfs[0]
    for p in pair_dfs[1:]:
        all_pairs = all_pairs.unionByName(p)
    best = all_pairs.groupBy("src", "dst").agg(
        F.array_sort(F.collect_set("source")).alias("sources"),
    )
    sh_a = fp.select(F.col(id_col).alias("src"), F.col("simhash").alias("_sh_a"))
    sh_b = fp.select(F.col(id_col).alias("dst"), F.col("simhash").alias("_sh_b"))
    return (
        best.join(sh_a, "src")
        .join(sh_b, "dst")
        .withColumn("dist", F.bit_count(F.col("_sh_a").bitwiseXOR(F.col("_sh_b"))))
        .drop("_sh_a", "_sh_b")
    )


def combined_candidates_with_dist(
    pair_dfs: list[DataFrame],
    fp: DataFrame,
    hamming_k: int,
    id_col: str = "url",
) -> DataFrame:
    """candidate_pairs_with_dist for RAW kind-tagged pair sources
    (candidates.combined_band_pairs + the window pass): pairs arrive
    un-verified, so the Hamming gate that simhash_band_pairs used to
    apply privately happens HERE, on the single fingerprint join this
    stage already does for dist annotation.

    Exact-equivalence rule: 'simhash' counts as evidence only when
    dist <= k — a piece-shared pair beyond the Hamming ball had its
    simhash provenance dropped in the two-generator formulation (the
    private filter removed it before the union), so it is stripped
    here too; a pair whose remaining evidence set is empty is dropped.
    Verify semantics downstream (verify_pairs) are unchanged.
    """
    all_pairs = pair_dfs[0]
    for p in pair_dfs[1:]:
        all_pairs = all_pairs.unionByName(p)
    best = all_pairs.groupBy("src", "dst").agg(
        F.array_sort(F.collect_set("source")).alias("sources"),
    )
    sh_a = fp.select(F.col(id_col).alias("src"), F.col("simhash").alias("_sh_a"))
    sh_b = fp.select(F.col(id_col).alias("dst"), F.col("simhash").alias("_sh_b"))
    with_dist = (
        best.join(sh_a, "src")
        .join(sh_b, "dst")
        .withColumn("dist", F.bit_count(F.col("_sh_a").bitwiseXOR(F.col("_sh_b"))))
        .drop("_sh_a", "_sh_b")
    )
    gated_sources = F.when(
        F.col("dist") <= hamming_k, F.col("sources")
    ).otherwise(F.array_remove("sources", "simhash"))
    return (
        with_dist.withColumn("sources", gated_sources)
        .filter(F.size("sources") > 0)
    )


def verify_pairs(
    with_dist: DataFrame,
    fp: DataFrame,
    jaccard_threshold: float,
    id_col: str = "url",
) -> DataFrame:
    """Verify unioned candidate pairs.

    SimHash pairs arrive already Hamming-verified; window pairs are
    accepted outright (they share >= min_shared verbatim 64-token
    windows — stronger evidence than a global-Jaccard estimate, which
    is exactly the signal LSH misses on long-overlap-in-long-doc
    pairs); LSH-only pairs are checked by MinHash signature similarity.

    ``fp`` needs (id_col, mh_sig: array<long>).  The signature join
    happens on candidate PAIRS (a small fraction of the corpus), never
    all-pairs; ``sig_sim`` is a zip_with/filter Column expression,
    JVM-side.
    """
    accepted_outright = F.array_contains("sources", "simhash") | F.array_contains(
        "sources", "window"
    )
    passthrough = with_dist.filter(accepted_outright).withColumn(
        "sig_sim", F.lit(None).cast("double")
    )
    # the ~1 KB/row MinHash-signature join runs ONLY for pairs whose sole
    # evidence is an LSH bucket hit (a small minority in duplicate-heavy
    # corpora — simhash/window pairs skip it); at 10^12 docs this keeps
    # the fat payload out of the big pair shuffle
    sig_a = fp.select(F.col(id_col).alias("src"), F.col("mh_sig").alias("_sig_a"))
    sig_b = fp.select(F.col(id_col).alias("dst"), F.col("mh_sig").alias("_sig_b"))
    n_eq = F.size(F.filter(F.zip_with("_sig_a", "_sig_b", lambda x, y: x == y), lambda b: b))
    verified_lsh = (
        with_dist.filter(~accepted_outright)
        .join(sig_a, "src")
        .join(sig_b, "dst")
        .withColumn("sig_sim", n_eq / F.size("_sig_a"))
        .filter(F.col("sig_sim") >= F.lit(jaccard_threshold))
        .drop("_sig_a", "_sig_b")
    )
    return passthrough.unionByName(verified_lsh).select(
        "src", "dst", "dist", "sources", "sig_sim"
    )


def union_pairs(
    pair_dfs: list[DataFrame],
    fp: DataFrame,
    jaccard_threshold: float,
    id_col: str = "url",
) -> DataFrame:
    """One-shot convenience: candidate union + verify, no mid
    materialization (small inputs / tests; the pipeline checkpoints the
    candidate stage between the two halves instead)."""
    return verify_pairs(
        candidate_pairs_with_dist(pair_dfs, fp, id_col), fp, jaccard_threshold, id_col
    )


def directional_edges(pairs: DataFrame, fp: DataFrame, p: float = 0.5, id_col: str = "url") -> DataFrame:
    """Directed parent->child edges under the reference's exact gate.

    For an undirected verified pair (a, b) with exact-dup frequencies
    (f_a, f_b), emit a->b iff ``dist == 0 OR f_b <= trunc(p * (f_a + 1))``
    — byte-for-byte the reference's predicate (naive.rs:31:
    ``dist <= k && (dist == 0 || freq <= max_freq)`` with
    ``max_freq = (p * (f+1)) as i32``, directional.rs:38; the threshold
    is recomputed from *each visited node's own frequency*, which makes
    the gate edge-local and therefore expressible as a static edge
    filter; see SURVEY §2.1 D1/D5).  With p=0.5 the gate is
    ``2*f_b <= f_a + 1``.

    Returns (src, dst) directed edges.
    """
    fa = fp.select(F.col(id_col).alias("src"), F.col("freq").alias("_f_src"))
    fb = fp.select(F.col(id_col).alias("dst"), F.col("freq").alias("_f_dst"))
    pf = pairs.join(fa, "src").join(fb, "dst")
    # f32 truncation as in the reference: (p * (f+1)) as f32 as i32
    thr_src = F.floor(F.lit(p) * (F.col("_f_src") + 1)).cast("long")
    thr_dst = F.floor(F.lit(p) * (F.col("_f_dst") + 1)).cast("long")
    zero = F.col("dist") == 0
    fwd = pf.filter(zero | (F.col("_f_dst") <= thr_src)).select("src", "dst")
    bwd = pf.filter(zero | (F.col("_f_src") <= thr_dst)).select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    return fwd.unionByName(bwd)
