"""Stage 4 — candidate-pair generation (the "join" of this engine).

Reference analog: the neighbor search ``remove_near`` over all live UMIs
in a group (``/root/reference/src/data/naive.rs:26-40``, O(n^2) scan;
the BK-tree/n-gram indexes are advertised-unimplemented, cli.rs:41-44;
``combo.rs`` Hamming-ball enumeration is known-buggy, combo.rs:15).

Here neighbor search is banded equi-self-joins — the idiomatic Spark
formulation (banding IS the n-gram index generalization):

- SimHash path: split the 64-bit fingerprint into ``k+1`` pieces; any
  pair within Hamming distance k agrees exactly on >=1 piece
  (pigeonhole).  Join on (piece_idx, piece_val), verify
  ``bit_count(a XOR b) <= k`` — all JVM-side.
- MinHash-LSH path: join on (band_idx, band_val), verify by MinHash
  signature similarity (done in edges.py where signatures are joined).
- Window path (stage 8): content-defined 64-token window fingerprints
  catch long verbatim overlaps that whole-document LSH misses.

Skew (north_rule calls it out explicitly): template farms create
mega-buckets whose all-pairs expansion is O(n^2).  ``pairs_from_buckets``
caps it — buckets up to ``cap`` members do the full self-join; larger
buckets switch to sorted-neighbor chaining (members sorted by fingerprint
inside the bucket, each linked to the next ``chain_width``), which keeps
connectivity for clustering at O(n * chain_width) pairs and is computed
with window ``lead()`` — one shuffle, no join, no collect_list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pairs_from_buckets(
    bucketed: DataFrame,
    bucket_cols: list[str],
    id_col: str,
    order_col: str,
    cap: int,
    chain_width: int,
    dedup: bool = False,
) -> DataFrame:
    """Generate candidate (src, dst) pairs within buckets, skew-capped.

    ``bucketed`` must have ``bucket_cols + [id_col, order_col]``.
    Returns (src, dst) with src < dst; with ``dedup=False`` (default) a
    pair may appear once per shared bucket — callers that union several
    pair sources dedup ONCE at the union (one shuffle instead of one per
    source).

    Shuffle budget: exactly ONE exchange on bucket_cols.  Bucket sizes
    come from a window count (not groupBy+join); small-bucket all-pairs
    expansion is a same-key groupBy (no re-shuffle after the window) +
    JVM array-combinatorics explode; capped buckets chain via lead()
    over the same window partitioning.
    """
    w = Window.partitionBy(*bucket_cols)
    sized = bucketed.withColumn("_bsz", F.count(F.lit(1)).over(w)).filter(F.col("_bsz") > 1)

    # small buckets (<= cap): all pairs via collect_list + array combinatorics
    small = (
        sized.filter(F.col("_bsz") <= cap)
        .groupBy(*bucket_cols)
        .agg(F.array_sort(F.collect_list(F.col(id_col))).alias("_ids"))
    )
    ids = F.col("_ids")
    pair_arrays = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.size(ids)), lambda y: F.struct(x.alias("src"), y.alias("dst"))
            ),
        )
    )
    small_pairs = small.select(F.explode(pair_arrays).alias("p")).select("p.src", "p.dst")

    # hot buckets (> cap): sorted-neighbor chaining, O(n * chain_width)
    wo = Window.partitionBy(*bucket_cols).orderBy(order_col, id_col)
    chained = sized.filter(F.col("_bsz") > cap).select(
        F.col(id_col).alias("src"),
        *[F.lead(id_col, j).over(wo).alias(f"_n{j}") for j in range(1, chain_width + 1)],
    )
    big_pairs = (
        chained.select(
            "src",
            F.explode(F.array(*[f"_n{j}" for j in range(1, chain_width + 1)])).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
    )
    out = small_pairs.unionByName(big_pairs)
    return out.dropDuplicates(["src", "dst"]) if dedup else out


def simhash_band_pairs(
    fp: DataFrame,
    hamming_k: int,
    bands: int,
    cap: int,
    chain_width: int,
    id_col: str = "url",
) -> DataFrame:
    """SimHash Hamming-ball candidate pairs, verified.

    ``fp`` needs (id_col, simhash).  Returns (src, dst, dist, source).
    The piece split is the pigeonhole banding trick for Hamming<=k over
    64 bits (SURVEY §2 J2); verification is JVM-side bit_count.
    """
    width = 64 // bands
    mask = (1 << width) - 1
    pieces = F.array(
        *[
            F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(F.lit(mask))
            for i in range(bands)
        ]
    )
    exploded = fp.select(
        F.col(id_col), F.col("simhash"), F.posexplode(pieces).alias("piece_idx", "piece_val")
    )
    pairs = pairs_from_buckets(
        exploded, ["piece_idx", "piece_val"], id_col, "simhash", cap, chain_width
    )
    a = fp.select(F.col(id_col).alias("src"), F.col("simhash").alias("_sh_a"))
    b = fp.select(F.col(id_col).alias("dst"), F.col("simhash").alias("_sh_b"))
    return (
        pairs.join(a, "src")
        .join(b, "dst")
        .withColumn("dist", F.bit_count(F.col("_sh_a").bitwiseXOR(F.col("_sh_b"))))
        .filter(F.col("dist") <= hamming_k)
        # dedup AFTER the Hamming filter: few survivors, tiny shuffle
        .dropDuplicates(["src", "dst"])
        .select("src", "dst", "dist", F.lit("simhash").alias("source"))
    )


def minhash_lsh_pairs(
    fp: DataFrame,
    cap: int,
    chain_width: int,
    id_col: str = "url",
) -> DataFrame:
    """MinHash-LSH candidate pairs (unverified — signature check happens
    in edges.union_pairs where signatures are joined once per pair).

    ``fp`` needs (id_col, mh_bands: array<long>, simhash) — simhash is
    reused as the intra-bucket chaining order so that near-identical
    documents end up adjacent inside capped mega-buckets.
    """
    exploded = fp.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode("mh_bands").alias("band_idx", "band_val"),
    )
    pairs = pairs_from_buckets(
        exploded, ["band_idx", "band_val"], id_col, "simhash", cap, chain_width
    )
    return pairs.select("src", "dst", F.lit(None).cast("int").alias("dist"), F.lit("minhash").alias("source"))


def window_overlap_pairs(
    docs: DataFrame,
    min_shared_windows: int,
    cap: int,
    chain_width: int,
    id_col: str = "url",
    win_col: str = "win_hashes",
) -> DataFrame:
    """Stage 8 — long-verbatim-overlap pairs via content-defined window
    fingerprints (the suffix-array substring pass of the north star,
    re-expressed scalably; no reference analog).

    ``docs`` carries ``win_col: array<long>`` — content-defined window
    hashes computed in the fingerprint UDF (fingerprint_core.
    batch_window_hashes): window start positions are token positions
    whose hash = 0 mod stride, so a shared >=512-token verbatim block
    yields identical window hashes in both documents regardless of its
    offset in each (a fixed stride grid would miss misaligned copies).

    A pair is emitted when the documents share >= min_shared_windows
    windows (each shared window is 64 verbatim tokens of evidence).
    """
    exploded = docs.select(F.col(id_col), F.explode(win_col).alias("win_hash"))
    w = Window.partitionBy("win_hash")
    sized = exploded.withColumn("_bsz", F.count(F.lit(1)).over(w)).filter(F.col("_bsz") > 1)
    # normal buckets: count shared windows per pair, keep evidence-rich pairs
    members = (
        sized.filter(F.col("_bsz") <= cap)
        .groupBy("win_hash")
        .agg(F.array_sort(F.collect_list(F.col(id_col))).alias("_ids"))
    )
    ids = F.col("_ids")
    pair_arrays = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.size(ids)), lambda y: F.struct(x.alias("src"), y.alias("dst"))
            ),
        )
    )
    shared = (
        members.select(F.explode(pair_arrays).alias("p"))
        .groupBy("p.src", "p.dst")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared_windows)
    )
    # oversized window buckets (> cap): boilerplate — chain instead
    hot_pairs = pairs_from_buckets(
        sized.filter(F.col("_bsz") > cap), ["win_hash"], id_col, id_col, cap, chain_width
    )
    return (
        shared.select("src", "dst")
        .unionByName(hot_pairs)
        .select("src", "dst", F.lit(None).cast("int").alias("dist"), F.lit("window").alias("source"))
    )
