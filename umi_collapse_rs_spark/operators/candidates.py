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
) -> DataFrame:
    """Generate candidate (src, dst) pairs within buckets, skew-capped.

    ``bucketed`` must have ``bucket_cols + [id_col, order_col]``.
    Returns distinct (src, dst) with src < dst.
    """
    # No broadcast hint: the bucket-size side can be arbitrarily large at
    # 100 TB; AQE converts to broadcast when it is actually small.
    sizes = bucketed.groupBy(*bucket_cols).agg(F.count(F.lit(1)).alias("_bsz"))
    with_sz = bucketed.join(sizes.filter(F.col("_bsz") > 1), bucket_cols)

    small = with_sz.filter(F.col("_bsz") <= cap).drop("_bsz")
    a = small.select(*bucket_cols, F.col(id_col).alias("src"))
    b = small.select(*bucket_cols, F.col(id_col).alias("dst"))
    small_pairs = a.join(b, bucket_cols).filter(F.col("src") < F.col("dst")).select("src", "dst")

    big = with_sz.filter(F.col("_bsz") > cap).drop("_bsz")
    w = Window.partitionBy(*bucket_cols).orderBy(order_col, id_col)
    chained = big.select(
        F.col(id_col).alias("src"),
        *[F.lead(id_col, j).over(w).alias(f"_n{j}") for j in range(1, chain_width + 1)],
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
    return small_pairs.unionByName(big_pairs).dropDuplicates(["src", "dst"])


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
    window_tokens: int,
    window_stride: int,
    min_shared_windows: int,
    cap: int,
    chain_width: int,
    id_col: str = "url",
    text_col: str = "text_norm",
) -> DataFrame:
    """Stage 8 — long-verbatim-overlap pairs via content-defined window
    fingerprints (the suffix-array substring pass of the north star,
    re-expressed scalably; no reference analog).

    Window start positions are *content-defined* (token positions whose
    hash = 0 mod stride), so a shared >=512-token block yields identical
    windows in both documents regardless of its offset in each — the
    alignment-robustness a grid of fixed strides would lack.  Everything
    is built-in array lambdas + xxhash64: zero Python.
    """
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    anchors = F.filter(
        F.sequence(F.lit(0), n - window_tokens),
        lambda i: F.pmod(F.xxhash64(F.get(toks, i)), F.lit(window_stride)) == 0,
    )
    win_hashes = F.transform(
        anchors,
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, window_tokens))),
    )
    exploded = (
        docs.filter(n >= window_tokens)
        .select(F.col(id_col), win_hashes.alias("_wh"))
        .select(F.col(id_col), F.explode("_wh").alias("win_hash"))
        .dropDuplicates([id_col, "win_hash"])
    )
    # count shared windows per pair; cap hot window hashes (boilerplate)
    sizes = exploded.groupBy("win_hash").agg(F.count(F.lit(1)).alias("_bsz"))
    pruned = exploded.join(
        sizes.filter((F.col("_bsz") > 1) & (F.col("_bsz") <= cap)), "win_hash"
    )
    a = pruned.select("win_hash", F.col(id_col).alias("src"))
    b = pruned.select("win_hash", F.col(id_col).alias("dst"))
    shared = (
        a.join(b, "win_hash")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared_windows)
    )
    # oversized window buckets (> cap): pure boilerplate — chain instead
    hot = exploded.join(sizes.filter(F.col("_bsz") > cap), "win_hash").drop("_bsz")
    hot_pairs = pairs_from_buckets(hot, ["win_hash"], id_col, id_col, cap, chain_width)
    return (
        shared.select("src", "dst")
        .unionByName(hot_pairs)
        .dropDuplicates(["src", "dst"])
        .select("src", "dst", F.lit(None).cast("int").alias("dist"), F.lit("window").alias("source"))
    )
