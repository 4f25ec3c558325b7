"""Embedding similarity operators: brute-force cosine and the
LSH-bucketed scale path (training-data pipeline ops; no reference
analog — the reference's neighbor search is Hamming over UMIs, J1/J2).

All math is Column expressions (zip_with/transform/aggregate) — no
Python in the row path.  The hyperplane signs are computed JVM-side
from a broadcast list of plane vectors (tiny: n_planes x dim doubles).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cosine_sim_col(a, b):
    """Cosine similarity of two array<float> columns, in double."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    def nrm(c):
        return F.sqrt(
            F.aggregate(
                F.transform(c, lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )
    return dot / (nrm(a) * nrm(b))


def hyperplane_signature_col(emb, planes: np.ndarray):
    """Random-hyperplane LSH signature (SimHash over the unit sphere):
    bit i = sign(<emb, plane_i>).  Returns an int (bucket id) column.

    ``planes``: (n_planes, dim) float64 — embedded as literals (tiny)."""
    bits = []
    for i, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                emb,
                F.array(*[F.lit(float(v)) for v in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def hyperplane_lsh_topk(
    df: DataFrame,
    id_col: str,
    emb_col: str,
    n_planes: int = 8,
    k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k cosine neighbors via hyperplane-LSH buckets.

    Scale path: the bucket equi-self-join replaces the O(n^2) cross
    join; candidates only form within a bucket (expected n/2^planes per
    bucket), then exact cosine ranks them.  At 100 TB this is the same
    banded-join pattern as the text LSH — shuffle on bucket, AQE skew
    split as backstop.
    """
    rng = np.random.default_rng(seed)
    dim = len(df.select(emb_col).first()[0])
    planes = rng.standard_normal((n_planes, dim))
    sig = df.select(
        F.col(id_col), F.col(emb_col), hyperplane_signature_col(F.col(emb_col), planes).alias("bucket")
    )
    a = sig.select(F.col(id_col).alias("qid"), F.col(emb_col).alias("qe"), "bucket")
    b = sig.select(F.col(id_col).alias("nid"), F.col(emb_col).alias("ne"), "bucket")
    cand = a.join(b, "bucket").filter(F.col("qid") != F.col("nid"))
    scored = cand.withColumn("sim", cosine_sim_col(F.col("qe"), F.col("ne")))
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", F.col("nid").alias("neighbor_id"), F.round("sim", 4).alias("cos_sim"), "rnk")
    )
