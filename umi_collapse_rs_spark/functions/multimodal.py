"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed through mapInPandas.

The decode/feature-extract steps are STUBBED (image/audio libraries are
not in this container): ``decode_image_batch`` raises unless the
deterministic fake decoder is requested.  The Spark-side plumbing —
schema, batch iteration, partition-parallel mapInPandas, metadata
extraction — is real and tested (tests/test_multimodal.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feat", T.ArrayType(T.FloatType())),
    ]
)


def decode_image(data: bytes, fake: bool = False) -> tuple[int, int, list[float]]:
    """Decode one image blob -> (width, height, feature vector).

    Real decoding needs PIL/opencv (not installed here); ``fake=True``
    derives a deterministic pseudo-decode from the content hash so the
    distributed plumbing can be exercised end to end.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires PIL/opencv; run with fake=True in-sandbox"
        )
    h = hashlib.sha256(data).digest()
    width = 16 + h[0] % 240
    height = 16 + h[1] % 240
    feat = [b / 255.0 for b in h[:8]]
    return width, height, feat


def extract_image_meta(df: DataFrame, id_col: str, blob_col: str, fake: bool = True) -> DataFrame:
    """mapInPandas over binary blobs -> typed metadata + features.

    Arrow batches stream through per partition; no shuffle, no driver
    collection — the pattern scales to arbitrary corpus size.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"id": [], "n_bytes": [], "content_sha": [], "width": [], "height": [], "feat": []}
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                raw = bytes(blob) if blob is not None else b""
                w, h, feat = decode_image(raw, fake=fake)
                out["id"].append(i)
                out["n_bytes"].append(len(raw))
                out["content_sha"].append(hashlib.sha256(raw).hexdigest())
                out["width"].append(w)
                out["height"].append(h)
                out["feat"].append(feat)
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col).mapInPandas(op, schema=IMAGE_META_SCHEMA)
