"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed through mapInPandas.

The byte-level metadata (length, content hash) is computed JVM-side as
Column expressions — only the decode itself runs in Python.  Real
decoding attempts a PIL import at call time (the extras path); without
PIL (this container) callers use the deterministic fake decoder, which
exercises the full distributed plumbing — schema, Arrow batch
iteration, partition-parallel mapInPandas — end to end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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

    ``fake=True`` derives a deterministic pseudo-decode from the
    content hash (no image library needed).  Otherwise PIL is imported
    at call time: present -> real decode (RGB mean-color 3-dim feature
    from an 8x8 thumbnail); absent -> NotImplementedError naming the
    fallback.
    """
    if fake:
        h = hashlib.sha256(data).digest()
        width = 16 + h[0] % 240
        height = 16 + h[1] % 240
        feat = [b / 255.0 for b in h[:8]]
        return width, height, feat
    try:
        from PIL import Image
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires PIL (pip extra); run with fake=True in-sandbox"
        ) from e
    import io

    import numpy as np

    img = Image.open(io.BytesIO(data)).convert("RGB")
    width, height = img.size
    thumb = np.asarray(img.resize((8, 8)), dtype=np.float32)
    feat = (thumb.mean(axis=(0, 1)) / 255.0).tolist()
    return width, height, feat


def extract_image_meta(df: DataFrame, id_col: str, blob_col: str, fake: bool = True) -> DataFrame:
    """Binary blobs -> typed metadata + decoded features, map-only.

    ``n_bytes``/``content_sha`` are Column expressions (JVM, codegen);
    the mapInPandas stage only runs the decode and passes the metadata
    columns through — Arrow batches stream per partition, no shuffle,
    no driver collection.
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(blob_col).alias("blob"),
        F.coalesce(F.length(blob_col), F.lit(0)).cast("int").alias("n_bytes"),
        F.sha2(F.coalesce(F.col(blob_col), F.lit(b"")), 256).alias("content_sha"),
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, feats = [], [], []
            for blob in pdf["blob"]:
                raw = bytes(blob) if blob is not None else b""
                w, h, feat = decode_image(raw, fake=fake)
                widths.append(w)
                heights.append(h)
                feats.append(feat)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": pdf["n_bytes"],
                    "content_sha": pdf["content_sha"],
                    "width": widths,
                    "height": heights,
                    "feat": feats,
                }
            )

    return base.mapInPandas(op, schema=IMAGE_META_SCHEMA)
