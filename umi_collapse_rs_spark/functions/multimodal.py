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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized_sha", T.StringType()),
        T.StructField("n_bytes_out", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_sha", T.StringType()),
    ]
)


def resize_image(data: bytes, tw: int, th: int, fake: bool = False) -> tuple[str, int]:
    """Resize one image blob -> (sha256 of the resized encoding,
    output byte count).

    ``fake=True`` derives both deterministically from the content hash
    (``sha256(hex(sha256(blob)) + ':WxH')``) — hex-string arithmetic a
    SQL oracle can replay.  Otherwise PIL is imported at call time:
    present -> real resize + PNG re-encode; absent ->
    NotImplementedError naming the fallback."""
    if fake:
        key = hashlib.sha256(data).hexdigest() + f":{tw}x{th}"
        return hashlib.sha256(key.encode()).hexdigest(), tw * th * 3
    try:
        from PIL import Image
    except ImportError as e:
        raise NotImplementedError(
            "image resize requires PIL (pip extra); run with fake=True in-sandbox"
        ) from e
    import io

    img = Image.open(io.BytesIO(data)).convert("RGB").resize((tw, th))
    buf = io.BytesIO()
    img.save(buf, "PNG")
    out = buf.getvalue()
    return hashlib.sha256(out).hexdigest(), len(out)


def sample_video_frames(data: bytes, max_frames: int, fake: bool = False) -> list[str]:
    """Sample frames from one video blob -> list of per-frame content
    hashes (frame i = ``sha256(hex(sha256(blob)) + '#i')``; the fake
    frame COUNT is ``1 + byte2(sha256(blob)) % max_frames`` so
    cardinality varies per row).  The real path decodes with PyAV —
    gated at call time exactly like the PIL paths (skip-tested when the
    library exists, tests/test_multimodal.py)."""
    if fake:
        hexd = hashlib.sha256(data).hexdigest()
        n = 1 + hashlib.sha256(data).digest()[2] % max_frames
        return [hashlib.sha256(f"{hexd}#{i}".encode()).hexdigest() for i in range(n)]
    try:
        import av
    except ImportError as e:
        raise NotImplementedError(
            "frame sampling requires PyAV (pip extra); run with fake=True in-sandbox"
        ) from e
    import io

    # Two passes, both O(1) frames in memory (ADVICE r3: the old form
    # retained every decoded keyframe before sampling — unbounded in
    # video length).  Pass 1 counts by running the SAME decode loop
    # pass 2 enumerates (skip_frame=NONKEY, no pixel conversion) — a
    # packet-level is_keyframe demux count can disagree with decoder
    # output (empty flush packets, codecs whose packet flag doesn't
    # match emitted frames; ADVICE r4), which would let picks index
    # past the last decoded frame.  Pass 2 decodes keyframes one at a
    # time, hashing and dropping each picked frame immediately and
    # stopping after the last pick.
    with av.open(io.BytesIO(data)) as container:
        stream = container.streams.video[0]
        stream.codec_context.skip_frame = "NONKEY"
        n = sum(1 for _ in container.decode(stream))
    if n == 0:
        return []
    # evenly-spaced <= max_frames of the keyframes, deterministic
    # (same pick indices as the old materialize-then-sample form)
    take = min(max_frames, n)
    picks = {(i * n) // take for i in range(take)}
    last = max(picks)
    out: list[str] = []
    with av.open(io.BytesIO(data)) as container:
        stream = container.streams.video[0]
        stream.codec_context.skip_frame = "NONKEY"
        for ki, frame in enumerate(container.decode(stream)):
            if ki in picks:
                arr = frame.to_ndarray(format="rgb24")
                out.append(hashlib.sha256(arr.tobytes()).hexdigest())
            if ki >= last:
                break
    return out


def resize_images(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    target_w: int = 64,
    target_h: int = 64,
    fake: bool = True,
) -> DataFrame:
    """Distributed image resize: map-only mapInPandas, one output row
    per input (id, target dims, resized-content hash, output bytes)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            shas, sizes = [], []
            for blob in pdf["blob"]:
                sha, n = resize_image(
                    bytes(blob) if blob is not None else b"", target_w, target_h, fake=fake
                )
                shas.append(sha)
                sizes.append(n)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "width": target_w,
                    "height": target_h,
                    "resized_sha": shas,
                    "n_bytes_out": sizes,
                }
            )

    base = df.select(F.col(id_col).alias("id"), F.col(blob_col).alias("blob"))
    return base.mapInPandas(op, schema=RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    max_frames: int = 8,
    fake: bool = True,
) -> DataFrame:
    """Distributed frame sampling: mapInPandas that CHANGES CARDINALITY
    — each video blob yields 1..max_frames rows (id, frame_idx,
    frame_sha).  Still map-only: the explode happens inside the Arrow
    batch, no shuffle."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, shas = [], [], []
            for rid, blob in zip(pdf["id"], pdf["blob"]):
                frames = sample_video_frames(
                    bytes(blob) if blob is not None else b"", max_frames, fake=fake
                )
                for i, sha in enumerate(frames):
                    ids.append(rid)
                    idxs.append(i)
                    shas.append(sha)
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame_sha": shas})

    base = df.select(F.col(id_col).alias("id"), F.col(blob_col).alias("blob"))
    return base.mapInPandas(op, schema=FRAME_SCHEMA)


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
