"""Multimodal binary-column plumbing (task brief: image/audio/video as
opaque binary + typed metadata; decode stubbed, Spark-side plumbing
real — schema, Arrow batch iteration, partition-parallel mapInPandas)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from umi_collapse_rs_spark.functions.multimodal import (
    FRAME_SCHEMA,
    IMAGE_META_SCHEMA,
    RESIZED_SCHEMA,
    decode_image,
    extract_image_meta,
    resize_image,
    resize_images,
    sample_frames,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def blobs_df(spark):
    rows = [(i, f"image-payload-{i}".encode() * (i + 1)) for i in range(50)]
    return spark.createDataFrame(rows, "id long, blob binary").repartition(4)


def test_real_decode_gated_on_pil():
    """PIL present -> real decode works on a generated image; absent ->
    an explicit NotImplementedError naming the fake fallback.  Both
    sides of the extras gate are covered by this one test."""
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="fake=True"):
            decode_image(b"\x89PNG...", fake=False)
        return
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (20, 12), (255, 0, 0)).save(buf, format="PNG")
    w, h, feat = decode_image(buf.getvalue(), fake=False)
    assert (w, h) == (20, 12)
    assert len(feat) == 3 and feat[0] == pytest.approx(1.0)


def test_fake_decode_deterministic():
    a = decode_image(b"payload", fake=True)
    b = decode_image(b"payload", fake=True)
    assert a == b
    w, h, feat = a
    assert 16 <= w < 256 and 16 <= h < 256
    assert len(feat) == 8 and all(0.0 <= v <= 1.0 for v in feat)


def test_extract_image_meta_schema_and_values(blobs_df):
    out = extract_image_meta(blobs_df, "id", "blob", fake=True)
    assert out.schema == IMAGE_META_SCHEMA
    pdf = out.toPandas().sort_values("id").reset_index(drop=True)
    assert len(pdf) == 50
    # metadata matches a driver-side recomputation per blob
    src = {r["id"]: bytes(r["blob"]) for r in blobs_df.collect()}
    for _, row in pdf.iterrows():
        raw = src[row.id]
        assert row.n_bytes == len(raw)
        assert row.content_sha == hashlib.sha256(raw).hexdigest()
        w, h, feat = decode_image(raw, fake=True)
        assert (row.width, row.height) == (w, h)
        assert list(row.feat) == pytest.approx(feat)


def test_real_resize_gated_on_pil():
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="fake=True"):
            resize_image(b"\x89PNG...", 8, 8, fake=False)
        return
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (20, 12), (0, 255, 0)).save(buf, format="PNG")
    sha, n = resize_image(buf.getvalue(), 8, 8, fake=False)
    assert len(sha) == 64 and n > 0


def test_resize_images_values(blobs_df):
    out = resize_images(blobs_df, "id", "blob", target_w=32, target_h=16, fake=True)
    assert out.schema == RESIZED_SCHEMA
    pdf = out.toPandas().sort_values("id").reset_index(drop=True)
    assert len(pdf) == 50
    src = {r["id"]: bytes(r["blob"]) for r in blobs_df.collect()}
    for _, row in pdf.iterrows():
        sha, n = resize_image(src[row.id], 32, 16, fake=True)
        assert (row.width, row.height) == (32, 16)
        assert row.resized_sha == sha
        assert row.n_bytes_out == n == 32 * 16 * 3


def test_sample_frames_cardinality_and_values(blobs_df):
    """The frame op multiplies rows INSIDE the Arrow batch (1..8 per
    blob) — cardinality, per-frame hashes, and contiguous frame_idx all
    match a driver-side recomputation."""
    out = sample_frames(blobs_df, "id", "blob", max_frames=8, fake=True)
    assert out.schema == FRAME_SCHEMA
    pdf = out.toPandas()
    src = {r["id"]: bytes(r["blob"]) for r in blobs_df.collect()}
    expect = {rid: sample_video_frames(raw, 8, fake=True) for rid, raw in src.items()}
    assert len(pdf) == sum(len(v) for v in expect.values())
    for rid, grp in pdf.groupby("id"):
        grp = grp.sort_values("frame_idx")
        assert list(grp.frame_idx) == list(range(len(expect[rid])))
        assert list(grp.frame_sha) == expect[rid]


def _pyav():
    try:
        import av

        return av
    except ImportError:
        return None


def test_real_frame_sampling_gated_on_pyav():
    """PyAV absent -> the real path raises the documented
    NotImplementedError naming the fake fallback.  PyAV present -> it
    actually decodes: an encoded 25-frame video yields <= max_frames
    deterministic keyframe hashes (skipped-if-unavailable is the
    ABSENT branch, not a fake — per r2 verdict item #5 the real branch
    may no longer raise after a successful import)."""
    av = _pyav()
    if av is None:
        with pytest.raises(NotImplementedError, match="fake=True"):
            sample_video_frames(b"not-a-video", 8, fake=False)
        return
    import io

    import numpy as np

    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as container:
        stream = container.add_stream("mpeg4", rate=5)
        stream.width, stream.height = 64, 48
        stream.pix_fmt = "yuv420p"
        for i in range(25):
            arr = np.full((48, 64, 3), i * 10 % 256, dtype=np.uint8)
            frame = av.VideoFrame.from_ndarray(arr, format="rgb24")
            for packet in stream.encode(frame):
                container.mux(packet)
        for packet in stream.encode():
            container.mux(packet)
    data = buf.getvalue()
    first = sample_video_frames(data, 4, fake=False)
    again = sample_video_frames(data, 4, fake=False)
    assert first == again  # deterministic
    assert 1 <= len(first) <= 4
    assert all(len(s) == 64 for s in first)


def test_plan_is_map_only(blobs_df):
    """The multimodal pass must not shuffle: one mapInPandas over the
    source partitioning (plan cut below the fixture's own repartition
    so only the operator's contribution is inspected)."""
    src = blobs_df.localCheckpoint(eager=True)
    out = extract_image_meta(src, "id", "blob", fake=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert out.rdd.getNumPartitions() == src.rdd.getNumPartitions()
