"""Multimodal binary-column plumbing (task brief: image/audio/video as
opaque binary + typed metadata; decode stubbed, Spark-side plumbing
real — schema, Arrow batch iteration, partition-parallel mapInPandas)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from umi_collapse_rs_spark.functions.multimodal import (
    IMAGE_META_SCHEMA,
    decode_image,
    extract_image_meta,
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


def test_plan_is_map_only(blobs_df):
    """The multimodal pass must not shuffle: one mapInPandas over the
    source partitioning (plan cut below the fixture's own repartition
    so only the operator's contribution is inspected)."""
    src = blobs_df.localCheckpoint(eager=True)
    out = extract_image_meta(src, "id", "blob", fake=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert out.rdd.getNumPartitions() == src.rdd.getNumPartitions()
