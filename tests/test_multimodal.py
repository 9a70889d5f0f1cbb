"""Multimodal plumbing: binary columns + typed metadata, Arrow-batched
decode/feature/resize stubs, frame-sample planning.  The codec step is
stubbed (no image/audio libs in this environment) — these tests pin down
the schema, batch shape, null handling, and partition behavior that real
codecs plug into."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from creek_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    MEDIA_SCHEMA,
    RESIZED_SCHEMA,
    attach_binary_metadata,
    extract_features,
    frame_sample_plan,
    resize_images,
)


@pytest.fixture()
def media(spark):
    rows = [
        (1, "image", b"\x89PNG" + bytes(range(200)), "image/png", None, {}),
        (2, "image", b"\xff\xd8tiny", "image/jpeg", None, {}),
        (3, "audio", b"RIFF" + bytes(100), "audio/wav", None, {}),
        (4, "video", b"\x00\x00ftyp" + bytes(50), "video/mp4", None,
         {"duration_s": "12"}),
        (5, "image", None, "image/png", None, {}),  # null payload
    ]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    return df.withColumn("n_bytes", F.length("content").cast("long"))


def test_attach_binary_metadata_stays_jvm(spark, media):
    out = attach_binary_metadata(media)
    rows = {r["media_id"]: r for r in out.collect()}
    assert rows[1]["n_bytes"] == 204
    assert rows[5]["n_bytes"] is None
    assert len(rows[2]["content_md5"]) == 32
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # metadata derivation never decodes


def test_extract_features_fake_decode(spark, media):
    out = extract_features(media, fake_decode=True)
    assert out.schema == FEATURE_SCHEMA
    rows = {r["media_id"]: r for r in out.collect()}
    assert rows[1]["feat_dim"] == 4
    assert rows[1]["features"][0] == 204.0  # n_bytes as first fake feature
    assert rows[5]["feat_dim"] == 0  # null payload → empty features
    assert rows[5]["n_bytes"] is None


def test_extract_features_strict_raises(spark, media):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    with pytest.raises((PythonException, Py4JJavaError)):
        extract_features(media, fake_decode=False).collect()


def test_resize_images_fake(spark, media):
    out = resize_images(media, width=8, height=8, fake_resize=True)
    assert out.schema == RESIZED_SCHEMA
    rows = {r["media_id"]: r for r in out.collect()}
    # only images survive; payload capped at width*height
    assert set(rows) == {1, 2, 5}
    assert len(rows[1]["content"]) == 64
    assert rows[2]["content"] == b"\xff\xd8tiny"  # shorter than cap: unchanged
    assert rows[5]["content"] is None
    assert (rows[1]["width"], rows[1]["height"]) == (8, 8)


def test_resize_images_injected_codec(spark, media):
    out = resize_images(
        media, width=4, height=4,
        batch_resizer=lambda content, w, h: content[:1] * (w * h),
    )
    rows = {r["media_id"]: r for r in out.collect()}
    assert rows[1]["content"] == b"\x89" * 16


def test_frame_sample_plan(spark, media):
    out = frame_sample_plan(media, every_n_seconds=5)
    rows = out.collect()
    # only the video (duration 12s) → frames at 0,5,10
    assert [(r["media_id"], r["frame_ts"]) for r in rows] == [
        (4, 0), (4, 5), (4, 10)
    ]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # planning never touches payload bytes
