"""Multimodal binary-column plumbing: schema, mapInPandas batching,
1→N frame fan-out, strict-mode codec marker."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_platform_spark.functions import multimodal as M


@pytest.fixture()
def media(spark):
    blobs = [
        (1, "image", b"\x89PNG fake header" + bytes(range(200)), "a.png"),
        (2, "audio", b"RIFF fake wave" + bytes(100), "b.wav"),
        (3, "video", bytes(5000), "c.mp4"),
        (4, "image", b"", "empty.png"),
    ]
    return M.media_from_blobs(spark, blobs)


def test_media_schema(media):
    assert media.schema == M.MEDIA_SCHEMA
    assert media.count() == 4


def test_extract_features_deterministic(spark, media):
    f1 = {r["media_id"]: r["features"] for r in M.extract_features(media).collect()}
    f2 = {r["media_id"]: r["features"] for r in M.extract_features(media).collect()}
    assert f1 == f2
    assert all(len(v) == M.FEATURE_DIM for v in f1.values())
    # L1-normalized except the empty blob
    assert abs(sum(f1[1]) - 1.0) < 1e-9
    assert sum(f1[4]) == 0.0


def test_extract_features_strict_raises(spark, media):
    with pytest.raises(Exception) as ei:
        M.extract_features(media, strict=True).collect()
    assert "NotImplementedError" in str(ei.value) or "real codec" in str(ei.value)


def test_frame_sample_fanout(spark, media):
    frames = M.frame_sample_stub(media.filter(F.col("kind") == "video"))
    rows = frames.collect()
    assert len(rows) == 1
    assert rows[0]["frame_no"] == 0
    assert len(rows[0]["frame"]) == 1024


def test_read_binary_dir(spark, tmp_path):
    """binaryFile source → media relation with hashed ids + typed meta."""
    d = tmp_path / "imgs"
    d.mkdir()
    (d / "a.png").write_bytes(b"\x89PNG" + bytes(64))
    (d / "b.png").write_bytes(b"\x89PNG" + bytes(128))
    media = M.read_binary_dir(spark, str(d), kind="image")
    rows = {r["meta"]["source"].rsplit("/", 1)[-1]: r for r in media.collect()}
    assert set(rows) == {"a.png", "b.png"}
    assert rows["a.png"]["meta"]["n_bytes"] == 68
    assert rows["b.png"]["kind"] == "image"
    assert len({r["media_id"] for r in rows.values()}) == 2
    # schema contract matches the synthetic-blob constructor
    assert [f.name for f in media.schema.fields] == [
        f.name for f in M.MEDIA_SCHEMA.fields
    ]
