"""Multimodal binary-column plumbing: schema, mapInPandas batching,
REAL PPM/BMP numpy codec, resize, 1→N frame fan-out, strict-mode marker."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from data_platform_spark.functions import multimodal as M


def _checker_img(h=8, w=8):
    """Deterministic RGB test pattern."""
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :, 0] = np.arange(w, dtype=np.uint8) * 16  # R ramps by column
    img[:, :, 1] = np.arange(h, dtype=np.uint8)[:, None] * 16  # G by row
    img[::2, ::2, 2] = 255  # B checker
    return img


def _saw_sig(n=64):
    """Deterministic mono sawtooth in [-0.5, 0.5)."""
    return (np.arange(n) / n - 0.5)[:, None]


def _bmp_bytes(img: np.ndarray) -> bytes:
    """Hand-rolled uncompressed 24-bit BMP encoder (bottom-up, padded
    rows) — independent of the decoder under test."""
    h, w, _ = img.shape
    row_bytes = (w * 3 + 3) & ~3
    pad = row_bytes - w * 3
    pixel_data = b"".join(
        bytes(img[r, :, ::-1].tobytes()) + b"\x00" * pad
        for r in range(h - 1, -1, -1)
    )
    data_offset = 14 + 40
    file_size = data_offset + len(pixel_data)
    header = (
        b"BM"
        + file_size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + data_offset.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(pixel_data).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + pixel_data


def _vid_frames(t=6, h=4, w=6):
    """Deterministic video: frame i = checker pattern shifted by i."""
    base = _checker_img(h, w).astype(np.int16)
    return np.stack([(base + 7 * i) % 256 for i in range(t)]).astype(np.uint8)


@pytest.fixture()
def media(spark):
    img = _checker_img()
    blobs = [
        (1, "image", M.encode_ppm(img), "a.ppm"),
        (2, "audio", M.encode_wav(_saw_sig(), 8000, bits=16), "b.wav"),
        (3, "video", M.encode_avi(_vid_frames(), fps=3.0), "c.avi"),
        (4, "image", _bmp_bytes(img), "d.bmp"),
        (5, "blob", bytes(5000), "e.bin"),  # kind with no built-in codec
    ]
    return M.media_from_blobs(spark, blobs)


def test_media_schema(media):
    assert media.schema == M.MEDIA_SCHEMA
    assert media.count() == 5


def test_ppm_roundtrip():
    img = _checker_img(5, 7)
    assert np.array_equal(M.decode_ppm(M.encode_ppm(img)), img)


def test_ppm_header_comments_and_whitespace():
    img = _checker_img(2, 3)
    raw = b"P6\n# a comment\n 3 \t2\n255\n" + img.tobytes()
    assert np.array_equal(M.decode_ppm(raw), img)


def test_bmp_decode_matches_source_pixels():
    """BMP decode must undo bottom-up row order, BGR order and padding
    (3-wide rows force 1 pad byte)."""
    img = _checker_img(4, 3)
    assert np.array_equal(M.decode_bmp(_bmp_bytes(img)), img)


def test_resize_nearest_samples_source_pixels():
    img = _checker_img(8, 8)
    small = M.resize_nearest(img, 4, 4)
    assert small.shape == (4, 4, 3)
    assert np.array_equal(small, img[::2, ::2])


def test_extract_features_real_image_stats(spark, media):
    feats = {r["media_id"]: r for r in M.extract_features(media).collect()}
    img = _checker_img()
    # PPM and BMP encodings of the SAME image must featurize identically
    assert feats[1]["features"] == feats[4]["features"]
    f = feats[1]["features"]
    assert f[0] == 8.0 and f[1] == 8.0  # height, width
    assert abs(f[2] - img[:, :, 0].mean()) < 1e-9  # mean R
    assert abs(f[3] - img[:, :, 1].mean()) < 1e-9  # mean G
    assert abs(f[4] - img[:, :, 2].mean()) < 1e-9  # mean B
    assert abs(sum(f[8:]) - 1.0) < 1e-9  # luminance hist normalized
    # audio: REAL WAV decode — sample count, rate, rms of the sawtooth
    sig = _saw_sig()
    af = feats[2]["features"]
    assert af[0] == 64.0 and af[1] == 1.0 and af[2] == 8000.0
    assert abs(af[5] - np.sqrt((sig**2).mean())) < 1e-3  # rms (16-bit quant)
    # video: REAL AVI decode — frame count, dims, fps, motion
    vid = _vid_frames()
    vf = feats[3]["features"]
    assert vf[:4] == [6.0, 4.0, 6.0, 3.0]  # n_frames, h, w, fps
    assert abs(vf[4] - 2.0) < 1e-9  # duration: 6 frames @ 3 fps
    expected_motion = np.mean(np.abs(np.diff(vid.astype("float64"), axis=0)))
    assert abs(vf[7] - expected_motion) < 1e-9
    # codec-less kinds (blob): byte-histogram fallback, L1-normalized
    assert abs(sum(feats[5]["features"]) - 1.0) < 1e-9
    assert len(feats[5]["features"]) == M.FEATURE_DIM


def test_extract_features_strict_raises_for_codecless_kinds(spark, media):
    with pytest.raises(Exception) as ei:
        M.extract_features(media, strict=True).collect()
    assert "NotImplementedError" in str(ei.value) or "real codec" in str(ei.value)


def test_extract_features_strict_ok_for_real_codec_kinds(spark, media):
    decodable = media.filter(F.col("kind") != "blob")
    rows = M.extract_features(decodable, strict=True).collect()
    assert len(rows) == 4  # image x2, audio, video — no fallback needed


def test_resize_images_stage(spark, media):
    resized = M.resize_images(media, 4, 4)
    rows = {r["media_id"]: r for r in resized.collect()}
    img = _checker_img()
    for mid in (1, 4):
        out = M.decode_ppm(bytes(rows[mid]["content"]))
        assert np.array_equal(out, img[::2, ::2])
        assert rows[mid]["meta"]["n_bytes"] == len(bytes(rows[mid]["content"]))
    # non-image blobs pass through untouched
    assert bytes(rows[5]["content"]) == bytes(5000)


def test_avi_roundtrip():
    """encode_avi → decode_avi is the identity on frames and fps."""
    vid = _vid_frames(t=4, h=3, w=5)  # w=5 → padded rows (15 -> 16 bytes)
    frames, fps = M.decode_avi(M.encode_avi(vid, fps=2.5))
    assert np.array_equal(frames, vid)
    assert fps == 2.5


def test_avi_chunk_walk_tolerates_junk():
    """Parser must skip unknown chunks (JUNK before hdrl is common)."""
    raw = M.encode_avi(_vid_frames(t=2), fps=1.0)
    junk = b"JUNK" + (6).to_bytes(4, "little") + b"abcdef"
    spliced = raw[:12] + junk + raw[12:]
    body_len = len(spliced) - 8
    spliced = spliced[:4] + body_len.to_bytes(4, "little") + spliced[8:]
    frames, fps = M.decode_avi(spliced)
    assert frames.shape[0] == 2 and fps == 1.0


def test_avi_rejects_non_avi():
    with pytest.raises(ValueError):
        M.decode_avi(b"RIFF" + (4).to_bytes(4, "little") + b"WAVE")
    with pytest.raises(ValueError):
        M.decode_avi(bytes(64))


def test_frame_sample_real(spark, media):
    """Time-based sampling: 6 frames @ 3 fps, every 1s → frames 0 and 3;
    sampled frames are valid PPM images matching the source frames."""
    vids = media.filter(F.col("kind") == "video")
    rows = sorted(
        M.sample_frames(vids, every_n_seconds=1.0).collect(),
        key=lambda r: r["frame_no"],
    )
    assert [r["frame_no"] for r in rows] == [0, 3]
    assert [r["t_s"] for r in rows] == [0.0, 1.0]
    vid = _vid_frames()
    for r in rows:
        assert np.array_equal(M.decode_ppm(bytes(r["frame"])), vid[r["frame_no"]])


def test_frame_sample_composes_with_image_features(spark, media):
    """Sampled frames re-enter the image path: frames → media relation →
    extract_features runs the real PPM codec on each frame."""
    vids = media.filter(F.col("kind") == "video")
    frames = M.sample_frames(vids, every_n_seconds=1.0)
    as_media = frames.select(
        (F.col("media_id") + F.col("frame_no")).alias("media_id"),
        F.lit("image").alias("kind"),
        F.col("frame").alias("content"),
        F.struct(
            F.lit("frame").alias("source"),
            F.length("frame").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )
    feats = M.extract_features(as_media, strict=True).collect()
    assert len(feats) == 2
    for r in feats:
        assert r["features"][0] == 4.0 and r["features"][1] == 6.0  # h, w


def test_read_binary_dir(spark, tmp_path):
    """binaryFile source → media relation with hashed ids + typed meta."""
    d = tmp_path / "imgs"
    d.mkdir()
    (d / "a.ppm").write_bytes(M.encode_ppm(_checker_img()))
    (d / "b.ppm").write_bytes(M.encode_ppm(_checker_img(4, 4)))
    media = M.read_binary_dir(spark, str(d), kind="image")
    rows = {r["meta"]["source"].rsplit("/", 1)[-1]: r for r in media.collect()}
    assert set(rows) == {"a.ppm", "b.ppm"}
    assert rows["a.ppm"]["meta"]["n_bytes"] == len(M.encode_ppm(_checker_img()))
    assert rows["b.ppm"]["kind"] == "image"
    assert len({r["media_id"] for r in rows.values()}) == 2
    # schema contract matches the synthetic-blob constructor
    assert [f.name for f in media.schema.fields] == [
        f.name for f in M.MEDIA_SCHEMA.fields
    ]


def test_wav_roundtrip_pcm16_stereo():
    import numpy as np

    from data_platform_spark.functions.multimodal import decode_wav, encode_wav

    t = np.linspace(0, 1, 400, endpoint=False)
    left = 0.5 * np.sin(2 * np.pi * 5 * t)
    right = 0.25 * np.cos(2 * np.pi * 3 * t)
    sig = np.stack([left, right], axis=1)
    back, rate = decode_wav(encode_wav(sig, 400, bits=16))
    assert rate == 400
    assert back.shape == (400, 2)
    assert np.abs(back - sig).max() < 1 / 32768 + 1e-9


def test_wav_roundtrip_pcm8_mono_and_chunk_walk():
    import numpy as np

    from data_platform_spark.functions.multimodal import decode_wav, encode_wav

    sig = (np.arange(64) / 64.0 - 0.5)[:, None]
    wav = encode_wav(sig, 8000, bits=8)
    # splice an unknown LIST chunk between fmt and data: a real RIFF
    # parser must skip it, a fixed-offset-44 parser breaks
    fmt_end = 12 + 8 + 16
    alien = b"LIST" + (6).to_bytes(4, "little") + b"INFOab"
    spliced = wav[:fmt_end] + alien + wav[fmt_end:]
    spliced = spliced[:4] + (len(spliced) - 8).to_bytes(4, "little") + spliced[8:]
    back, rate = decode_wav(spliced)
    assert rate == 8000
    assert back.shape == (64, 1)
    assert np.abs(back - sig).max() <= 1 / 128 + 1e-9


def test_wav_rejects_non_riff_and_non_pcm():
    import numpy as np
    import pytest

    from data_platform_spark.functions.multimodal import decode_wav, encode_wav

    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not audio at all")
    wav = bytearray(encode_wav(np.zeros((4, 1)), 8000, bits=16))
    wav[20:22] = (3).to_bytes(2, "little")  # IEEE float format code
    with pytest.raises(ValueError, match="PCM"):
        decode_wav(bytes(wav))


def test_audio_features_values():
    import numpy as np

    from data_platform_spark.functions.multimodal import audio_features

    sig = np.array([[0.5], [-0.5], [0.5], [-0.5]])
    f = audio_features(sig, 100)
    assert f[0] == 4.0 and f[1] == 1.0 and f[2] == 100.0
    assert abs(f[3] - 0.04) < 1e-12  # duration
    assert abs(f[4]) < 1e-12  # mean
    assert abs(f[5] - 0.5) < 1e-12  # rms
    assert f[6] == 0.5  # peak
    assert f[7] == 1.0  # every step crosses zero
