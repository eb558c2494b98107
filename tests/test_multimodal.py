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


@pytest.fixture()
def media(spark):
    img = _checker_img()
    blobs = [
        (1, "image", M.encode_ppm(img), "a.ppm"),
        (2, "audio", M.encode_wav(_saw_sig(), 8000, bits=16), "b.wav"),
        (3, "video", bytes(5000), "c.mp4"),
        (4, "image", _bmp_bytes(img), "d.bmp"),
    ]
    return M.media_from_blobs(spark, blobs)


def test_media_schema(media):
    assert media.schema == M.MEDIA_SCHEMA
    assert media.count() == 4


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
    # codec-less kinds (video): byte-histogram fallback, L1-normalized
    assert abs(sum(feats[3]["features"]) - 1.0) < 1e-9
    assert len(feats[3]["features"]) == M.FEATURE_DIM


def test_extract_features_strict_raises_for_codecless_kinds(spark, media):
    with pytest.raises(Exception) as ei:
        M.extract_features(media, strict=True).collect()
    assert "NotImplementedError" in str(ei.value) or "real codec" in str(ei.value)


def test_extract_features_strict_ok_for_images_only(spark, media):
    only_images = media.filter(F.col("kind") == "image")
    rows = M.extract_features(only_images, strict=True).collect()
    assert len(rows) == 2  # real codec path needs no fallback


def test_resize_images_stage(spark, media):
    resized = M.resize_images(media, 4, 4)
    rows = {r["media_id"]: r for r in resized.collect()}
    img = _checker_img()
    for mid in (1, 4):
        out = M.decode_ppm(bytes(rows[mid]["content"]))
        assert np.array_equal(out, img[::2, ::2])
        assert rows[mid]["meta"]["n_bytes"] == len(bytes(rows[mid]["content"]))
    # non-image blobs pass through untouched
    assert bytes(rows[3]["content"]) == bytes(5000)


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
