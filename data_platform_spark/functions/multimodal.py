"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, processed by Arrow-batched Pandas UDFs over mapInPandas.

Design:
- A media relation is ``(media_id, kind, content: binary, meta: struct)``
  — the layout ``spark.read.format("binaryFile")`` produces, normalized.
- Decode / resize / frame-sample run as ``mapInPandas`` stages: one Arrow
  batch in, one out, binary passed through zero-copy. Partitioning is by
  media_id (even, high-cardinality) and each batch is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor memory is
  bounded regardless of blob size skew.
- IMAGE decode is REAL: a pure-numpy codec for binary PPM (P6) and
  uncompressed 24-bit BMP (``decode_image``), with header parsing, pixel
  reshape, channel statistics and nearest-neighbor resize — no external
  codec library needed. Compressed formats (JPEG/PNG) and audio/video
  codecs (ffmpeg/torchaudio) are NOT in this container: those kinds fall
  back to a DETERMINISTIC byte-histogram featurizer (an honest content
  feature, clearly not a codec), and ``strict=True`` raises instead of
  falling back.

Reference note: the reference has no binary/multimodal surface; this is
the charter-mandated extension (BASELINE.json north_star).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ]
)


def read_binary_dir(spark: SparkSession, path: str, kind: str) -> DataFrame:
    """Directory of media files → media relation via the binaryFile source
    (scales to millions of objects; at 100 TB this is an object-store
    listing partitioned by prefix)."""
    raw = spark.read.format("binaryFile").load(path)
    return raw.select(
        F.xxhash64("path").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col("content"),
        F.struct(
            F.col("path").alias("source"), F.col("length").alias("n_bytes")
        ).alias("meta"),
    )


def media_from_blobs(spark: SparkSession, blobs: list[tuple[int, str, bytes, str]]) -> DataFrame:
    """(media_id, kind, content, source) rows → media relation."""
    rows = [
        (mid, kind, content, (source, len(content)))
        for (mid, kind, content, source) in blobs
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# real pure-numpy image codec: binary PPM (P6) + uncompressed 24-bit BMP
# ---------------------------------------------------------------------------


def _ppm_header_tokens(content: bytes, n: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace/comment-separated numeric tokens after the P6
    magic; returns (tokens, offset-of-pixel-data)."""
    pos = 2  # past b"P6"
    tokens: list[int] = []
    while len(tokens) < n:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(content) and content[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(content[start:pos]))
    return tokens, pos + 1  # single whitespace byte after maxval


def decode_ppm(content: bytes) -> np.ndarray:
    """Binary PPM (P6) → (H, W, 3) uint8 array. Real header parse:
    whitespace/comment handling, dimension tokens, maxval check."""
    if content[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) file")
    (width, height, maxval), offset = _ppm_header_tokens(content, 3)
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval} (only 8-bit)")
    need = width * height * 3
    pix = np.frombuffer(content, dtype=np.uint8, count=need, offset=offset)
    return pix.reshape(height, width, 3)


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 array → binary PPM (P6) bytes."""
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_ppm expects an RGB array")
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def decode_bmp(content: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BI_RGB) → (H, W, 3) uint8 RGB array.
    Parses BITMAPFILEHEADER + BITMAPINFOHEADER, handles 4-byte row
    padding, bottom-up row order, and BGR→RGB channel order."""
    if content[:2] != b"BM":
        raise ValueError("not a BMP file")
    data_offset = int.from_bytes(content[10:14], "little")
    width = int.from_bytes(content[18:22], "little", signed=True)
    height = int.from_bytes(content[22:26], "little", signed=True)
    bpp = int.from_bytes(content[28:30], "little")
    compression = int.from_bytes(content[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    top_down = height < 0
    height = abs(height)
    row_bytes = (width * 3 + 3) & ~3  # rows padded to 4-byte boundary
    rows = np.frombuffer(
        content, dtype=np.uint8, count=row_bytes * height, offset=data_offset
    ).reshape(height, row_bytes)[:, : width * 3]
    img = rows.reshape(height, width, 3)[:, :, ::-1]  # BGR -> RGB
    if not top_down:
        img = img[::-1]  # bottom-up storage
    return np.ascontiguousarray(img)


def decode_wav(content: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM → ((n_samples, n_channels) float64 in [-1, 1),
    sample_rate). Real container parse: walks word-aligned RIFF chunks
    (tolerates LIST/fact chunks between fmt and data), supports PCM
    8-bit unsigned and 16-bit signed little-endian."""
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    fmt = data = None
    pos = 12
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        size = int.from_bytes(content[pos + 4 : pos + 8], "little")
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    if fmt is None or data is None:
        raise ValueError("WAVE file missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_ch = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1:
        raise ValueError(f"only PCM (format 1) supported, got {audio_format}")
    if bits == 8:  # 8-bit PCM is UNSIGNED, midpoint 128
        x = (np.frombuffer(data, dtype=np.uint8).astype("float64") - 128.0) / 128.0
    elif bits == 16:  # 16-bit PCM is SIGNED little-endian
        x = np.frombuffer(data, dtype="<i2").astype("float64") / 32768.0
    else:
        raise ValueError(f"unsupported PCM bit depth {bits} (8/16 only)")
    n = (len(x) // n_ch) * n_ch
    return x[:n].reshape(-1, n_ch), rate


def encode_wav(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """(n_samples, n_channels) float64 in [-1, 1) → PCM WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n_ch = samples.shape[1]
    if bits == 8:
        raw = (samples * 128.0 + 128.0).clip(0, 255).astype(np.uint8).tobytes()
    elif bits == 16:
        raw = (samples * 32768.0).clip(-32768, 32767).astype("<i2").tobytes()
    else:
        raise ValueError("bits must be 8 or 16")
    block = n_ch * bits // 8
    fmt = (
        b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + n_ch.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    data = b"data" + len(raw).to_bytes(4, "little") + raw
    body = b"WAVE" + fmt + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def audio_features(samples: np.ndarray, rate: int) -> list[float]:
    """Real audio features: [n_samples, n_channels, sample_rate,
    duration_s, mean, rms, peak, zero-crossing-rate, 8-bin amplitude
    histogram (L1-normalized)] — FEATURE_DIM=16 values, mono-mixed."""
    n, ch = samples.shape
    mono = samples.mean(axis=1)
    mean = float(mono.mean())
    rms = float(np.sqrt(np.mean(mono**2)))
    peak = float(np.abs(mono).max())
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
    hist = np.histogram(mono, bins=8, range=(-1.0, 1.0))[0].astype("float64")
    hist = hist / hist.sum() if hist.sum() else hist
    return [
        float(n),
        float(ch),
        float(rate),
        n / rate,
        mean,
        rms,
        peak,
        zcr,
        *hist,
    ]


def decode_image(content: bytes) -> np.ndarray:
    """Dispatch on magic bytes: P6 PPM or 24-bit BMP → (H, W, 3) uint8."""
    if content[:2] == b"P6":
        return decode_ppm(content)
    if content[:2] == b"BM":
        return decode_bmp(content)
    raise ValueError("unsupported image format (supported: P6 PPM, 24-bit BMP)")


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width) — pure index math."""
    h, w, _ = img.shape
    rows = (np.arange(height) * h // height).clip(0, h - 1)
    cols = (np.arange(width) * w // width).clip(0, w - 1)
    return img[rows][:, cols]


def image_features(img: np.ndarray) -> list[float]:
    """Real image features: [height, width, mean RGB (3), std RGB (3),
    8-bin luminance histogram (L1-normalized)] — FEATURE_DIM=16 values."""
    h, w, _ = img.shape
    fimg = img.reshape(-1, 3).astype("float64")
    means = fimg.mean(axis=0)
    stds = fimg.std(axis=0)
    lum = fimg @ np.array([0.299, 0.587, 0.114])
    hist = np.histogram(lum, bins=8, range=(0.0, 256.0))[0].astype("float64")
    hist = hist / hist.sum()
    return [float(h), float(w), *means, *stds, *hist]


def byte_histogram_features(content: bytes) -> list[float]:
    """Codec-less fallback featurizer: 16-bin byte histogram,
    L1-normalized. An honest content statistic (used for kinds whose real
    codec — ffmpeg/torchaudio/JPEG — is not in this container)."""
    if not content:
        return [0.0] * FEATURE_DIM
    arr = np.frombuffer(content, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=FEATURE_DIM).astype("float64")
    return list(hist / hist.sum())


def extract_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Decode + featurize every blob via mapInPandas (Arrow-batched).

    kind == 'image': REAL decode (PPM/BMP numpy codec) + image statistics.
    kind == 'audio': REAL decode (RIFF/WAVE PCM parser) + audio
    statistics. Other kinds: byte-histogram fallback when strict=False;
    strict=True raises NotImplementedError for them — the marker that a
    real video codec (ffmpeg) belongs there.
    """

    def _featurize(kind: str, content: bytes) -> list[float]:
        if kind == "image":
            return image_features(decode_image(content))
        if kind == "audio":
            return audio_features(*decode_wav(content))
        if strict:
            raise NotImplementedError(
                f"no real codec for kind={kind!r} in this environment "
                "(image and audio are the kinds with built-in codecs); "
                "use strict=False for the byte-histogram fallback"
            )
        return byte_histogram_features(content)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "features": [
                        _featurize(k, c)
                        for k, c in zip(pdf["kind"], pdf["content"])
                    ],
                }
            )

    return media.mapInPandas(decode_batches, FEATURES_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """REAL image resize stage: binary in → binary out, same relation.

    Each image blob is decoded (PPM/BMP), nearest-neighbor resampled to
    (height, width), and re-encoded as PPM — all inside one Arrow batch.
    Non-image kinds pass through untouched (a video implementation would
    swap in an ffmpeg scale filter here)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            is_img = out["kind"] == "image"
            out.loc[is_img, "content"] = out.loc[is_img, "content"].map(
                lambda b: encode_ppm(resize_nearest(decode_image(b), width, height))
            )
            out["meta"] = [
                {"source": m["source"], "n_bytes": len(c)}
                for m, c in zip(out["meta"], out["content"])
            ]
            yield out

    return media.mapInPandas(_resize, media.schema)


def frame_sample_stub(
    media: DataFrame, every_n_seconds: float = 1.0
) -> DataFrame:
    """Video frame sampling stage shape: one row in → N frame rows out.

    Stub emits a single deterministic 'frame' per video (first 1KB slice)
    to exercise the 1→N mapInPandas fan-out contract."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_no", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), False),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_no": 0,
                    "frame": pdf["content"].map(lambda b: bytes(b[:1024])),
                }
            )

    return media.mapInPandas(_sample, out_schema)
