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
- ALL THREE modalities decode for REAL with pure-numpy codecs — no
  external codec library needed:
  image: binary PPM (P6) + uncompressed 24-bit BMP (``decode_image``) —
  header parse, pixel reshape, channel stats, nearest-neighbor resize;
  audio: RIFF/WAVE PCM 8/16-bit (``decode_wav``) — chunk walk, sign/
  midpoint normalization, rms/zcr/histogram stats;
  video: RIFF/AVI with uncompressed DIB frames (``decode_avi``) —
  recursive LIST walk, avih/strh/strf headers, per-frame DIB decode,
  luminance/motion stats, time-based frame sampling (``sample_frames``).
  Compressed formats (JPEG/PNG/MP3/H.264) would need libraries NOT in
  this container: those fall back to a DETERMINISTIC byte-histogram
  featurizer (an honest content feature, clearly not a codec), and
  ``strict=True`` raises instead of falling back.

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


def _decode_dib24(
    buf: bytes, offset: int, width: int, height: int, top_down: bool = False
) -> np.ndarray:
    """Raw 24-bit DIB pixel array → (H, W, 3) uint8 RGB. The shared tail
    of BMP files and AVI '00db' frames: 4-byte-padded rows, bottom-up row
    order (unless top_down), BGR→RGB channel order."""
    row_bytes = (width * 3 + 3) & ~3  # rows padded to 4-byte boundary
    rows = np.frombuffer(
        buf, dtype=np.uint8, count=row_bytes * height, offset=offset
    ).reshape(height, row_bytes)[:, : width * 3]
    img = rows.reshape(height, width, 3)[:, :, ::-1]  # BGR -> RGB
    if not top_down:
        img = img[::-1]  # bottom-up storage
    return np.ascontiguousarray(img)


def _encode_dib24(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → raw 24-bit DIB bytes (bottom-up BGR rows,
    4-byte padded) — the payload of BMP files and AVI '00db' frames."""
    h, w, _ = img.shape
    pad = ((w * 3 + 3) & ~3) - w * 3
    bgr_bottom_up = img[::-1, :, ::-1].astype(np.uint8)
    if pad == 0:
        return bgr_bottom_up.tobytes()
    return b"".join(
        bgr_bottom_up[r].tobytes() + b"\x00" * pad for r in range(h)
    )


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
    return _decode_dib24(
        content, data_offset, width, abs(height), top_down=height < 0
    )


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


def decode_avi(content: bytes) -> tuple[np.ndarray, float]:
    """RIFF/AVI with uncompressed 24-bit DIB frames → ((T, H, W, 3) uint8
    RGB, fps). Real container parse: recursive walk of word-aligned RIFF
    chunks and LIST sub-lists (hdrl/strl/movi), main header (``avih``),
    video stream header (``strh``/``strf`` BITMAPINFOHEADER), frame
    chunks (``00db``/``00dc``); tolerates and skips ``idx1``/``JUNK``.
    fps comes from the stream header's rate/scale pair, falling back to
    the main header's µs-per-frame."""
    if content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    state: dict[str, int | bytes | None] = {
        "usec_pf": None, "scale": None, "rate": None,
        "width": None, "height": None, "stream_fcc": None,
    }
    frame_spans: list[tuple[int, int]] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid = content[pos : pos + 4]
            size = int.from_bytes(content[pos + 4 : pos + 8], "little")
            body = pos + 8
            if cid == b"LIST":
                walk(body + 4, body + size)  # body[0:4] is the list type
            elif cid == b"avih":
                state["usec_pf"] = int.from_bytes(
                    content[body : body + 4], "little"
                )
            elif cid == b"strh":
                state["stream_fcc"] = content[body : body + 4]
                if state["stream_fcc"] == b"vids":
                    state["scale"] = int.from_bytes(
                        content[body + 20 : body + 24], "little"
                    )
                    state["rate"] = int.from_bytes(
                        content[body + 24 : body + 28], "little"
                    )
            elif cid == b"strf" and state["stream_fcc"] == b"vids":
                state["width"] = int.from_bytes(
                    content[body + 4 : body + 8], "little", signed=True
                )
                state["height"] = int.from_bytes(
                    content[body + 8 : body + 12], "little", signed=True
                )
                bpp = int.from_bytes(content[body + 14 : body + 16], "little")
                comp = int.from_bytes(content[body + 16 : body + 20], "little")
                if bpp != 24 or comp != 0:
                    raise ValueError("only uncompressed 24-bit AVI supported")
            elif cid in (b"00db", b"00dc"):
                frame_spans.append((body, size))
            pos = body + size + (size & 1)  # chunks are 2-byte aligned

    walk(12, len(content))
    w, h = state["width"], state["height"]
    if w is None or not frame_spans:
        raise ValueError("AVI missing video stream format or frames")
    if state["rate"] and state["scale"]:
        fps = state["rate"] / state["scale"]
    elif state["usec_pf"]:
        fps = 1e6 / state["usec_pf"]
    else:
        raise ValueError("AVI missing frame-rate information")
    frames = np.stack(
        [
            _decode_dib24(content, off, w, abs(h), top_down=h < 0)
            for off, _ in frame_spans
        ]
    )
    return frames, fps


def encode_avi(frames: np.ndarray, fps: float) -> bytes:
    """(T, H, W, 3) uint8 RGB + fps → RIFF/AVI bytes (uncompressed
    24-bit 'DIB ' frames, hdrl/strl/movi lists, idx1 index)."""
    t, h, w, c = frames.shape
    if c != 3:
        raise ValueError("encode_avi expects RGB frames")
    frame_size = ((w * 3 + 3) & ~3) * h

    def chunk(cid: bytes, body: bytes) -> bytes:
        return (
            cid
            + len(body).to_bytes(4, "little")
            + body
            + (b"\x00" if len(body) & 1 else b"")
        )

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    scale, rate = 1000, int(round(fps * 1000))
    avih = (
        int(round(1e6 / fps)).to_bytes(4, "little")  # dwMicroSecPerFrame
        + (0).to_bytes(4, "little")  # dwMaxBytesPerSec
        + (0).to_bytes(4, "little")  # dwPaddingGranularity
        + (0x10).to_bytes(4, "little")  # dwFlags: AVIF_HASINDEX
        + t.to_bytes(4, "little")  # dwTotalFrames
        + (0).to_bytes(4, "little")  # dwInitialFrames
        + (1).to_bytes(4, "little")  # dwStreams
        + frame_size.to_bytes(4, "little")  # dwSuggestedBufferSize
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + b"\x00" * 16  # dwReserved[4]
    )
    strh = (
        b"vids"
        + b"DIB "
        + (0).to_bytes(4, "little")  # dwFlags
        + (0).to_bytes(4, "little")  # wPriority + wLanguage
        + (0).to_bytes(4, "little")  # dwInitialFrames
        + scale.to_bytes(4, "little")
        + rate.to_bytes(4, "little")
        + (0).to_bytes(4, "little")  # dwStart
        + t.to_bytes(4, "little")  # dwLength (frames)
        + frame_size.to_bytes(4, "little")
        + (0).to_bytes(4, "little")  # dwQuality
        + (0).to_bytes(4, "little")  # dwSampleSize
        + b"\x00" * 8  # rcFrame
    )
    strf = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")  # biPlanes
        + (24).to_bytes(2, "little")  # biBitCount
        + (0).to_bytes(4, "little")  # BI_RGB
        + frame_size.to_bytes(4, "little")
        + b"\x00" * 16
    )
    frame_chunks, idx_entries, off = [], [], 4
    for i in range(t):
        ck = chunk(b"00db", _encode_dib24(frames[i]))
        frame_chunks.append(ck)
        idx_entries.append(
            b"00db"
            + (0x10).to_bytes(4, "little")  # AVIIF_KEYFRAME
            + off.to_bytes(4, "little")  # offset from 'movi' fourcc
            + frame_size.to_bytes(4, "little")
        )
        off += len(ck)
    body = (
        lst(b"hdrl", chunk(b"avih", avih)
            + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
        + lst(b"movi", b"".join(frame_chunks))
        + chunk(b"idx1", b"".join(idx_entries))
    )
    return chunk(b"RIFF", b"AVI " + body)


def video_features(frames: np.ndarray, fps: float) -> list[float]:
    """Real video features: [n_frames, height, width, fps, duration_s,
    mean intensity (raw RGB byte mean — integer-sum based, so exactly
    reproducible by any engine), std luminance, motion (mean |frame
    delta|), 8-bin luminance histogram (L1-normalized)] —
    FEATURE_DIM=16 values."""
    t, h, w, _ = frames.shape
    flat = frames.reshape(-1, 3).astype("float64")
    lum = flat @ np.array([0.299, 0.587, 0.114])
    motion = (
        float(np.mean(np.abs(np.diff(frames.astype("float64"), axis=0))))
        if t > 1
        else 0.0
    )
    hist = np.histogram(lum, bins=8, range=(0.0, 256.0))[0].astype("float64")
    hist = hist / hist.sum() if hist.sum() else hist
    return [
        float(t),
        float(h),
        float(w),
        float(fps),
        t / fps,
        float(flat.mean()),
        float(lum.std()),
        motion,
        *hist,
    ]


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
    statistics. kind == 'video': REAL decode (RIFF/AVI DIB-frame parser)
    + video statistics. Other kinds (compressed formats — JPEG/MP3/H.264
    — whose codec libraries are not in this container): byte-histogram
    fallback when strict=False; strict=True raises NotImplementedError.
    """

    def _featurize(kind: str, content: bytes) -> list[float]:
        if kind == "image":
            return image_features(decode_image(content))
        if kind == "audio":
            return audio_features(*decode_wav(content))
        if kind == "video":
            return video_features(*decode_avi(content))
        if strict:
            raise NotImplementedError(
                f"no real codec for kind={kind!r} in this environment "
                "(image, audio and video have built-in codecs); "
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


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("t_s", T.DoubleType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def sample_frames(media: DataFrame, every_n_seconds: float = 1.0) -> DataFrame:
    """REAL video frame sampling: one video row in → N frame rows out.

    Each AVI blob is container-parsed (``decode_avi``), one frame every
    ``every_n_seconds`` of media time is selected (always including frame
    0), and each selected frame is re-encoded as a binary PPM — so the
    output rows ARE image media, composable with ``extract_features`` /
    ``resize_images`` downstream. Runs inside one Arrow batch per block
    of videos; the 1→N fan-out happens executor-side (no driver
    involvement), and output size is bounded by duration/interval, not
    input frame count."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            nos: list[int] = []
            ts: list[float] = []
            blobs: list[bytes] = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                frames, fps = decode_avi(bytes(content))
                step = max(1, int(round(every_n_seconds * fps)))
                for i in range(0, frames.shape[0], step):
                    ids.append(mid)
                    nos.append(i)
                    ts.append(i / fps)
                    blobs.append(encode_ppm(frames[i]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": nos, "t_s": ts, "frame": blobs}
            )

    return media.mapInPandas(_sample, FRAME_SCHEMA)


AUGMENT_SCHEMA = (
    "media_id long, aug_h long, aug_w long, "
    "mean_r double, mean_g double, mean_b double"
)


def augment_image_stats(
    media: DataFrame,
    flip_horizontal: bool = True,
    crop: tuple[int, int, int, int] | None = None,
) -> DataFrame:
    """REAL augmentation stage: decode → horizontal flip → crop →
    per-channel means of the AUGMENTED image, inside one Arrow batch —
    the training-time augmentation shape (flip/crop are the canonical
    vision augmentations), with the stats projection standing in for the
    tensor handoff. ``crop`` is (row0, col0, height, width); None keeps
    the full frame. Pure numpy: flip is a stride trick, crop a slice —
    no pixel copies until the mean."""

    r0, c0, ch, cw = crop if crop else (0, 0, -1, -1)

    def _augment(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                arr = decode_image(content)
                if flip_horizontal:
                    arr = arr[:, ::-1, :]
                if crop:
                    arr = arr[r0 : r0 + ch, c0 : c0 + cw, :]
                means = arr.reshape(-1, 3).mean(axis=0)
                rows.append(
                    (
                        int(mid),
                        int(arr.shape[0]),
                        int(arr.shape[1]),
                        float(means[0]),
                        float(means[1]),
                        float(means[2]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "aug_h", "aug_w",
                    "mean_r", "mean_g", "mean_b",
                ],
            )

    return media.mapInPandas(_augment, AUGMENT_SCHEMA)
