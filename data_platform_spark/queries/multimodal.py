"""Multimodal-column queries: binary blob plumbing exercised over the
documents table.

``multimodal_meta`` is oracle-checked (byte length + content hash are
SQL-expressible); ``multimodal_features`` is the mapInPandas featurize
path over text blobs (rows-only; byte-histogram features);
``multimodal_image_decode`` drives the REAL image codec end to end —
PPM blobs are built in-plan from document bytes, decoded by the numpy
P6 parser inside mapInPandas, and the channel statistics are
oracle-checked against DuckDB computing the same statistics from the
source bytes directly.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_platform_spark.functions import multimodal as M
from data_platform_spark.queries._util import fan_out, pround, sql_round
from data_platform_spark.sources.tables import load_table


def _media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.col("source").alias("source"),
            F.length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque blobs: id, kind, byte length, digest."""
    media = _media_from_documents(spark, sf_dir)
    return media.select(
        "media_id",
        "kind",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.md5(F.col("content")).alias("content_md5"),
    )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas featurize over text blobs, exploded to scalar rows.

    The features array (16-bin L1-normalized high-nibble byte histogram,
    functions/multimodal.py:481) is posexploded to one
    (media_id, feature_idx, value) row per bin: the driver's comparator
    canonicalizes through pandas, which cannot hash array cells
    (CORRECTNESS_r04 `unhashable type: 'list'`), and scalar rows are the
    long layout a feature store would join on anyway. Over ASCII text the
    histogram is SQL-expressible, so this path is now oracle-checked
    end-to-end (the mapInPandas codec plumbing vs DuckDB recomputing the
    same nibble counts from the characters)."""
    media = _media_from_documents(spark, sf_dir)
    feats = M.extract_features(media, strict=False)
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        F.posexplode("features").alias("feature_idx", "value"),
    ).select(
        "media_id",
        "kind",
        "n_bytes",
        F.col("feature_idx").cast("long").alias("feature_idx"),
        pround(F.col("value"), 6).alias("value"),
    )


IMG_W = IMG_H = 8  # 8x8 RGB = 192 pixel bytes per synthetic image


def multimodal_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image-decode path, oracle-checked.

    Each document deterministically renders to an 8×8 binary PPM (pixels =
    first 192 chars of repeat(md5(text), 6) — ASCII, so 1 byte per char),
    built as a JVM binary expression. The mapInPandas stage then runs the
    real numpy P6 codec (header parse → pixel reshape → channel stats).
    The oracle recomputes height/width/channel means from the same md5
    characters' code points — if the decoder mis-parsed the header or
    channel layout, every mean would shift and the hash would fail.
    """
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    pix = F.encode(
        F.substring(F.repeat(F.md5(F.col("text")), 6), 1, IMG_W * IMG_H * 3),
        "UTF-8",
    )
    header = F.lit(f"P6\n{IMG_W} {IMG_H}\n255\n".encode())
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.concat(header, pix).alias("content"),
        F.struct(
            F.col("source").alias("source"),
            F.lit(0).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )
    feats = M.extract_features(media)  # real PPM decode per blob
    return feats.select(
        "media_id",
        F.col("features")[0].cast("long").alias("height"),
        F.col("features")[1].cast("long").alias("width"),
        pround(F.col("features")[2], 4).alias("mean_r"),
        pround(F.col("features")[3], 4).alias("mean_g"),
        pround(F.col("features")[4], 4).alias("mean_b"),
    )


QUERIES = {
    "multimodal_meta": multimodal_meta,
    "multimodal_features": multimodal_features,
    "multimodal_image_decode": multimodal_image_decode,
}


def _channel_mean_sql(channel_offset: int) -> str:
    # mean over the 64 pixels of ord(char) for one RGB channel
    return sql_round(
        "(SELECT avg(ord(substr(px, 3 * (j - 1) + "
        f"{channel_offset + 1}, 1))) "
        f"FROM generate_series(1, {IMG_W * IMG_H}) AS t(j))",
        4,
    )

ORACLE = {
    "multimodal_meta": """
        SELECT
            doc_id AS media_id,
            'text' AS kind,
            octet_length(encode(text)) AS n_bytes,
            md5(text) AS content_md5
        FROM documents
    """,
    # Byte-histogram parity: documents.text is ASCII (verified: 0 rows
    # where octet_length(encode(text)) != length(text)), so the UTF-8
    # byte stream IS the character stream and the nibble histogram can be
    # recomputed character-by-character in SQL.
    "multimodal_features": f"""
        WITH pos AS (
            SELECT doc_id, text,
                   unnest(generate_series(1, length(text))) AS j
            FROM documents
        ),
        counts AS (
            SELECT doc_id, ord(substr(text, j, 1)) // 16 AS bin,
                   count(*)::DOUBLE AS c
            FROM pos
            GROUP BY 1, 2
        ),
        bins AS (
            SELECT doc_id, length(text)::BIGINT AS n_bytes,
                   unnest(generate_series(0, {M.FEATURE_DIM - 1})) AS bin
            FROM documents
        )
        SELECT
            bins.doc_id AS media_id,
            'text' AS kind,
            bins.n_bytes,
            bins.bin::BIGINT AS feature_idx,
            {sql_round(
                "CASE WHEN bins.n_bytes = 0 THEN 0.0 "
                "ELSE coalesce(c, 0) / bins.n_bytes END", 6
            )} AS value
        FROM bins
        LEFT JOIN counts
          ON bins.doc_id = counts.doc_id AND bins.bin = counts.bin
    """,
    "multimodal_image_decode": f"""
        WITH s AS (
            SELECT
                doc_id,
                substr(repeat(md5(text), 6), 1, {IMG_W * IMG_H * 3}) AS px
            FROM documents
        )
        SELECT
            doc_id AS media_id,
            {IMG_H}::BIGINT AS height,
            {IMG_W}::BIGINT AS width,
            {_channel_mean_sql(0)} AS mean_r,
            {_channel_mean_sql(1)} AS mean_g,
            {_channel_mean_sql(2)} AS mean_b
        FROM s
    """,
}


WAV_RATE = 8000
WAV_N = 32  # md5 hex string -> 32 one-byte PCM8 samples


def _pcm8_header(n_samples: int) -> bytes:
    block = 1  # mono, 8-bit
    fmt = (
        b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (1).to_bytes(2, "little")
        + WAV_RATE.to_bytes(4, "little")
        + (WAV_RATE * block).to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + (8).to_bytes(2, "little")
    )
    data_hdr = b"data" + n_samples.to_bytes(4, "little")
    body_len = 4 + len(fmt) + len(data_hdr) + n_samples
    return b"RIFF" + body_len.to_bytes(4, "little") + b"WAVE" + fmt + data_hdr


def multimodal_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio-decode path, oracle-checked.

    Each document deterministically renders to a PCM8 mono WAV (samples =
    the 32 md5 hex chars as unsigned bytes), assembled as a JVM binary
    expression: fixed RIFF/fmt/data header + encode(md5(text)). The
    mapInPandas stage runs the real RIFF parser (chunk walk, PCM8
    midpoint-128 normalization) and audio statistics. The oracle
    recomputes n_samples / duration / mean / rms from the same md5
    characters' code points — a mis-parsed header, wrong chunk offset, or
    wrong sign convention shifts every value and fails the hash.
    """
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.concat(
            F.lit(_pcm8_header(WAV_N)), F.encode(F.md5(F.col("text")), "UTF-8")
        ).alias("content"),
        F.struct(
            F.col("source").alias("source"),
            F.lit(0).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )
    feats = M.extract_features(media, strict=True)  # real WAV decode per blob
    return feats.select(
        "media_id",
        F.col("features")[0].cast("long").alias("n_samples"),
        pround(F.col("features")[3], 6).alias("duration_s"),
        pround(F.col("features")[4], 6).alias("mean_amp"),
        pround(F.col("features")[5], 6).alias("rms_amp"),
    )


QUERIES["multimodal_audio_decode"] = multimodal_audio_decode

VID_W, VID_H = 4, 2  # row = 12 bytes: 4-byte aligned, so no DIB padding
VID_FPS = 5.0
VID_FRAME = VID_W * VID_H * 3  # 24 bytes per frame


def _avi_parts(n_frames: int) -> tuple[bytes, bytes, bytes]:
    """Split a template AVI (all-zero frames) into (head, between-frames,
    tail) so the plan can splice per-document frame bytes in as JVM
    ``concat``: head + f1 + mid + f2 + ... + tail. Works because the
    container layout is fixed for fixed (n_frames, w, h, fps) and the
    24-byte frame rows need no padding."""
    full = M.encode_avi(
        np.zeros((n_frames, VID_H, VID_W, 3), dtype=np.uint8), fps=VID_FPS
    )
    movi = full.index(b"movi")
    starts = [movi + 4 + 8 * (i + 1) + VID_FRAME * i for i in range(n_frames)]
    head = full[: starts[0]]
    mid = full[starts[0] + VID_FRAME : starts[1]]
    tail = full[starts[-1] + VID_FRAME :]
    return head, mid, tail


def _doc_avi_content(n_frames: int) -> F.Column:
    """Per-document AVI binary: container bytes from the template, frame
    DIB bytes = consecutive 24-char slices of repeat(md5(text), ...)."""
    head, mid, tail = _avi_parts(n_frames)
    reps = -(-(n_frames * VID_FRAME) // 32)  # ceil: md5 hex is 32 chars
    px = F.repeat(F.md5(F.col("text")), reps)
    parts: list[F.Column] = [F.lit(head)]
    for i in range(n_frames):
        if i:
            parts.append(F.lit(mid))
        parts.append(F.encode(F.substring(px, i * VID_FRAME + 1, VID_FRAME), "UTF-8"))
    parts.append(F.lit(tail))
    return F.concat(*parts)


def multimodal_video_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-decode path, oracle-checked.

    Each document deterministically renders to a 2-frame 4×2 AVI: the
    container (RIFF/hdrl/strl/movi/idx1) comes from the fixed template,
    the two DIB frame payloads are the first 48 chars of
    repeat(md5(text), 2) — spliced together as one JVM ``concat``. The
    mapInPandas stage runs the real AVI parser (recursive LIST walk,
    avih/strh/strf, per-frame DIB decode) and video statistics. The
    oracle recomputes frame count / duration / mean intensity / motion
    from the same md5 characters' code points: a mis-parsed header, wrong
    frame offset, or a dropped/truncated frame shifts every value. Mean
    intensity and motion aggregate integer byte values (exact float64
    sums in both engines — no decimal-weight rounding boundary) and are
    invariant to the decoder's bottom-up/BGR spatial remap because they
    pool over all samples; motion pairs byte j of frame 1 with byte j of
    frame 2 under the same remap."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        _doc_avi_content(2).alias("content"),
        F.struct(
            F.col("source").alias("source"),
            F.lit(0).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )
    feats = M.extract_features(media, strict=True)  # real AVI decode per blob
    return feats.select(
        "media_id",
        F.col("features")[0].cast("long").alias("n_frames"),
        F.col("features")[1].cast("long").alias("height"),
        F.col("features")[2].cast("long").alias("width"),
        pround(F.col("features")[4], 6).alias("duration_s"),
        pround(F.col("features")[5], 4).alias("mean_intensity"),
        pround(F.col("features")[7], 4).alias("motion"),
    )


QUERIES["multimodal_video_decode"] = multimodal_video_decode

ORACLE["multimodal_video_decode"] = f"""
    WITH s AS (
        SELECT doc_id, substr(repeat(md5(text), 2), 1, {2 * VID_FRAME}) AS px
        FROM documents
    )
    SELECT
        doc_id AS media_id,
        2::BIGINT AS n_frames,
        {VID_H}::BIGINT AS height,
        {VID_W}::BIGINT AS width,
        {sql_round(f"2 / {VID_FPS}", 6)} AS duration_s,
        {sql_round(f"(SELECT avg(ord(substr(px, j, 1))) FROM generate_series(1, {2 * VID_FRAME}) AS t(j))", 4)}
            AS mean_intensity,
        {sql_round(f"(SELECT avg(abs(ord(substr(px, {VID_FRAME} + j, 1)) - ord(substr(px, j, 1)))) FROM generate_series(1, {VID_FRAME}) AS t(j))", 4)}
            AS motion
    FROM s
"""

FS_FRAMES = 4  # 4 frames @ 5 fps, sampled every 0.4s -> frames 0 and 2


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL frame sampling + image-path composition, oracle-checked.

    Each document renders to a 4-frame AVI (frames = 24-char md5 slices);
    ``sample_frames`` container-parses it and keeps one frame per 0.4s of
    media time (frames 0 and 2 at 5 fps), re-encoding each as PPM. The
    sampled frames then re-enter the IMAGE path: ``extract_features``
    runs the real P6 codec on every frame and the per-frame channel means
    are oracle-checked. media_id is temporarily composited as
    id * FS_FRAMES + frame_no through the featurize stage (features keep
    only media_id) and split back out — both factors are exact in the
    int64 domain."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        _doc_avi_content(FS_FRAMES).alias("content"),
        F.struct(
            F.col("source").alias("source"),
            F.lit(0).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )
    frames = M.sample_frames(media, every_n_seconds=0.4)
    as_media = frames.select(
        (F.col("media_id") * FS_FRAMES + F.col("frame_no")).alias("media_id"),
        F.lit("image").alias("kind"),
        F.col("frame").alias("content"),
        F.struct(
            F.lit("frame").alias("source"),
            F.length("frame").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )
    feats = M.extract_features(as_media, strict=True)
    fno = F.col("media_id") % FS_FRAMES
    return feats.select(
        F.floor(F.col("media_id") / FS_FRAMES).cast("long").alias("media_id"),
        fno.cast("int").alias("frame_no"),
        pround(fno / F.lit(VID_FPS), 6).alias("t_s"),
        pround(F.col("features")[2], 4).alias("mean_r"),
        pround(F.col("features")[3], 4).alias("mean_g"),
        pround(F.col("features")[4], 4).alias("mean_b"),
    )


QUERIES["multimodal_frame_sample"] = multimodal_frame_sample


def _frame_channel_mean_sql(channel_offset: int) -> str:
    # mean over one frame's 8 pixels of ord(byte) for one BGR channel;
    # frame f starts at px offset 24 * fn
    return sql_round(
        f"(SELECT avg(ord(substr(px, {VID_FRAME} * fn + 3 * (j - 1) + "
        f"{channel_offset + 1}, 1))) "
        f"FROM generate_series(1, {VID_W * VID_H}) AS t(j))",
        4,
    )


ORACLE["multimodal_frame_sample"] = f"""
    WITH s AS (
        SELECT doc_id, repeat(md5(text), {-(-(FS_FRAMES * VID_FRAME) // 32)}) AS px
        FROM documents
    )
    SELECT
        doc_id AS media_id,
        fn AS frame_no,
        {sql_round(f"fn / {VID_FPS}", 6)} AS t_s,
        {_frame_channel_mean_sql(2)} AS mean_r,
        {_frame_channel_mean_sql(1)} AS mean_g,
        {_frame_channel_mean_sql(0)} AS mean_b
    FROM s CROSS JOIN (SELECT unnest([0, 2]) AS fn) f
"""

_AMP = "(ord(substr(px, j, 1)) - 128) / 128.0"

ORACLE["multimodal_audio_decode"] = f"""
    WITH s AS (
        SELECT doc_id, md5(text) AS px FROM documents
    )
    SELECT
        doc_id AS media_id,
        {WAV_N}::BIGINT AS n_samples,
        {sql_round(f"{WAV_N} * 1.0 / {WAV_RATE}", 6)} AS duration_s,
        {sql_round(f"(SELECT avg({_AMP}) FROM generate_series(1, {WAV_N}) AS t(j))", 6)}
            AS mean_amp,
        {sql_round(f"sqrt((SELECT avg(pow({_AMP}, 2)) FROM generate_series(1, {WAV_N}) AS t(j)))", 6)}
            AS rms_amp
    FROM s
"""


# ---------------------------------------------------------------------------
# round 6: augmentation stage (flip + center crop) over the real codec
# ---------------------------------------------------------------------------

AUG_CROP = (2, 2, 4, 4)  # center 4x4 of the 8x8 synthetic frame


def multimodal_image_augment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL augmentation path, oracle-checked: each document's synthetic
    8×8 PPM is decoded by the numpy codec, horizontally FLIPPED, center-
    CROPPED to 4×4 (the canonical vision training augmentations), and
    the per-channel means of the augmented frame are reported. The
    oracle re-derives every augmented pixel position from the source
    md5 characters — flip means column c reads original column
    (W-1-c), crop restricts to the center window — so a mis-indexed
    flip or crop shifts every mean and fails the hash."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    pix = F.encode(
        F.substring(F.repeat(F.md5(F.col("text")), 6), 1, IMG_W * IMG_H * 3),
        "UTF-8",
    )
    header = F.lit(f"P6\n{IMG_W} {IMG_H}\n255\n".encode())
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.concat(header, pix).alias("content"),
    )
    aug = M.augment_image_stats(
        media, flip_horizontal=True, crop=AUG_CROP
    )
    return aug.select(
        "media_id",
        "aug_h",
        "aug_w",
        pround(F.col("mean_r"), 4).alias("mean_r"),
        pround(F.col("mean_g"), 4).alias("mean_g"),
        pround(F.col("mean_b"), 4).alias("mean_b"),
    )


QUERIES["multimodal_image_augment"] = multimodal_image_augment


def _aug_channel_mean_sql(channel_offset: int) -> str:
    r0, c0, ch, cw = AUG_CROP
    # augmented pixel (r, c) = original (r, W-1-c); crop keeps
    # r in [r0, r0+ch), c in [c0, c0+cw)
    return sql_round(
        "(SELECT avg(ord(substr(px, "
        f"3 * (r.r * {IMG_W} + ({IMG_W} - 1 - c.c)) + {channel_offset + 1}"
        ", 1))) "
        f"FROM generate_series({r0}, {r0 + ch - 1}) AS r(r), "
        f"generate_series({c0}, {c0 + cw - 1}) AS c(c))",
        4,
    )


ORACLE["multimodal_image_augment"] = f"""
    WITH s AS (
        SELECT
            doc_id,
            substr(repeat(md5(text), 6), 1, {IMG_W * IMG_H * 3}) AS px
        FROM documents
    )
    SELECT
        doc_id AS media_id,
        {AUG_CROP[2]}::BIGINT AS aug_h,
        {AUG_CROP[3]}::BIGINT AS aug_w,
        {_aug_channel_mean_sql(0)} AS mean_r,
        {_aug_channel_mean_sql(1)} AS mean_g,
        {_aug_channel_mean_sql(2)} AS mean_b
    FROM s
"""
