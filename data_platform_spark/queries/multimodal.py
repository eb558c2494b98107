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
    """mapInPandas featurize over text blobs (byte-histogram features)."""
    media = _media_from_documents(spark, sf_dir)
    return M.extract_features(media, strict=False)


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
    # multimodal_features: intentionally no oracle (Pandas-UDF featurizer)
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
