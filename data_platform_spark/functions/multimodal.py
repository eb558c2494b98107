"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, processed by Arrow-batched Pandas UDFs over mapInPandas.

Design (the Spark-side plumbing is real and tested; codec work is
stubbed):
- A media relation is ``(media_id, kind, content: binary, meta: struct)``
  — the layout ``spark.read.format("binaryFile")`` produces, normalized.
- Decode / resize / frame-sample run as ``mapInPandas`` stages: one Arrow
  batch in, one out, binary passed through zero-copy. Partitioning is by
  media_id (even, high-cardinality) and each batch is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor memory is
  bounded regardless of blob size skew.
- The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container:
  ``decode_stub`` raises NotImplementedError when ``strict`` else emits a
  DETERMINISTIC fake decode (byte-histogram features) so the distributed
  plumbing — schema, batching, UDF signature — is exercised end-to-end.

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


def _fake_decode_features(content: bytes) -> list[float]:
    """Deterministic stand-in for a codec: 16-bin byte histogram,
    L1-normalized. Replaces e.g. CLIP/VGG pooling in this container."""
    if not content:
        return [0.0] * FEATURE_DIM
    arr = np.frombuffer(content, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=FEATURE_DIM).astype("float64")
    return list(hist / hist.sum())


def extract_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Decode + featurize every blob via mapInPandas (Arrow-batched).

    strict=True raises NotImplementedError — the marker that a real codec
    belongs here (PIL image decode / ffmpeg frame sample); the fake path
    keeps the distributed plumbing testable in codec-less environments.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "real codec decode (PIL/ffmpeg) not available in this "
                "environment; use strict=False for the deterministic stub"
            )
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "features": pdf["content"].map(_fake_decode_features),
                }
            )

    return media.mapInPandas(decode_batches, FEATURES_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize stage shape: binary in → binary out, same relation.

    Stub: passes bytes through and records the requested geometry in meta
    (a real implementation swaps only ``_resize``)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pdf  # geometry change happens inside the codec; bytes pass through

    return media.withColumn(
        "meta",
        F.struct(
            F.col("meta.source").alias("source"),
            F.col("meta.n_bytes").alias("n_bytes"),
        ),
    ).mapInPandas(_resize, media.schema)


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
