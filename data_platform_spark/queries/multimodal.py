"""Multimodal-column queries: binary blob plumbing exercised over the
documents table (text bytes as opaque blobs — the container has no image/
audio testdata or codecs; functions/multimodal.py documents where real
codecs plug in).

``multimodal_meta`` is oracle-checked (byte length + content hash are
SQL-expressible); ``multimodal_features`` is the mapInPandas decode path
(rows-only driver check — deterministic fake decoder).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_platform_spark.functions import multimodal as M
from data_platform_spark.queries._util import fan_out
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
    """mapInPandas decode/featurize over binary blobs (stub codec)."""
    media = _media_from_documents(spark, sf_dir)
    return M.extract_features(media, strict=False)


QUERIES = {
    "multimodal_meta": multimodal_meta,
    "multimodal_features": multimodal_features,
}

ORACLE = {
    "multimodal_meta": """
        SELECT
            doc_id AS media_id,
            'text' AS kind,
            octet_length(encode(text)) AS n_bytes,
            md5(text) AS content_md5
        FROM documents
    """,
    # multimodal_features: intentionally no oracle (Pandas-UDF decode stub)
}
