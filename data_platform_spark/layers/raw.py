"""Bronze (raw) layer: append/upsert log of API payloads.

Reference: ``raw.character/location/episode (source_id PK, payload JSONB,
loaded_at)`` with ``ON CONFLICT (source_id) DO UPDATE SET payload =
EXCLUDED.payload`` (/root/reference/dags/raw_character.py:84-94,46-52).

Spark rewrite (S4): union existing ∪ incoming, keep the latest row per
source_id (last-writer-wins window), rewrite the table. The window
shuffles on source_id — the natural key — and at scale bronze would be
ingest-date partitioned so only the affected partitions rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def upsert_bronze(existing: DataFrame | None, incoming: DataFrame) -> DataFrame:
    """Last-writer-wins upsert on source_id, newest loaded_at survives.

    Deterministic tie-break on payload (identical loaded_at — e.g. page
    overlap within one batch — keeps one row, any equal payload).
    """
    merged = incoming if existing is None else existing.unionByName(incoming)
    w = Window.partitionBy("source_id").orderBy(
        F.desc("loaded_at"), F.desc("payload")
    )
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
