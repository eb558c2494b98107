"""Structured Streaming pipelines over event data.

The reference has no streaming surface (batch API pulls only —
/root/reference/dags/raw_character.py:29); this module is the engine's
scale path for continuous ingestion: file-drop directory streams (the
pattern the bronze REST ingestion converges to at 100 TB, SURVEY.md §2.1
S1) plus watermarked event-time aggregations.

Each streaming transformation has a batch dual in
``data_platform_spark/queries/events.py`` validated against the DuckDB
oracle — a tumbling-window agg over a static frame equals the final state
of the streaming agg, so the oracle indirectly validates these semantics.

Scale notes: state stores are keyed by (window, type) / user_id — evenly
distributed; watermarks bound state size; ``availableNow`` triggers give
batch-sized reprocessing with streaming exactly-once bookkeeping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession,
    source_dir: str,
    fmt: str = "json",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Directory stream of dropped event files (declared schema, never
    inferred). JSON for interop with the bronze layer; parquet works the
    same way."""
    reader = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .format(fmt)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(source_dir)


def hourly_agg_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling 1-hour window per event_type.

    Batch dual: queries/events.py::events_hourly_by_type (oracle-checked).
    The watermark bounds state: windows older than max(event time) -
    watermark are finalized and evicted.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionize_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based session windows per user (built-in session_window).

    Batch dual: queries/events.py::events_sessionize (lag+cumsum form).
    Both define a session as events separated by < gap of inactivity.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("session_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def user_running_totals_stream(events: DataFrame) -> DataFrame:
    """Continuously-updated per-user totals (complete-mode aggregation).

    The streaming analog of the warehouse's incremental fact maintenance:
    state keyed by user_id, updated per micro-batch.
    """
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
        F.max("ts").alias("last_seen"),
    )


def dedup_events_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exact dedup: one row per event_id despite at-least-once
    redelivery — the streaming member of the dedup family
    (batch dual: dedup_exact_groups' hash-group semantics).

    ``dropDuplicatesWithinWatermark`` keeps dedup state only until the
    watermark passes each key's event time, so state is bounded by the
    redelivery horizon instead of growing with the stream — the property
    that makes exact dedup viable on an unbounded 100 TB/day feed
    (plain ``dropDuplicates`` on a stream accumulates state forever).
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_to_memory_sink(
    df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
) -> "StreamingQuery":  # noqa: F821
    """Execute a streaming plan against an in-memory table (testing aid).

    availableNow processes everything currently in the source directory
    then stops — exactly-once batch reprocessing with streaming semantics.
    """
    return (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


def click_purchase_join_stream(
    clicks: DataFrame,
    purchases: DataFrame,
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: each purchase matched to the same
    user's clicks in the preceding ``within`` interval.

    Both sides are watermarked so the join state is bounded: a click can
    be dropped from state once it is older than watermark + within; the
    range condition gives Spark the bound it needs. Batch dual:
    queries/events.py::funnel_click_to_purchase (oracle-checked).
    """
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return p.join(
        c,
        F.expr(
            f"""
            p_user = c_user AND
            click_ts <= purchase_ts AND
            click_ts >= purchase_ts - INTERVAL {within}
            """
        ),
    ).select("p_user", "purchase_id", "purchase_ts", "click_ts")
