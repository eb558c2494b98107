"""Streaming observability: foreachBatch incremental monitors.

The shape a real pipeline runs the data-quality and anomaly monitors in:
each micro-batch (1) MERGEs into the day-partitioned events table with
newest-wins replay safety — the same exactly-once-effective contract as
stream_merge_sink — then (2) recomputes the monitor metrics for ONLY the
slice the batch touched (days for the quality rollup, users for the
rolling z-score) from the merged table, and upserts those rows into the
monitor table. Per-batch cost is O(touched partitions/keys), and the
final monitor state is definitionally the batch query's output because
both call the same metric cores (ops/monitors.py) — asserted by
stream-vs-batch equality tests (tests/test_streaming.py).

Scale notes: the touched-day collect is bounded by the date count, never
row count; the touched-user restriction is a left-semi join (no driver
collect). The z-score recompute reads each touched user's full history —
at 100 TB the events table would additionally bucket by user_id (or the
baseline window would be time-bounded) so that read stays pruned; the
day-partitioned layout here prunes the quality path, which is the
hot one (every batch touches ~1 day; a bot user can touch years).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_platform_spark.cache import release_caches
from data_platform_spark.ops.monitors import (
    daily_quality_metrics,
    rolling_zscore,
)
from data_platform_spark.pipeline import Warehouse

EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _merge_batch(
    batch_df: DataFrame, wh: Warehouse, schema: str, events_table: str
) -> DataFrame:
    """Fold a micro-batch into the day-partitioned events table
    (newest-wins on ts per event_id) and return the batch with its
    derived day column.

    Contract (inherited from Warehouse.merge's stable-partition rule):
    an event's EVENT TIME is immutable per event_id — at-least-once
    replays re-deliver the same payload, which newest-wins absorbs. A
    producer that MUTATES ts across a day boundary for an existing
    event_id would leave the stale row in the old day partition (merge
    rewrites only the batch's partitions) and the old day's quality row
    would not be recomputed; such corrections must go through a
    full-table rewrite, the same as any date-partitioned warehouse."""
    batch = batch_df.withColumn("day", F.to_date(F.date_trunc("day", "ts")))
    wh.merge(
        batch.sparkSession,
        schema,
        events_table,
        batch,
        keys=["event_id"],
        partition_col="day",
        order_col="ts",
    )
    return batch


def upsert_keyed_rows(
    wh: Warehouse,
    schema: str,
    table: str,
    fresh: DataFrame,
    key_cols: list[str],
) -> None:
    """Replace a table's rows for the fresh keys (anti-join out, union
    in) — the shared upsert discipline of every foreachBatch ledger and
    monitor table (quality/anomaly monitors here, the near-dup decision
    ledger in streaming/dedup.py, the ANN maintenance ledger in
    streaming/ann.py). These tables are metadata-scale (one row per
    day / touched user / batch / scored doc), so the atomic-swap write
    is the right cost."""
    spark = fresh.sparkSession
    existing = wh.read(spark, schema, table)
    if existing is None:
        wh.write(fresh, schema, table)
        return
    kept = existing.join(
        fresh.select(*key_cols).distinct(), key_cols, "left_anti"
    )
    wh.write(kept.unionByName(fresh), schema, table)


_upsert_monitor_rows = upsert_keyed_rows  # internal call sites below


def daily_quality_monitor_sink(
    stream_df: DataFrame,
    wh: Warehouse,
    checkpoint_dir: str,
    schema: str = "dwh",
    events_table: str = "events_monitored",
    quality_table: str = "daily_quality",
):
    """foreachBatch monitor: merge the batch, re-derive the per-day
    quality rollup (ops/monitors.daily_quality_metrics) for the days the
    batch touched — a partition-pruned read — and upsert them keyed by
    day. After the stream drains, the monitor table equals
    events_daily_quality over the full source."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = _merge_batch(batch_df, wh, schema, events_table)
        touched = [r[0] for r in batch.select("day").distinct().collect()]
        ev = (
            wh.read(spark, schema, events_table)
            .filter(F.col("day").isin(touched))
            .select(*EVENT_COLS)
        )
        try:
            _upsert_monitor_rows(
                wh, schema, quality_table, daily_quality_metrics(ev), ["day"]
            )
        finally:
            # The metric core scope-persists its rank relation; the NEXT
            # batch reads the same table path with MORE files, and a
            # plan-equal persist would silently reuse this batch's stale
            # cache (the cross-batch variant of the flattering-cache trap,
            # PLANS.md r7). Each batch drains its caches on the way out.
            release_caches()

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def anomaly_monitor_sink(
    stream_df: DataFrame,
    wh: Warehouse,
    checkpoint_dir: str,
    lookback: int,
    min_n: int,
    cut: float,
    schema: str = "dwh",
    events_table: str = "events_monitored",
    anomaly_table: str = "event_anomalies",
):
    """foreachBatch monitor: merge the batch, re-score the rolling
    z-score (ops/monitors.rolling_zscore) for ONLY the users the batch
    touched (left-semi restrict — a new event shifts the trailing
    baseline of that user's later events, so the user's scores are
    replaced wholesale), and upsert keyed by user. After the stream
    drains, the monitor table equals events_anomaly_zscore over the
    full source."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = _merge_batch(batch_df, wh, schema, events_table)
        touched_users = batch.select("user_id").distinct()
        ev = (
            wh.read(spark, schema, events_table)
            .join(touched_users, "user_id", "left_semi")
            .select(*EVENT_COLS)
        )
        try:
            _upsert_monitor_rows(
                wh,
                schema,
                anomaly_table,
                rolling_zscore(ev, lookback, min_n, cut),
                ["user_id"],
            )
        finally:
            release_caches()  # same cross-batch stale-cache guard as above

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
