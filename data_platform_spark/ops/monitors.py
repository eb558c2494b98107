"""Observability metric cores shared by the batch queries and the
streaming foreachBatch monitors.

`events_daily_quality` and `events_anomaly_zscore`
(queries/events.py) are the oracle-gated batch forms; a real pipeline
runs the same metrics CONTINUOUSLY as the stream lands
(streaming/monitors.py). Both call these cores over an events frame, so
the streaming monitor's output is definitionally the batch query's —
asserted by stream-vs-batch equality tests, the same contract as
stream_rollup_sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_platform_spark.queries._util import pround


def daily_quality_metrics(ev: DataFrame) -> DataFrame:
    """Per-day data-quality rollup: row count, distinct users, null
    rates of the nullable columns, exact median value. One shuffle
    keyed by day for the algebraic aggregates; the exact median runs
    through the two-phase grouped-percentile layout
    (ops.global_order.grouped_percentile) — a day of events is
    unbounded, and the native ``percentile()`` aggregate would buffer
    the entire day's values in a single task (VERDICT r7 #1). The
    median frame LEFT-joins back on day so an all-null day keeps its
    row with a NULL median, exactly as the aggregate behaved."""
    from data_platform_spark.ops.global_order import grouped_percentile

    # the base rollup and the median's rank phase each scan ev once;
    # deliberately NOT persisted — the common input is the (pruned)
    # events read itself, and pinning an O(table) relation to save one
    # scan-bound pass is the wrong trade at 100 TB (contrast
    # session_quality_by_day, whose shared base is the much smaller
    # derived sessions relation and IS persisted)
    dayed = ev.withColumn("day", F.date_trunc("day", F.col("ts")))
    base = dayed.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("user_id").alias("n_users"),
        pround(
            F.sum(F.col("value").isNull().cast("int")) / F.count(F.lit(1)),
            6,
        ).alias("null_value_rate"),
        pround(
            F.sum(F.col("props").isNull().cast("int")) / F.count(F.lit(1)),
            6,
        ).alias("null_props_rate"),
    )
    med = grouped_percentile(dayed, ["day"], "value", {"p50": 0.5})
    return base.join(med, on="day", how="left").select(
        "day",
        "n_rows",
        "n_users",
        "null_value_rate",
        "null_props_rate",
        pround(F.col("p50"), 4).alias("median_value"),
    )


def rolling_zscore(
    ev: DataFrame, lookback: int, min_n: int, cut: float
) -> DataFrame:
    """Per-event rolling z-score against the user's own trailing
    baseline (previous ``lookback`` events' mean/stddev). Rows-bounded
    frame: state per key is O(lookback). Mean/stddev round to 4 dp
    FIRST; the z-score (2 dp) and flag derive only from rounded values
    (cross-engine determinism, see the query docstring)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(-lookback, -1)
    )
    base = ev.select(
        "event_id",
        "user_id",
        "value",
        F.count(F.lit(1)).over(w).alias("n_prior"),
        pround(F.avg("value").over(w), 4).alias("base_mean"),
        pround(F.stddev_samp("value").over(w), 4).alias("base_std"),
    )
    z = F.when(
        (F.col("n_prior") >= min_n) & (F.col("base_std") > 0),
        pround(
            F.abs(F.col("value") - F.col("base_mean")) / F.col("base_std"), 2
        ),
    )
    return base.select(
        "event_id",
        "user_id",
        "n_prior",
        "base_mean",
        "base_std",
        z.alias("zscore"),
        F.coalesce(z >= cut, F.lit(False)).alias("is_anomaly"),
    )
