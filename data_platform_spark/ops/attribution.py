"""Attribution over event streams as single-pass ordered windows.

The naive layout for "clicks before this purchase by the same user" is a
purchases×clicks equi-join on user_id with a time predicate — correct,
but it MATERIALIZES clicks(u)·purchases(u) rows inside each user key
before aggregating: a bot user with 10^5 clicks and 10^3 purchases blows
up to 10^8 intermediate rows in one key, and AQE skew-split only
parallelizes the blowup, it doesn't remove it.

These operators instead UNION the click/purchase streams per user and
compute running first/last click (and frame-bounded click counts) in ONE
ordered window pass — O(n log n) per user for the sort, O(n) for the
frame aggregation (Spark's unbounded-preceding and sliding frames update
incrementally), zero pair materialization. The same primitive the
gap-fill query uses (last(ignorenulls) over an ordered user window).

Tie semantics are encoded in the sort: clicks order BEFORE purchases at
an equal timestamp (is_purchase ascending), so a click at exactly the
purchase instant counts as a touch (c_ts <= p_ts), matching the join
formulation the oracles verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def attribution_touches(ev: DataFrame) -> DataFrame:
    """Per purchase: first-touch and last-touch click timestamps at or
    before the purchase, plus the last-touch gap in exact integer
    microseconds (NULL touches for the 'direct' bucket — purchases with
    no prior click). One shuffle on user_id; no join."""
    stream = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "event_id",
        "ts",
        (F.col("event_type") == "purchase").cast("int").alias("is_p"),
        F.when(F.col("event_type") == "click", F.col("ts")).alias("c_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("is_p"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touched = stream.select(
        "user_id",
        "event_id",
        "ts",
        "is_p",
        F.first("c_ts", ignorenulls=True).over(w).alias("first_touch_ts"),
        F.last("c_ts", ignorenulls=True).over(w).alias("last_touch_ts"),
    )
    return touched.filter(F.col("is_p") == 1).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "first_touch_ts",
        "last_touch_ts",
        (
            F.unix_micros(F.col("ts")) - F.unix_micros(F.col("last_touch_ts"))
        ).alias("last_touch_gap_us"),
    )


def prior_click_counts(ev: DataFrame, lookback_minutes: int) -> DataFrame:
    """Per purchase: how many clicks the same user made in the strictly
    preceding ``lookback_minutes`` (inclusive lower bound, exclusive of
    the purchase instant). A RANGE frame over the microsecond epoch —
    [-lookback, -1µs] relative to each purchase — counts non-null click
    markers; Spark's sliding frame adds/removes rows incrementally, so a
    hot user's cost is O(events), never clicks×purchases."""
    lb = -(lookback_minutes * 60 * 1_000_000)
    stream = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        (F.col("event_type") == "purchase").cast("int").alias("is_p"),
        F.when(F.col("event_type") == "click", F.lit(1)).alias("is_click"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts_us"))
        .rangeBetween(lb, -1)
    )
    counted = stream.select(
        "event_id",
        "is_p",
        F.count("is_click").over(w).alias("n_prior_clicks"),
    )
    return counted.filter(F.col("is_p") == 1).select(
        F.col("event_id").alias("purchase_id"), "n_prior_clicks"
    )
