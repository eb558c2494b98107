#!/usr/bin/env python
"""O(batch) evidence for the streaming warehouse sinks (PLANS.md round-5).

Times the per-batch core of the two streaming sinks — the exact
foreachBatch body each executes per micro-batch (trigger machinery is a
constant identical across sizes):

- stream_merge_sink  → ``Warehouse.merge`` (partition-pruned copy-on-
  write upsert)
- stream_rollup_sink → ``incremental_rollup`` (pruned read + combine +
  pruned merge, replay-marker keyed)
- join_view_stream_sink → ``incremental_join_view`` (batch ⋈ dim split,
  view upsert + orphan-ledger merge, replay-marker keyed; the dim here
  deliberately misses 10% of keys so every batch exercises BOTH merges)
- scd2_join_view_stream_sink → ``incremental_scd2_join_view`` (as-of
  split against a two-version dim — event timestamps straddle the
  version boundary, same 10% missing keys)

Two sweeps:
1. TABLE size grows at fixed batch size — the O(batch) claim: latency
   must stay flat, because only the 2 hive partitions the batch touches
   are ever read or rewritten.
2. BATCH size grows at fixed table size — latency may grow with the
   batch (that is the numerator of O(batch)), never with the table.

Run: python scripts/bench_streaming.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from data_platform_spark.ops.incremental import incremental_rollup  # noqa: E402
from data_platform_spark.ops.join_view import incremental_join_view  # noqa: E402
from data_platform_spark.ops.scd2_join_view import (  # noqa: E402
    incremental_scd2_join_view,
)
from data_platform_spark.pipeline import Warehouse  # noqa: E402
from data_platform_spark.session import get_spark  # noqa: E402

N_DAYS = 32
BATCH_DAYS = 2  # every batch touches the same 2 partitions


def _table_df(spark, n_rows: int):
    return spark.range(n_rows).select(
        F.col("id").alias("event_id"),
        (F.col("id") % N_DAYS).cast("int").alias("day"),
        (F.col("id") % 1000).alias("user"),
        (F.col("id") * 0.5).alias("value"),
    )


def _batch_df(spark, n_rows: int, key_offset: int):
    # half replaces existing keys, half inserts; all rows in 2 days
    return spark.range(n_rows).select(
        (F.col("id") + key_offset).alias("event_id"),
        (F.col("id") % BATCH_DAYS).cast("int").alias("day"),
        (F.col("id") % 1000).alias("user"),
        (F.col("id") * 0.25).alias("value"),
    )


def time_merge(spark, root: str, table_rows: int, batch_rows: int) -> float:
    wh = Warehouse(root)
    wh.write(
        _table_df(spark, table_rows), "raw", "events", partition_by=["day"]
    )
    times = []
    for i in range(3):
        batch = _batch_df(spark, batch_rows, key_offset=table_rows - batch_rows // 2 + i)
        t0 = time.perf_counter()
        wh.merge(
            spark, "raw", "events", batch,
            keys=["event_id"], partition_col="day", order_col=None,
        )
        times.append(time.perf_counter() - t0)
    return round(statistics.median(times), 3)


def time_rollup(spark, root: str, table_rows: int, batch_rows: int) -> float:
    wh = Warehouse(root)
    incremental_rollup(
        spark, wh, "agg", "by_day_user",
        _table_df(spark, table_rows),
        keys=["day", "user"], measures={"value": "sum"},
        partition_col="day", batch_id="seed",
    )
    times = []
    for i in range(3):
        batch = _batch_df(spark, batch_rows, key_offset=i * batch_rows)
        t0 = time.perf_counter()
        incremental_rollup(
            spark, wh, "agg", "by_day_user", batch,
            keys=["day", "user"], measures={"value": "sum"},
            partition_col="day", batch_id=f"m{table_rows}-{batch_rows}-{i}",
        )
        times.append(time.perf_counter() - t0)
    return round(statistics.median(times), 3)


def _dim_df(spark, n_keys: int = 900):
    # 900 of the 1000 user values -> ~10% of every batch parks as orphans
    return spark.range(n_keys).select(
        F.col("id").alias("d_user"),
        (F.col("id") % 7).cast("int").alias("tier"),
        (F.col("id") * 1.5).alias("score"),
    )


def time_join_view(spark, root: str, table_rows: int, batch_rows: int) -> float:
    wh = Warehouse(root)
    dim = _dim_df(spark)
    kw = dict(
        fact_on="user", dim_on="d_user", fact_key="event_id",
        dim_payload=["tier", "score"], partition_col="day",
    )
    incremental_join_view(
        spark, wh, "dwh", "ev_user", _table_df(spark, table_rows), dim,
        batch_id="seed", **kw,
    )
    times = []
    for i in range(3):
        batch = _batch_df(
            spark, batch_rows, key_offset=table_rows - batch_rows // 2 + i
        )
        t0 = time.perf_counter()
        incremental_join_view(
            spark, wh, "dwh", "ev_user", batch, dim,
            batch_id=f"jv{table_rows}-{batch_rows}-{i}", **kw,
        )
        times.append(time.perf_counter() - t0)
    return round(statistics.median(times), 3)


def _versioned_dim_df(spark, n_keys: int = 900):
    # two versions per key around a 2000-01-01 boundary; same 10%-missing
    # key share as the SCD1 dim
    lo = F.to_timestamp(F.lit("1970-01-01"))
    mid = F.to_timestamp(F.lit("2000-01-01"))
    hi = F.to_timestamp(F.lit("5000-01-01"))
    base = spark.range(n_keys)
    v1 = base.select(
        F.col("id").alias("d_user"),
        (F.col("id") % 7).cast("int").alias("tier"),
        (F.col("id") * 1.5).alias("score"),
        lo.alias("valid_from"),
        mid.alias("valid_to"),
    )
    v2 = base.select(
        F.col("id").alias("d_user"),
        (F.col("id") % 7).cast("int").alias("tier"),
        (F.col("id") * 2.5).alias("score"),
        mid.alias("valid_from"),
        hi.alias("valid_to"),
    )
    return v1.unionByName(v2)


def _with_event_ts(df):
    # event timestamps straddle the 2000-01-01 version boundary
    return df.withColumn(
        "event_ts",
        F.timestamp_seconds(
            F.lit(946_684_800 - 30 * 86_400) + (F.col("event_id") % 60) * 86_400
        ),
    )


def time_scd2_join_view(
    spark, root: str, table_rows: int, batch_rows: int
) -> float:
    wh = Warehouse(root)
    dimv = _versioned_dim_df(spark)
    kw = dict(
        fact_on="user", dim_on="d_user", fact_key="event_id",
        event_col="event_ts", dim_payload=["tier", "score"],
        partition_col="day",
    )
    incremental_scd2_join_view(
        spark, wh, "dwh", "ev_user2", _with_event_ts(_table_df(spark, table_rows)),
        dimv, batch_id="seed", **kw,
    )
    times = []
    for i in range(3):
        batch = _with_event_ts(_batch_df(
            spark, batch_rows, key_offset=table_rows - batch_rows // 2 + i
        ))
        t0 = time.perf_counter()
        incremental_scd2_join_view(
            spark, wh, "dwh", "ev_user2", batch, dimv,
            batch_id=f"jv2-{table_rows}-{batch_rows}-{i}", **kw,
        )
        times.append(time.perf_counter() - t0)
    return round(statistics.median(times), 3)


def main() -> None:
    spark = get_spark(app_name="dps-stream-bench")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"fixed_batch": {}, "fixed_table": {}}
    work = Path(tempfile.mkdtemp(prefix="dps-sbench-"))
    try:
        # sweep 1: table grows 16x, batch fixed -> must stay flat
        for table_rows in (100_000, 400_000, 1_600_000):
            d = work / f"t{table_rows}"
            out["fixed_batch"][f"table={table_rows}"] = {
                "merge_s": time_merge(spark, str(d / "m"), table_rows, 20_000),
                "rollup_s": time_rollup(spark, str(d / "r"), table_rows, 20_000),
                "join_view_s": time_join_view(
                    spark, str(d / "j"), table_rows, 20_000
                ),
                "scd2_join_view_s": time_scd2_join_view(
                    spark, str(d / "j2"), table_rows, 20_000
                ),
            }
        # sweep 2: batch grows 4x, table fixed
        for batch_rows in (10_000, 20_000, 40_000):
            d = work / f"b{batch_rows}"
            out["fixed_table"][f"batch={batch_rows}"] = {
                "merge_s": time_merge(spark, str(d / "m"), 400_000, batch_rows),
                "rollup_s": time_rollup(spark, str(d / "r"), 400_000, batch_rows),
                "join_view_s": time_join_view(
                    spark, str(d / "j"), 400_000, batch_rows
                ),
                "scd2_join_view_s": time_scd2_join_view(
                    spark, str(d / "j2"), 400_000, batch_rows
                ),
            }
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
