"""SparkSession factory.

One place to encode the engine's execution defaults so every entry point
(tests, bench, pipeline runs) gets the same, scale-aware configuration:

- UTC session timezone — the reference stores TIMESTAMPTZ and relies on a
  single transaction clock (`/root/reference/dags/configure.py:61`); UTC
  everywhere keeps parquet round-trips and oracle comparisons exact.
- AQE on — runtime shuffle-partition coalescing and skew-join splitting are
  the 100 TB safety net for every join/agg this engine plans.
- Arrow enabled — all Python<->JVM transfer is columnar; any Pandas UDF in
  the extension surface is vectorized, never row-at-a-time.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "data-platform-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when no cluster is
    configured; on a real cluster the caller's spark-submit settings win.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # INT96 (the legacy default) carries NO parquet min/max statistics,
        # silently disabling file/row-group pruning on every timestamp
        # column the engine writes; INT64 micros restores it
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # local mode: don't let tiny testdata files produce 1-row partitions
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
