"""Parquet table loaders for the benchmark/testdata star schema.

Tables (see /root/repo/TESTDATA.md): region nation customer supplier part
orders lineitem events documents embeddings — one parquet per table under
a scale-factor directory.

Scale notes: loaders are plain ``spark.read.parquet`` so Catalyst keeps
predicate pushdown / column pruning; callers select columns and filter
BEFORE joins so the scan only reads what the query needs. At 100 TB these
would be partitioned datasets (e.g. lineitem by ship month) — the loader
interface (name → DataFrame) stays identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Tables with a bounded domain (≤ few thousand rows at any scale factor in
# TPC-H-like schemas): always broadcast-joinable.
BOUNDED_DIMS = {"region", "nation"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TESTDATA_TABLES}")
    # The driver may hand us a session it configured itself; all declared
    # queries assume UTC wall-clock semantics (oracle parity for
    # date_trunc/unix_millis over LTZ timestamps), so pin it here.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # driver testdata events.ts is parquet TIMESTAMP(NANOS), which
        # Spark's vectorized reader rejects; read the raw int64 nanos and
        # truncate to the engine's microsecond timestamps (the same
        # truncation DuckDB applies). Re-derived events tables (e.g.
        # scripts/make_scale.py output) already carry µs timestamps —
        # convert only when the column arrives as the raw long.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # parquet timestamp[us] with isAdjustedToUTC=false arrives as
            # TIMESTAMP_NTZ, which unix_millis()/window() reject. The session
            # timezone is pinned to UTC above, so this cast is
            # value-preserving and keeps DuckDB-oracle epoch parity.
            # CAVEAT (ADVICE r4): the NTZ->LTZ cast resolves the timezone at
            # EXECUTION time, not here — if a caller resets
            # spark.sql.session.timeZone between load and action, epoch
            # values shift. The pin above re-applies on every load_table
            # call, which covers every declared-query path (each call loads
            # its own tables); a caller composing loaded frames across its
            # own tz changes is outside the engine's contract.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df.select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        )
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}
