"""Pipeline runner + parquet warehouse with atomic swap.

Replaces the reference's 11 manually-ordered Airflow DAGs
(/root/reference/dags/, SURVEY.md §2.5 O2/O3) with one explicit data-flow
function: configure → raw → stg → dwh, real dependencies instead of an
implicit trigger order.

Atomicity (O2): Spark can't UPDATE in place and must never read and write
the same path in one job (SURVEY.md §7.4.1). ``Warehouse.write`` stages
to a temp dir, then swaps directories with two renames — a failed job
leaves the previous state untouched. (Adopting a table format with real
transactions — Delta/Iceberg — is a drop-in replacement for this class.)
"""

from __future__ import annotations

import fcntl
import os
import shutil
import uuid
from contextlib import contextmanager
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_platform_spark.layers import datamart as L_dm
from data_platform_spark.layers import dwh as L_dwh
from data_platform_spark.layers import raw as L_raw
from data_platform_spark.layers import stg as L_stg


class Warehouse:
    """Directory-per-table parquet warehouse: <root>/<schema>/<table>/."""

    SCHEMAS = ("raw", "stg", "dwh", "datamart")

    def __init__(self, root: str):
        self.root = root
        for s in self.SCHEMAS:
            os.makedirs(os.path.join(root, s), exist_ok=True)
        self.recover()

    def recover(self) -> list[str]:
        """Crash recovery for the double-rename swap.

        The swap's vulnerable window: after ``rename(final, old)`` but
        before ``rename(tmp, final)`` the table directory is ABSENT — a
        crash there would otherwise make the next run treat the table as
        never-loaded and silently rebuild (losing SCD2 history). On
        startup: roll back any ``.old-*`` whose final dir is missing,
        delete ``.old-*`` leftovers whose final dir exists (swap completed,
        cleanup died), and sweep stale ``.tmp-*`` staging dirs.

        Returns a log of actions for tests/observability.
        """
        actions: list[str] = []
        for s in self.SCHEMAS:
            sdir = os.path.join(self.root, s)
            for entry in sorted(os.listdir(sdir)):
                full = os.path.join(sdir, entry)
                if not os.path.isdir(full):
                    continue
                if ".tmp-" in entry:
                    shutil.rmtree(full, ignore_errors=True)
                    actions.append(f"swept {s}/{entry}")
                elif ".old-" in entry:
                    final = os.path.join(sdir, entry.split(".old-")[0])
                    if os.path.isdir(final):
                        shutil.rmtree(full, ignore_errors=True)
                        actions.append(f"removed completed-swap {s}/{entry}")
                    else:
                        os.rename(full, final)
                        actions.append(f"rolled back {s}/{entry}")
        return actions

    def path(self, schema: str, table: str) -> str:
        return os.path.join(self.root, schema, table)

    def exists(self, schema: str, table: str) -> bool:
        return os.path.isdir(self.path(schema, table))

    def read(self, spark: SparkSession, schema: str, table: str) -> DataFrame | None:
        return (
            spark.read.parquet(self.path(schema, table))
            if self.exists(schema, table)
            else None
        )

    def write(
        self,
        df: DataFrame,
        schema: str,
        table: str,
        partition_by: list[str] | None = None,
    ) -> None:
        """Materialize to temp, then atomic-ish double-rename swap.

        ``partition_by`` writes a hive-partitioned layout (the 100 TB
        posture for bronze/silver: partition by ingest date so incremental
        runs rewrite only affected partitions and readers prune).
        """
        final = self.path(schema, table)
        tmp = f"{final}.tmp-{uuid.uuid4().hex[:8]}"
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(tmp)
        # Swap under a per-table exclusive lock: concurrent writers
        # serialize (last committer wins a CONSISTENT state; no interleaved
        # renames can tear the table). Single-host advisory locking — the
        # multi-host analog is a table format's optimistic commit protocol.
        with self._table_lock(schema, table):
            old = f"{final}.old-{uuid.uuid4().hex[:8]}"
            had_old = os.path.isdir(final)
            if had_old:
                os.rename(final, old)
            os.rename(tmp, final)
            if had_old:
                shutil.rmtree(old, ignore_errors=True)

    @contextmanager
    def _table_lock(self, schema: str, table: str):
        lock_path = os.path.join(self.root, schema, f".{table}.lock")
        with open(lock_path, "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            try:
                yield
            finally:
                fcntl.flock(lk, fcntl.LOCK_UN)


class BucketedWarehouse:
    """Catalog-backed warehouse for BUCKETED tables.

    Bucketing is the co-location lever for repeated large-table joins: two
    tables bucketed by the same key into the same bucket count join
    WITHOUT a shuffle on either side (SortMergeJoin reads buckets
    pairwise). At 100 TB this converts every fact-to-fact join on the
    bucket key from a full co-shuffle into a local merge per bucket.

    Spark exposes bucketing only through the catalog (``bucketBy`` +
    ``saveAsTable``), hence a separate class from the path-based
    ``Warehouse``; both coexist (facts bucketed, dims path-based).
    """

    def __init__(
        self,
        spark: SparkSession,
        database: str = "dps",
        location: str | None = None,
    ):
        self.spark = spark
        self.database = database
        loc = f" LOCATION '{location}'" if location else ""
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}{loc}")

    def write_bucketed(
        self,
        df: DataFrame,
        table: str,
        bucket_cols: list[str],
        n_buckets: int = 16,
        sort_cols: list[str] | None = None,
    ) -> None:
        fq = f"{self.database}.{table}"
        self.spark.sql(f"DROP TABLE IF EXISTS {fq}")
        # a dropped-in-a-previous-session managed table leaves its
        # directory behind (in-memory catalog) — clear it or saveAsTable
        # fails with LOCATION_ALREADY_EXISTS
        db_loc = (
            self.spark.sql(f"DESCRIBE DATABASE {self.database}")
            .filter("info_name = 'Location'")
            .collect()[0]["info_value"]
        )
        table_dir = db_loc.removeprefix("file:") + f"/{table}"
        if os.path.isdir(table_dir):
            shutil.rmtree(table_dir, ignore_errors=True)
        writer = df.write.bucketBy(n_buckets, *bucket_cols)
        if sort_cols:
            writer = writer.sortBy(*sort_cols)
        writer.mode("overwrite").format("parquet").saveAsTable(fq)

    def read(self, table: str) -> DataFrame:
        return self.spark.table(f"{self.database}.{table}")


def _batch_ts_lit(run_ts: datetime):
    """One clock per run (P7): PG's transaction-constant now() analog."""
    return F.lit(run_ts.replace(tzinfo=None))


def run_pipeline(
    spark: SparkSession,
    wh: Warehouse,
    bronze: dict[str, DataFrame],
    run_ts: datetime | None = None,
) -> None:
    """Full refresh: bronze upsert → staging → dims → facts.

    ``bronze`` maps entity → incoming bronze DataFrame (source_id,
    payload, loaded_at) from the ingestion client.
    """
    run_ts = run_ts or datetime.now(timezone.utc)
    ts = _batch_ts_lit(run_ts)

    # ---- raw (S4 last-writer-wins upsert)
    for entity, incoming in bronze.items():
        merged = L_raw.upsert_bronze(wh.read(spark, "raw", entity), incoming)
        wh.write(merged, "raw", entity)

    raw_ch = wh.read(spark, "raw", "character")
    raw_loc = wh.read(spark, "raw", "location")
    raw_ep = wh.read(spark, "raw", "episode")

    # ---- stg (S5 conditional upserts + link tables)
    if raw_ch is not None:
        wh.write(
            L_stg.build_stg_character(raw_ch, wh.read(spark, "stg", "character"), ts),
            "stg", "character",
        )
        wh.write(
            L_stg.build_episode_ch(
                raw_ch, ts, wh.read(spark, "stg", "episode_ch")
            ),
            "stg", "episode_ch",
        )
        wh.write(
            L_stg.build_location_ch(
                raw_ch, ts, wh.read(spark, "stg", "location_ch")
            ),
            "stg", "location_ch",
        )
    if raw_loc is not None:
        wh.write(
            L_stg.build_stg_location(raw_loc, wh.read(spark, "stg", "location"), ts),
            "stg", "location",
        )
        wh.write(
            L_stg.build_character_loc(
                raw_loc, ts, wh.read(spark, "stg", "character_loc")
            ),
            "stg", "character_loc",
        )
    if raw_ep is not None:
        wh.write(
            L_stg.build_stg_episode(raw_ep, wh.read(spark, "stg", "episode"), ts),
            "stg", "episode",
        )
        wh.write(
            L_stg.build_character_ep(
                raw_ep, ts, wh.read(spark, "stg", "character_ep")
            ),
            "stg", "character_ep",
        )

    stg_ch = wh.read(spark, "stg", "character")
    stg_loc = wh.read(spark, "stg", "location")
    stg_ep = wh.read(spark, "stg", "episode")

    # ---- dwh dims (SCD2)
    if stg_ch is not None:
        wh.write(
            L_dwh.build_dim_character(
                wh.read(spark, "dwh", "dim_character"), stg_ch, ts
            ),
            "dwh", "dim_character",
        )
    if stg_loc is not None:
        wh.write(
            L_dwh.build_dim_location(
                wh.read(spark, "dwh", "dim_location"), stg_loc, spark, ts
            ),
            "dwh", "dim_location",
        )
    if stg_ep is not None:
        wh.write(
            L_dwh.build_dim_episode(
                wh.read(spark, "dwh", "dim_episode"), stg_ep, ts
            ),
            "dwh", "dim_episode",
        )
    wh.write(L_dwh.dim_location_role(spark), "dwh", "dim_location_role")

    # ---- dwh facts (incremental anti-join)
    dim_ch = wh.read(spark, "dwh", "dim_character")
    dim_loc = wh.read(spark, "dwh", "dim_location")
    dim_ep = wh.read(spark, "dwh", "dim_episode")

    if all(x is not None for x in (stg_ch, stg_ep, dim_ch, dim_ep)):
        wh.write(
            L_dwh.build_fact_char_ep(
                wh.read(spark, "dwh", "fact_char_ep"),
                wh.read(spark, "stg", "episode_ch"),
                wh.read(spark, "stg", "character_ep"),
                stg_ch, stg_ep, dim_ch, dim_ep, ts,
            ),
            "dwh", "fact_char_ep",
        )
    if all(x is not None for x in (stg_ch, dim_ch, dim_loc)):
        wh.write(
            L_dwh.build_fact_char_loc(
                wh.read(spark, "dwh", "fact_char_loc"),
                wh.read(spark, "stg", "location_ch"),
                wh.read(spark, "stg", "character_loc"),
                stg_ch, dim_ch, dim_loc,
                L_dwh.dim_location_role(spark), ts,
            ),
            "dwh", "fact_char_loc",
        )

    # ---- datamart (the layer the reference declares but never populates)
    fact_ce = wh.read(spark, "dwh", "fact_char_ep")
    fact_cl = wh.read(spark, "dwh", "fact_char_loc")
    if dim_ch is not None:
        wh.write(L_dm.status_summary(dim_ch), "datamart", "status_summary")
        if fact_ce is not None:
            wh.write(
                L_dm.character_episode_counts(dim_ch, fact_ce),
                "datamart", "character_episode_counts",
            )
    if dim_loc is not None and fact_cl is not None:
        wh.write(
            L_dm.location_population(
                dim_loc, fact_cl, L_dwh.dim_location_role(spark)
            ),
            "datamart", "location_population",
        )
