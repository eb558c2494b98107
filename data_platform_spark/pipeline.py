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
import json
import math
import os
import shutil
import threading
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

    # process-wide reentrancy registry for _table_lock: lock file path ->
    # [owner thread ident, flock'd file object, hold count]. Class-level
    # (not per-instance) because two Warehouse objects over the same root
    # must see each other's holds.
    _held_locks: dict[str, list] = {}
    _held_locks_guard = threading.Lock()

    def __init__(self, root: str, retain_versions: int = 0):
        self.root = root
        # snapshot retention: when > 0, every atomic swap KEEPS the
        # replaced table directory as <table>.v<N> (monotonic), pruned to
        # the newest ``retain_versions`` — time-travel for training-data
        # reproducibility ("which corpus version trained run X"): the
        # file-level analog of a table format's snapshot log.
        self.retain_versions = retain_versions
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
        # Merge journals FIRST: an interrupted partition-pruned merge rolls
        # back to the pre-merge state before the generic sweeps run (the
        # sweeps would otherwise destroy the .old- dirs the rollback needs).
        for s in self.SCHEMAS:
            sdir = os.path.join(self.root, s)
            for entry in sorted(os.listdir(sdir)):
                if entry.startswith(".merge-journal-"):
                    actions.extend(
                        self._rollback_merge(os.path.join(sdir, entry), s)
                    )
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
                    table = entry.split(".old-")[0]
                    final = os.path.join(sdir, table)
                    if os.path.isdir(final):
                        if self.retain_versions > 0:
                            # completed swap whose retention promotion was
                            # interrupted: the .old-* IS the snapshot that
                            # retention promised to keep — promote it to the
                            # next .vN instead of dropping a version from
                            # the history.
                            nxt = max(self.versions(s, table), default=0) + 1
                            os.rename(full, f"{final}.v{nxt}")
                            self._prune_versions(s, table)
                            actions.append(
                                f"promoted completed-swap {s}/{entry} to v{nxt}"
                            )
                        else:
                            shutil.rmtree(full, ignore_errors=True)
                            actions.append(f"removed completed-swap {s}/{entry}")
                    else:
                        os.rename(full, final)
                        actions.append(f"rolled back {s}/{entry}")
                else:
                    # partition-level leftovers inside a table dir (a merge
                    # that crashed after its journal was removed but before
                    # old-partition cleanup): final partition exists -> GC.
                    for sub in sorted(os.listdir(full)):
                        if ".old-" not in sub:
                            continue
                        subfull = os.path.join(full, sub)
                        part = os.path.join(full, sub.split(".old-")[0])
                        if os.path.isdir(part):
                            shutil.rmtree(subfull, ignore_errors=True)
                            actions.append(f"removed merged-old {s}/{entry}/{sub}")
                        else:
                            os.rename(subfull, part)
                            actions.append(f"rolled back {s}/{entry}/{sub}")
        return actions

    def _rollback_merge(self, journal_path: str, schema: str) -> list[str]:
        """Undo every partition swap recorded in an interrupted merge.

        While the journal exists, no .old- partition dir has been deleted
        (cleanup is strictly after journal removal), so rollback to the
        exact pre-merge state is always possible: restore each recorded
        old dir, remove any swapped-in or newly-added partition dir, then
        drop the staging dir and the journal.
        """
        actions: list[str] = []
        with open(journal_path) as f:
            journal = json.load(f)
        table_dir = os.path.join(self.root, schema, journal["table"])
        for swap in journal["swaps"]:
            part = os.path.join(table_dir, swap["part"])
            if swap["had_old"]:
                old = os.path.join(table_dir, swap["old"])
                if os.path.isdir(old):
                    shutil.rmtree(part, ignore_errors=True)
                    os.rename(old, part)
                    actions.append(f"merge-rollback restored {swap['part']}")
            else:
                if os.path.isdir(part):
                    shutil.rmtree(part, ignore_errors=True)
                    actions.append(f"merge-rollback removed new {swap['part']}")
        shutil.rmtree(journal["tmp"], ignore_errors=True)
        os.remove(journal_path)
        actions.append(f"merge-rollback {schema}/{journal['table']}")
        return actions

    def path(self, schema: str, table: str) -> str:
        return os.path.join(self.root, schema, table)

    def exists(self, schema: str, table: str) -> bool:
        return os.path.isdir(self.path(schema, table))

    def read(self, spark: SparkSession, schema: str, table: str) -> DataFrame | None:
        # mergeSchema: after an allow_new_columns merge, only rewritten
        # partitions carry the new column; Spark's default single-footer
        # schema sample would make the column appear/vanish depending on
        # which file it probes. Footer union is cheap at this metadata
        # scale (a table format holds the schema centrally at 100 TB).
        return (
            spark.read.option("mergeSchema", "true").parquet(
                self.path(schema, table)
            )
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
                if self.retain_versions > 0:
                    nxt = max(self.versions(schema, table), default=0) + 1
                    os.rename(old, f"{final}.v{nxt}")
                    self._prune_versions(schema, table)
                else:
                    shutil.rmtree(old, ignore_errors=True)

    def versions(self, schema: str, table: str) -> list[int]:
        """Retained snapshot version numbers, oldest first."""
        d = os.path.join(self.root, schema)
        prefix = f"{table}.v"
        out = []
        for entry in os.listdir(d) if os.path.isdir(d) else []:
            if entry.startswith(prefix) and entry[len(prefix):].isdigit():
                out.append(int(entry[len(prefix):]))
        return sorted(out)

    def read_version(
        self, spark: SparkSession, schema: str, table: str, version: int
    ) -> DataFrame:
        """Time-travel read of a retained snapshot."""
        vpath = f"{self.path(schema, table)}.v{version}"
        if not os.path.isdir(vpath):
            raise FileNotFoundError(
                f"no retained version {version} for {schema}.{table} "
                f"(have {self.versions(schema, table)})"
            )
        return spark.read.option("mergeSchema", "true").parquet(vpath)

    def _prune_versions(self, schema: str, table: str) -> None:
        vs = self.versions(schema, table)
        for v in vs[: max(0, len(vs) - self.retain_versions)]:
            shutil.rmtree(
                f"{self.path(schema, table)}.v{v}", ignore_errors=True
            )

    def merge(
        self,
        spark: SparkSession,
        schema: str,
        table: str,
        updates: DataFrame,
        keys: list[str],
        partition_col: str,
        delete_col: str | None = None,
        order_col: str | None = None,
        allow_new_columns: bool = False,
    ) -> list[str]:
        """Partition-pruned copy-on-write MERGE (Delta/Iceberg MERGE INTO
        analog at the file level — the upsert path for S4/S5/J7-class
        maintenance at 100 TB).

        ``allow_new_columns`` is the schema-evolution mode (Delta's
        mergeSchema analog): batch columns absent from the table are ADDED
        (existing rows get NULL) and table columns absent from the batch
        are NULL-filled — only for the rewritten partitions, the same
        scope a table format's metadata update covers logically. Default
        off: the strict mode projects the batch onto the table's columns,
        so accidental producer drift cannot silently widen the schema.

        Semantics: rows in ``updates`` replace existing rows with the same
        ``keys``; unmatched keys insert; rows with ``delete_col`` true
        delete their key. Only partitions PRESENT in ``updates`` are read
        (partition-pruned scan) or rewritten — a merge touching 1 of 10k
        date partitions reads and writes 1/10k of the table, vs the
        full-table read+swap of ``write``.

        Requires a hive-partitioned table (``write(partition_by=[...])``)
        and a STABLE partition column per key (a key never moves between
        partitions — the standard contract for date-partitioned upserts;
        Delta's pruned MERGE makes the same assumption via its ON
        predicate).

        Commit protocol: stage all rewritten partitions to a temp dir,
        journal the planned swaps, swap partition dirs one by one, remove
        the journal, then GC old dirs. A crash anywhere before journal
        removal rolls back to the exact pre-merge state on the next
        startup (``recover``) — the merge is atomic-or-nothing at table
        granularity even though individual renames are per-partition.

        With ``order_col`` the resolution is newest-wins instead of
        batch-always-wins: among all rows for a key (existing AND batch),
        the highest order_col survives, ties broken deterministically over
        the remaining columns — the replay-safe mode for at-least-once
        streaming sinks (re-merging an old batch cannot regress a newer
        row). Mutually exclusive with ``delete_col``.

        Returns the list of partition dir names rewritten (observability).
        """
        if delete_col and order_col:
            raise ValueError("delete_col and order_col are mutually exclusive")
        final = self.path(schema, table)
        live = updates.filter(~F.col(delete_col)).drop(delete_col) if delete_col else updates
        if not os.path.isdir(final):
            if order_col:
                live = _newest_per_key(live, keys, order_col)
            self.write(live, schema, table, partition_by=[partition_col])
            return [f"first-load {schema}/{table}"]

        # The ENTIRE read-derive-stage-swap sequence holds the table
        # lock (reentrant — compact_join_view's outer hold composes).
        # Staging outside the lock would let a concurrent rewrite of the
        # same table (another merge, or compact_join_view's
        # expire_orphans_below retention pass) land between our read and
        # our swap: the swap would then reinstall partition images
        # derived from the pre-rewrite table — a lost update, and for
        # expiry a resurrection of dropped rows (ADVICE r15). Merges to
        # one table serialize; merges to different tables still run
        # concurrently.
        with self._table_lock(schema, table):
            # One collect of the DISTINCT partition values in the batch —
            # bounded by the partition count (dates), never by row count.
            part_vals = [
                r[0] for r in updates.select(partition_col).distinct().collect()
            ]
            existing = spark.read.parquet(final).filter(
                F.col(partition_col).isin(part_vals)
            )
            # hive dir names round-trip through partition-type inference
            # (e.g. '2026-01-01' -> DATE); align the batch to the table's
            # read type so the union and the rewritten dir names stay
            # consistent
            part_type = existing.schema[partition_col].dataType
            live = live.withColumn(
                partition_col, F.col(partition_col).cast(part_type)
            )
            if allow_new_columns:
                aligned = live
            else:
                aligned = live.select(*existing.columns)
            if order_col:
                merged = _newest_per_key(
                    existing.unionByName(
                        aligned, allowMissingColumns=allow_new_columns
                    ),
                    keys,
                    order_col,
                )
            else:
                merged = existing.join(
                    updates.select(*keys).distinct(), keys, "left_anti"
                ).unionByName(aligned, allowMissingColumns=allow_new_columns)

            tmp = f"{final}.tmp-{uuid.uuid4().hex[:8]}"
            merged.write.mode("overwrite").partitionBy(partition_col).parquet(tmp)

            # Partition-dir names come from what Spark actually wrote
            # (exact hive escaping, no reimplementation). A partition
            # emptied by deletes appears in part_vals but not in tmp:
            # probe its dir name by writing just the partition values
            # through the same writer.
            written = {
                e for e in os.listdir(tmp)
                if e.startswith(f"{partition_col}=")
            }
            probe = f"{final}.tmp-probe-{uuid.uuid4().hex[:8]}"
            updates.select(partition_col).distinct().withColumn(
                "_one", F.lit(1)
            ).write.mode("overwrite").partitionBy(partition_col).parquet(probe)
            affected = {
                e for e in os.listdir(probe)
                if e.startswith(f"{partition_col}=")
            }
            shutil.rmtree(probe, ignore_errors=True)

            swaps = []
            for part in sorted(affected):
                dst = os.path.join(final, part)
                swaps.append(
                    {
                        "part": part,
                        "old": f"{part}.old-{uuid.uuid4().hex[:8]}",
                        "had_old": os.path.isdir(dst),
                        "in_tmp": part in written,
                    }
                )
            journal_path = os.path.join(
                self.root, schema, f".merge-journal-{uuid.uuid4().hex[:8]}"
            )
            with open(journal_path, "w") as f:
                json.dump({"table": table, "tmp": tmp, "swaps": swaps}, f)
                f.flush()
                os.fsync(f.fileno())
            for swap in swaps:
                dst = os.path.join(final, swap["part"])
                if swap["had_old"]:
                    os.rename(dst, os.path.join(final, swap["old"]))
                if swap["in_tmp"]:
                    os.rename(os.path.join(tmp, swap["part"]), dst)
            os.remove(journal_path)  # <- the commit point
            for swap in swaps:
                if swap["had_old"]:
                    shutil.rmtree(
                        os.path.join(final, swap["old"]), ignore_errors=True
                    )
            shutil.rmtree(tmp, ignore_errors=True)
        return sorted(affected)

    def compact(
        self,
        spark: SparkSession,
        schema: str,
        table: str,
        target_file_bytes: int = 128 << 20,
        partition_by: list[str] | None = None,
    ) -> tuple[int, int]:
        """Small-file compaction: rewrite the table into ~target-sized
        files (the OPTIMIZE of table formats).

        Incremental upserts and streaming sinks accrete small files; at
        100 TB scan cost becomes dominated by per-file open/footer
        overhead and task scheduling, not bytes. One pass: size the
        output file count from the current on-disk bytes, repartition,
        swap. Returns (files_before, files_after).
        """
        path = self.path(schema, table)
        files_before, bytes_total = 0, 0
        for dirpath, _dirnames, filenames in os.walk(path):
            for fn in filenames:
                if fn.endswith(".parquet"):
                    files_before += 1
                    bytes_total += os.path.getsize(os.path.join(dirpath, fn))
        n_files = max(1, math.ceil(bytes_total / target_file_bytes))
        df = spark.read.parquet(path)
        if partition_by:
            # cluster rows of each hive partition into the same tasks so
            # every partition dir ends up with few, full files
            df = df.repartition(n_files, *[F.col(c) for c in partition_by])
        else:
            df = df.repartition(n_files)
        self.write(df, schema, table, partition_by=partition_by)
        files_after = sum(
            1
            for dirpath, _d, filenames in os.walk(path)
            for fn in filenames
            if fn.endswith(".parquet")
        )
        return files_before, files_after

    @contextmanager
    def _table_lock(self, schema: str, table: str):
        """Per-table exclusive lock: flock(2) across processes, REENTRANT
        within the owning thread. Reentrancy lets a maintenance driver
        (e.g. ``compact_join_view``) hold the lock across a
        check-then-act sequence — journal scan, full-table read, swap —
        whose inner steps (``write``/``merge``) take the lock themselves;
        without it the inner flock on a fresh fd would deadlock against
        our own outer hold (Linux flock treats separate fds of one file
        as independent lockers even within a process). Other threads and
        processes still serialize on the flock."""
        lock_path = os.path.join(self.root, schema, f".{table}.lock")
        me = threading.get_ident()
        with Warehouse._held_locks_guard:
            held = Warehouse._held_locks.get(lock_path)
            reentered = held is not None and held[0] == me
            if reentered:
                held[2] += 1
        # the guard must NOT be held across the yield: the nested exit's
        # decrement re-acquires it (threading.Lock is not reentrant)
        if reentered:
            try:
                yield
            finally:
                with Warehouse._held_locks_guard:
                    held[2] -= 1
            return
        lk = open(lock_path, "w")
        try:
            fcntl.flock(lk, fcntl.LOCK_EX)
            with Warehouse._held_locks_guard:
                Warehouse._held_locks[lock_path] = [me, lk, 1]
            try:
                yield
            finally:
                with Warehouse._held_locks_guard:
                    del Warehouse._held_locks[lock_path]
                fcntl.flock(lk, fcntl.LOCK_UN)
        finally:
            lk.close()


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


def _newest_per_key(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """Highest order_col per key with a deterministic full-column
    tie-break (mirrors streaming/sink.py's dedup contract)."""
    from pyspark.sql.window import Window

    tie_break = [
        F.desc(c)
        for c in sorted(df.columns)
        if c != order_col and c not in keys
    ]
    w = Window.partitionBy(*keys).orderBy(F.desc(order_col), *tie_break)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _batch_ts_lit(run_ts: datetime):
    """One clock per run (P7): PG's transaction-constant now() analog."""
    return F.lit(run_ts.replace(tzinfo=None))


class _TxSink:
    """Warehouse-shaped adapter that routes run_pipeline's dwh/datamart
    I/O through one ManifestTransaction (ops/manifest.py).

    ``write`` stages an immutable version dir; ``read`` resolves
    staged-this-run first (facts join the dims written moments earlier),
    then the committed manifest, then the LIVE table dir — the migration
    path for a warehouse whose earlier runs predate the manifest: its
    live image is treated as the pre-manifest snapshot."""

    def __init__(self, wh: Warehouse, tx):
        self.wh = wh
        self.tx = tx

    def write(
        self,
        df: DataFrame,
        schema: str,
        table: str,
        partition_by: list[str] | None = None,
    ) -> None:
        self.tx.write(df, schema, table, partition_by=partition_by)

    def read(
        self, spark: SparkSession, schema: str, table: str
    ) -> DataFrame | None:
        df = self.tx.read(spark, schema, table)
        return df if df is not None else self.wh.read(spark, schema, table)


def run_pipeline(
    spark: SparkSession,
    wh: Warehouse,
    bronze: dict[str, DataFrame],
    run_ts: datetime | None = None,
    validate_fk: bool = True,
    atomic_dwh: bool = False,
) -> None:
    """Full refresh: bronze upsert → staging → dims → facts.

    ``bronze`` maps entity → incoming bronze DataFrame (source_id,
    payload, loaded_at) from the ingestion client.

    ``validate_fk`` enforces the reference's declared FK constraints
    (dags/configure.py:341-381) at fact-build time: each fact is checked
    against its dims BEFORE the write and the run raises FkViolation on
    any orphan — the engine-side analog of Postgres rejecting the
    transaction.
    """
    run_ts = run_ts or datetime.now(timezone.utc)
    ts = _batch_ts_lit(run_ts)

    # Cross-table atomic publish (SURVEY §3.3; the reference's unsolved
    # cross-DAG ordering): with ``atomic_dwh`` every dwh/datamart table
    # stages as an immutable manifest version and ONE manifest rename
    # publishes them all — a crash mid-run can never expose new-dim +
    # old-fact to a reader pinned at the committed manifest. Raw/stg
    # stay per-table swaps (idempotent upserts, re-runnable).
    if atomic_dwh:
        from data_platform_spark.ops.manifest import ManifestCatalog

        sink = _TxSink(wh, ManifestCatalog(wh).transaction())
    else:
        # Mode-mixing guard (ADVICE r15, medium): an atomic_dwh run
        # publishes dwh/datamart ONLY into manifest version dirs — the
        # live <table> dirs stay empty. A later plain run on the same
        # warehouse would read None via Warehouse.read, silently rebuild
        # the SCD2 dims from scratch, and fork the warehouse into two
        # divergent images. Once a committed manifest covers any
        # dwh/datamart table, the warehouse is manifest-committed for
        # those layers: refuse the plain run instead of forking.
        manifest_p = os.path.join(wh.root, "_manifest", "MANIFEST")
        if os.path.isfile(manifest_p):
            with open(manifest_p, encoding="utf-8") as f:
                committed = json.load(f).get("tables", {})
            if any(
                k.startswith(("dwh/", "datamart/")) for k in committed
            ):
                raise ValueError(
                    "warehouse is manifest-committed (a previous "
                    "run_pipeline(atomic_dwh=True) published dwh/datamart "
                    "through ops/manifest.py): re-run with atomic_dwh=True "
                    "— a plain run would ignore the committed snapshot and "
                    "fork the warehouse"
                )
        sink = wh

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
        sink.write(
            L_dwh.build_dim_character(
                sink.read(spark, "dwh", "dim_character"), stg_ch, ts
            ),
            "dwh", "dim_character",
        )
    if stg_loc is not None:
        sink.write(
            L_dwh.build_dim_location(
                sink.read(spark, "dwh", "dim_location"), stg_loc, spark, ts
            ),
            "dwh", "dim_location",
        )
    if stg_ep is not None:
        sink.write(
            L_dwh.build_dim_episode(
                sink.read(spark, "dwh", "dim_episode"), stg_ep, ts
            ),
            "dwh", "dim_episode",
        )
    sink.write(L_dwh.dim_location_role(spark), "dwh", "dim_location_role")

    # ---- dwh facts (incremental anti-join)
    dim_ch = sink.read(spark, "dwh", "dim_character")
    dim_loc = sink.read(spark, "dwh", "dim_location")
    dim_ep = sink.read(spark, "dwh", "dim_episode")

    from data_platform_spark.ops.integrity import FkSpec, require_fk

    if all(x is not None for x in (stg_ch, stg_ep, dim_ch, dim_ep)):
        fact_ce_df = L_dwh.build_fact_char_ep(
            sink.read(spark, "dwh", "fact_char_ep"),
            wh.read(spark, "stg", "episode_ch"),
            wh.read(spark, "stg", "character_ep"),
            stg_ch, stg_ep, dim_ch, dim_ep, ts,
        ).persist()
        if validate_fk:
            require_fk(
                [
                    FkSpec(fact_ce_df, "fact_char_ep", "character_sk",
                           dim_ch, "dim_character", "character_sk"),
                    FkSpec(fact_ce_df, "fact_char_ep", "episode_sk",
                           dim_ep, "dim_episode", "episode_sk"),
                ]
            )
        sink.write(fact_ce_df, "dwh", "fact_char_ep")
        fact_ce_df.unpersist()
    if all(x is not None for x in (stg_ch, dim_ch, dim_loc)):
        role = L_dwh.dim_location_role(spark)
        fact_cl_df = L_dwh.build_fact_char_loc(
            sink.read(spark, "dwh", "fact_char_loc"),
            wh.read(spark, "stg", "location_ch"),
            wh.read(spark, "stg", "character_loc"),
            stg_ch, dim_ch, dim_loc, role, ts,
        ).persist()
        if validate_fk:
            require_fk(
                [
                    FkSpec(fact_cl_df, "fact_char_loc", "character_sk",
                           dim_ch, "dim_character", "character_sk"),
                    FkSpec(fact_cl_df, "fact_char_loc", "location_sk",
                           dim_loc, "dim_location", "location_sk"),
                    FkSpec(fact_cl_df, "fact_char_loc", "role_id",
                           role, "dim_location_role", "role_id"),
                ]
            )
        sink.write(fact_cl_df, "dwh", "fact_char_loc")
        fact_cl_df.unpersist()

    # ---- datamart (the layer the reference declares but never populates)
    fact_ce = sink.read(spark, "dwh", "fact_char_ep")
    fact_cl = sink.read(spark, "dwh", "fact_char_loc")
    if dim_ch is not None:
        sink.write(L_dm.status_summary(dim_ch), "datamart", "status_summary")
        if fact_ce is not None:
            sink.write(
                L_dm.character_episode_counts(dim_ch, fact_ce),
                "datamart", "character_episode_counts",
            )
    if dim_loc is not None and fact_cl is not None:
        sink.write(
            L_dm.location_population(
                dim_loc, fact_cl, L_dwh.dim_location_role(spark)
            ),
            "datamart", "location_population",
        )

    if atomic_dwh:
        # one rename publishes every dwh/datamart table of this run;
        # a crash before this line leaves readers on the previous
        # manifest (recover() sweeps the staged dirs, a re-run replays)
        sink.tx.commit()
