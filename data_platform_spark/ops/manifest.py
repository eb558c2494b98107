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

_MV = ".mv"  # immutable version-dir infix: <table>.mv<txid>
_MANIFEST = "MANIFEST"


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
        any staged dir). Returns the committed txid."""
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

    def prune(self, keep_manifests: int = 1) -> list[str]:
        """Retention for committed history, aligned with the snapshot
        log: keep every version dir referenced by the newest
        ``keep_manifests`` archived manifests (the live pointer's
        snapshot is always among them); drop every other dir at or below
        the committed id, plus the expired archive files themselves —
        so ``load_version``/time travel works exactly as far back as
        retention promises, never a dangling table ref in a kept
        manifest. Never touches dirs newer than the committed manifest
        (that's ``recover``'s job)."""
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
                shutil.rmtree(full, ignore_errors=True)
                actions.append(f"pruned {schema}/{table}{_MV}{vid}")
        for mid in self.versions():
            if mid not in kept_ids:
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
        self.txid = cat._alloc_txid()

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

    def commit(self) -> int:
        """Single-rename commit of every staged table at once. The
        committed manifest id is STRICTLY increasing per commit — a
        transaction that commits after a higher-txid sibling takes
        ``current_id + 1`` instead of its own txid — so ``recover``'s
        newer-than-committed sweep can never drop a committed version
        and every archived ``MANIFEST.v<id>`` is a distinct snapshot."""
        with self._lock():
            current = self.cat.load()
            manifest = {
                "id": max(current["id"] + 1, self.txid),
                "tables": {**current["tables"], **self.staged},
            }
            self.cat._commit(manifest)
        return self.txid

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
