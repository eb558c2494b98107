"""Cross-table atomic publish (ops/manifest.py): the torn-snapshot
window between per-table swaps is closed by a manifest committed in one
rename. Pins: multi-table commit atomicity, the crash window (readers at
the committed manifest never see a partial publish), recover() sweeping
uncommitted versions, replay completion, pinned-manifest consistency
across a later commit, read-your-writes inside a transaction, txid
uniqueness, and run_pipeline(atomic_dwh=True) end-to-end equality with
the non-transactional run."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_platform_spark.ops.manifest import ManifestCatalog
from data_platform_spark.pipeline import Warehouse
from data_platform_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _dims_facts(spark):
    cust = load_table(spark, SF_SMOKE, "customer")
    orders = load_table(spark, SF_SMOKE, "orders")
    return cust, orders


def test_publish_commits_all_tables_atomically(spark, tmp_path):
    cust, orders = _dims_facts(spark)
    cat = ManifestCatalog(Warehouse(str(tmp_path / "wh")))
    assert cat.read(spark, "dwh", "dim") is None
    txid = cat.publish({("dwh", "dim"): cust, ("dwh", "fact"): orders})
    m = cat.load()
    assert m["id"] == txid
    assert cat.read(spark, "dwh", "dim", m).count() == cust.count()
    assert cat.read(spark, "dwh", "fact", m).count() == orders.count()


def test_crash_between_tables_keeps_reader_consistent(spark, tmp_path):
    """The VERDICT r14 item-2 scenario: crash after the dim staged but
    before the fact (and before the commit) — a reader at the committed
    manifest sees the consistent PRE-crash pair; recovery sweeps the
    staged dir; a full re-publish completes."""
    cust, orders = _dims_facts(spark)
    cat = ManifestCatalog(Warehouse(str(tmp_path / "wh")))
    cat.publish({("dwh", "dim"): cust, ("dwh", "fact"): orders})
    pinned = cat.load()
    dim_v1_rows = cat.read(spark, "dwh", "dim", pinned).count()

    mutated = cust.withColumn("c_acctbal", F.col("c_acctbal") + 100.0)
    bigger = orders.limit(50).unionByName(orders.limit(50))
    with pytest.raises(RuntimeError, match="injected crash"):
        cat.publish(
            {("dwh", "dim"): mutated, ("dwh", "fact"): bigger},
            crash_after=1,
        )
    # committed manifest unchanged: the reader still sees tx1's pair
    m = cat.load()
    assert m == pinned
    assert cat.read(spark, "dwh", "dim", m).count() == dim_v1_rows
    # the staged-but-uncommitted dim version exists on disk...
    staged = [
        e for e in os.listdir(cat.wh.root + "/dwh") if ".mv" in e
    ]
    assert any(e.startswith("dim.mv2") for e in staged)
    # ...and recovery drops exactly the uncommitted one
    actions = cat.recover()
    assert any("uncommitted" in a for a in actions)
    assert not any(
        e.startswith("dim.mv2")
        for e in os.listdir(cat.wh.root + "/dwh")
    )
    # replay completes the publish; the reader now sees tx2's pair —
    # note the txid is FRESH (ids are burned, never reused)
    txid = cat.publish({("dwh", "dim"): mutated, ("dwh", "fact"): bigger})
    assert txid > 2
    m2 = cat.load()
    assert cat.read(spark, "dwh", "fact", m2).count() == 100


def test_pinned_manifest_survives_later_commit(spark, tmp_path):
    """A reader that pinned manifest N keeps reading N's versions even
    after N+1 commits — the multi-table snapshot-isolation property."""
    cust, orders = _dims_facts(spark)
    cat = ManifestCatalog(Warehouse(str(tmp_path / "wh")))
    cat.publish({("dwh", "dim"): cust, ("dwh", "fact"): orders})
    pinned = cat.load()
    cat.publish(
        {("dwh", "dim"): cust.limit(3), ("dwh", "fact"): orders.limit(7)}
    )
    assert cat.read(spark, "dwh", "dim", pinned).count() == cust.count()
    assert cat.read(spark, "dwh", "fact", pinned).count() == orders.count()
    live = cat.load()
    assert cat.read(spark, "dwh", "dim", live).count() == 3
    assert cat.read(spark, "dwh", "fact", live).count() == 7
    # prune to the newest archived manifest: v1's dirs drop
    cat.prune(keep_manifests=1)
    assert cat.read(spark, "dwh", "dim", live).count() == 3
    leftover = [e for e in os.listdir(cat.wh.root + "/dwh") if ".mv1" in e]
    assert not leftover


def test_transaction_read_your_writes_and_carry_forward(spark, tmp_path):
    cust, orders = _dims_facts(spark)
    cat = ManifestCatalog(Warehouse(str(tmp_path / "wh")))
    cat.publish({("dwh", "other"): cust.limit(5)})
    tx = cat.transaction()
    tx.write(cust, "dwh", "dim")
    # read-your-writes: the staged dim is visible INSIDE the tx...
    assert tx.read(spark, "dwh", "dim").count() == cust.count()
    # ...and invisible outside until commit
    assert cat.read(spark, "dwh", "dim") is None
    # untouched tables resolve through the committed manifest
    assert tx.read(spark, "dwh", "other").count() == 5
    tx.commit()
    m = cat.load()
    # carry-forward: the commit kept the untouched table's pointer
    assert cat.read(spark, "dwh", "other", m).count() == 5
    assert cat.read(spark, "dwh", "dim", m).count() == cust.count()


def test_txids_unique_across_concurrent_transactions(tmp_path):
    cat = ManifestCatalog(Warehouse(str(tmp_path / "wh")))
    t1 = cat.transaction()
    t2 = cat.transaction()  # allocated while t1 is still open
    assert t1.txid != t2.txid
    # aborting t1 burns its id: the next allocation moves past both
    t1.abort()
    t3 = cat.transaction()
    assert t3.txid > max(t1.txid, t2.txid)


def test_run_pipeline_atomic_dwh_equals_plain(spark, tmp_path):
    """run_pipeline(atomic_dwh=True) publishes the same dwh/datamart
    content as the per-table-swap run, readable through the manifest."""
    from datetime import datetime

    from data_platform_spark.pipeline import run_pipeline
    from tests.fixtures import base_universe
    from tests.test_pipeline import _bronze_all  # reuse the fixture builder

    ts = datetime(2024, 1, 1, 12, 0, 0)
    wh_a = Warehouse(str(tmp_path / "a"))
    run_pipeline(spark, wh_a, _bronze_all(spark, base_universe(), ts), ts)
    wh_b = Warehouse(str(tmp_path / "b"))
    run_pipeline(
        spark, wh_b, _bronze_all(spark, base_universe(), ts), ts,
        atomic_dwh=True,
    )
    cat = ManifestCatalog(wh_b)
    m = cat.load()
    assert m["id"] >= 1
    for schema, table in (
        ("dwh", "dim_character"),
        ("dwh", "fact_char_ep"),
        ("datamart", "status_summary"),
    ):
        a = wh_a.read(spark, schema, table)
        b = cat.read(spark, schema, table, m)
        cols = sorted(a.columns)
        assert sorted(b.columns) == cols
        av, bv = a.select(*cols), b.select(*cols)
        assert av.exceptAll(bv).count() == 0
        assert bv.exceptAll(av).count() == 0
        # the live dwh dir was never swapped by the transactional run
        assert wh_b.read(spark, schema, table) is None


def test_commit_returns_committed_id_out_of_order(spark, tmp_path):
    """ADVICE r15: when a lower-txid transaction commits AFTER a
    higher-txid sibling, the committed manifest id (max(current+1, txid))
    diverges from the staging txid — commit()/publish() must return the
    id that actually names an archived manifest."""
    cust, orders = _dims_facts(spark)
    cat = ManifestCatalog(Warehouse(str(tmp_path / "wh")))
    t1 = cat.transaction()  # txid 1
    t2 = cat.transaction()  # txid 2
    t2.write(orders, "dwh", "fact")
    assert t2.commit() == 2
    t1.write(cust, "dwh", "dim")
    committed = t1.commit()
    assert committed == 3 and committed != t1.txid
    m = cat.load_version(committed)  # resolvable: it IS the archived id
    assert m == cat.load()
    assert cat.read(spark, "dwh", "dim", m).count() == cust.count()


def test_recover_drops_stale_archive_above_committed(spark, tmp_path):
    """ADVICE r15: a crash inside _commit between archiving MANIFEST.v<id>
    and flipping the pointer leaves a stale archive; the replayed publish
    burns a fresh txid and commits HIGHER, so the stale file would
    otherwise advertise a snapshot whose version dirs recover() just
    swept. recover() must drop archives above the committed pointer."""
    import json

    cust, _orders = _dims_facts(spark)
    cat = ManifestCatalog(Warehouse(str(tmp_path / "wh")))
    cat.publish({("dwh", "dim"): cust})
    # simulate the crash window: archive written, pointer NOT flipped
    with open(os.path.join(cat.dir, "MANIFEST.v7"), "w", encoding="utf-8") as f:
        json.dump({"id": 7, "tables": {"dwh/dim": 7}}, f)
    assert cat.versions() == [1, 7]
    actions = cat.recover()
    assert any("MANIFEST.v7" in a for a in actions)
    assert cat.versions() == [1]
    # every surviving archive resolves
    m = cat.load_version(1)
    assert cat.read(spark, "dwh", "dim", m).count() == cust.count()


def test_plain_run_refused_on_manifest_committed_warehouse(spark, tmp_path):
    """ADVICE r15 (medium): an atomic_dwh run publishes dwh/datamart only
    into manifest version dirs — a later plain run would read None via
    Warehouse.read, rebuild the SCD2 dims from scratch, and fork the
    warehouse. run_pipeline(atomic_dwh=False) must refuse instead."""
    from datetime import datetime

    from data_platform_spark.pipeline import run_pipeline
    from tests.fixtures import base_universe
    from tests.test_pipeline import _bronze_all

    ts = datetime(2024, 1, 1, 12, 0, 0)
    wh = Warehouse(str(tmp_path / "wh"))
    run_pipeline(
        spark, wh, _bronze_all(spark, base_universe(), ts), ts,
        atomic_dwh=True,
    )
    with pytest.raises(ValueError, match="manifest-committed"):
        run_pipeline(spark, wh, _bronze_all(spark, base_universe(), ts), ts)
    # the atomic re-run still works (and advances the manifest)
    before = ManifestCatalog(wh).load()["id"]
    run_pipeline(
        spark, wh, _bronze_all(spark, base_universe(), ts), ts,
        atomic_dwh=True,
    )
    assert ManifestCatalog(wh).load()["id"] > before


def _jv_kw():
    return dict(
        fact_on="o_custkey",
        dim_on="c_custkey",
        fact_key="o_orderkey",
        dim_payload=["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
        partition_col="o_month",
    )


def _orders_months(spark):
    from data_platform_spark.sources.tables import load_table

    return load_table(spark, SF_SMOKE, "orders").withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    )


def test_manifest_join_view_epoch_atomic_crash_and_replay(spark, tmp_path):
    """VERDICT r15 item 3: a (view, orphans) maintenance epoch commits
    BOTH ledgers through one manifest rename. Crash injected between
    the two ledger stages: a pinned reader still sees the consistent
    pre-epoch pair (never new-view + old-orphans); recover sweeps the
    staged dirs; the replayed epoch completes; and a replay of a
    COMMITTED epoch is a no-op via the transaction mark (committed
    atomically with the data — no marker crash window)."""
    from data_platform_spark.ops.join_view import manifest_join_view_epoch
    from data_platform_spark.sources.tables import load_table

    cat = ManifestCatalog(Warehouse(str(tmp_path / "wh")))
    orders = _orders_months(spark)
    cust = load_table(spark, SF_SMOKE, "customer")
    dim0 = cust.filter(F.pmod("c_custkey", F.lit(5)) != 0)
    kw = _jv_kw()
    b0 = orders.filter(F.pmod("o_orderkey", F.lit(3)) == 0)
    b1 = orders.filter(F.pmod("o_orderkey", F.lit(3)) == 1)

    mid0 = manifest_join_view_epoch(
        spark, cat, "dwh", "oc", b0, dim0, epoch_id=0, **kw
    )
    m0 = cat.load()
    assert m0["id"] == mid0
    # both ledgers committed AT the same manifest id; view ∪ orphans
    # partitions the batch facts
    view0 = cat.read(spark, "dwh", "oc", m0)
    orph0 = cat.read(spark, "dwh", "oc__orphans", m0)
    n_b0 = b0.count()
    assert view0.count() + orph0.count() == n_b0
    assert orph0.count() > 0  # the %5==0 customers' orders parked
    assert view0.join(orph0, "o_orderkey", "left_semi").count() == 0

    # epoch 1 CRASHES between the view stage and the orphans stage
    with pytest.raises(RuntimeError, match="injected crash"):
        manifest_join_view_epoch(
            spark, cat, "dwh", "oc", b1, dim0, epoch_id=1,
            crash_between_ledgers=True, **kw,
        )
    # pinned reader: committed manifest unchanged, pair still consistent
    m = cat.load()
    assert m == m0
    assert cat.read(spark, "dwh", "oc", m).count() == view0.count()
    assert cat.read(spark, "dwh", "oc__orphans", m).count() == orph0.count()
    assert cat.mark("jv--dwh/oc", m) == 0

    # recover + replay completes the epoch atomically
    cat.recover()
    mid1 = manifest_join_view_epoch(
        spark, cat, "dwh", "oc", b1, dim0, epoch_id=1, **kw
    )
    m1 = cat.load()
    assert m1["id"] == mid1 and cat.mark("jv--dwh/oc", m1) == 1
    assert (
        cat.read(spark, "dwh", "oc", m1).count()
        + cat.read(spark, "dwh", "oc__orphans", m1).count()
        == n_b0 + b1.count()
    )
    # replay of the COMMITTED epoch: mark short-circuits, nothing moves
    assert (
        manifest_join_view_epoch(
            spark, cat, "dwh", "oc", b1, dim0, epoch_id=1, **kw
        )
        is None
    )
    assert cat.load() == m1
    # the pre-crash pinned manifest still resolves (snapshot isolation)
    assert cat.read(spark, "dwh", "oc", m0).count() == view0.count()


def test_manifest_join_view_matches_per_table_ledgers(spark, tmp_path):
    """The manifest-committed epochs produce exactly the per-table
    sink's ledgers (same delta rules, different commit protocol), and
    unchanged partitions are HARD-LINKED between consecutive versions
    (file reuse — staging cost is O(changed partitions), not
    O(table))."""
    import os

    from data_platform_spark.ops.join_view import (
        incremental_join_view,
        manifest_join_view_epoch,
    )
    from data_platform_spark.sources.tables import load_table

    orders = _orders_months(spark)
    cust = load_table(spark, SF_SMOKE, "customer")
    dim0 = cust.filter(F.pmod("c_custkey", F.lit(5)) != 0)
    kw = _jv_kw()
    batches = [
        orders.filter(F.pmod("o_orderkey", F.lit(3)) == i) for i in range(2)
    ]

    wh_a = Warehouse(str(tmp_path / "a"))
    for i, b in enumerate(batches):
        incremental_join_view(
            spark, wh_a, "dwh", "oc", b, dim0, batch_id=f"b{i}", **kw
        )
    cat = ManifestCatalog(Warehouse(str(tmp_path / "b")))
    for i, b in enumerate(batches):
        manifest_join_view_epoch(
            spark, cat, "dwh", "oc", b, dim0, epoch_id=i, **kw
        )
    m = cat.load()
    for t in ("oc", "oc__orphans"):
        a = wh_a.read(spark, "dwh", t)
        b = cat.read(spark, "dwh", t, m)
        cols = sorted(a.columns)
        assert sorted(b.columns) == cols
        av, bv = a.select(*cols), b.select(*cols)
        assert av.exceptAll(bv).count() == 0
        assert bv.exceptAll(av).count() == 0

    # file reuse: a third epoch touching ONE month must hard-link every
    # untouched partition of the previous view version (same inodes)
    one_month = orders.filter(F.col("o_month") == "1995-01").limit(20)
    manifest_join_view_epoch(
        spark, cat, "dwh", "oc", one_month, dim0, epoch_id=2, **kw
    )
    m2 = cat.load()
    v_prev = cat._version_path("dwh", "oc", m["tables"]["dwh/oc"])
    v_new = cat._version_path("dwh", "oc", m2["tables"]["dwh/oc"])
    shared = 0
    for part in os.listdir(v_prev):
        if not part.startswith("o_month=") or part == "o_month=1995-01":
            continue
        for f in os.listdir(os.path.join(v_prev, part)):
            if f.endswith(".parquet"):
                a_ino = os.stat(os.path.join(v_prev, part, f)).st_ino
                b_path = os.path.join(v_new, part, f)
                assert os.path.isfile(b_path), f"missing linked {part}/{f}"
                assert os.stat(b_path).st_ino == a_ino
                shared += 1
    assert shared > 0


def test_manifest_join_view_dim_epoch_promotes_atomically(spark, tmp_path):
    """The dim-upsert epoch: a late dimension batch promotes its
    orphans into the view and evicts them from the ledger in ONE
    manifest commit — crash between the two ledger stages leaves a
    pinned reader on the consistent pre-epoch pair; the replayed epoch
    completes; results equal the per-table dim leg; a committed
    epoch's replay is a mark no-op."""
    from data_platform_spark.ops.join_view import (
        incremental_join_view,
        join_view_dim_upsert_persisted,
        manifest_join_view_dim_epoch,
        manifest_join_view_epoch,
    )
    from data_platform_spark.sources.tables import load_table

    orders = _orders_months(spark)
    cust = load_table(spark, SF_SMOKE, "customer")
    dim0 = cust.filter(F.pmod("c_custkey", F.lit(5)) != 0)
    late = cust.filter(F.pmod("c_custkey", F.lit(5)) == 0)
    kw = _jv_kw()
    b0 = orders.filter(F.pmod("o_orderkey", F.lit(2)) == 0)

    # per-table reference
    wh_a = Warehouse(str(tmp_path / "a"))
    incremental_join_view(
        spark, wh_a, "dwh", "oc", b0, dim0, batch_id="b0", **kw
    )
    join_view_dim_upsert_persisted(
        spark, wh_a, "dwh", "oc", late, batch_id="d0", **kw
    )

    cat = ManifestCatalog(Warehouse(str(tmp_path / "b")))
    manifest_join_view_epoch(
        spark, cat, "dwh", "oc", b0, dim0, epoch_id=0, **kw
    )
    m_pre = cat.load()
    n_view_pre = cat.read(spark, "dwh", "oc", m_pre).count()
    n_orph_pre = cat.read(spark, "dwh", "oc__orphans", m_pre).count()
    assert n_orph_pre > 0

    # crash between the view stage and the orphans stage: pinned reader
    # keeps the consistent pre-epoch pair (never promoted-into-view
    # rows still sitting in the orphan ledger)
    with pytest.raises(RuntimeError, match="injected crash"):
        manifest_join_view_dim_epoch(
            spark, cat, "dwh", "oc", late, epoch_id=0,
            crash_between_ledgers=True, **kw,
        )
    assert cat.load() == m_pre
    cat.recover()
    mid = manifest_join_view_dim_epoch(
        spark, cat, "dwh", "oc", late, epoch_id=0, **kw
    )
    m = cat.load()
    assert m["id"] == mid and cat.mark("jvdim--dwh/oc", m) == 0
    # every orphan promoted (full dim now) — ledger emptied, view grew
    assert cat.read(spark, "dwh", "oc", m).count() == n_view_pre + n_orph_pre
    orph_after = cat.read(spark, "dwh", "oc__orphans", m)
    assert orph_after is None or orph_after.count() == 0
    # equality with the per-table dim leg
    a = wh_a.read(spark, "dwh", "oc")
    b = cat.read(spark, "dwh", "oc", m)
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    assert a.select(*cols).exceptAll(b.select(*cols)).count() == 0
    assert b.select(*cols).exceptAll(a.select(*cols)).count() == 0
    # committed-epoch replay: mark no-op
    assert (
        manifest_join_view_dim_epoch(
            spark, cat, "dwh", "oc", late, epoch_id=0, **kw
        )
        is None
    )
    assert cat.load() == m


def _publish_worker(root: str, n_publishes: int, out_q):
    """Cross-process contender: stage version dirs with pyarrow (no Spark
    in the subprocess — the contended machinery is txid allocation and
    the manifest commit, both under the catalog flock; the parquet write
    itself has no locking concern) and commit through the real
    ManifestTransaction path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    cat = ManifestCatalog(Warehouse(root))
    ids = []
    for _ in range(n_publishes):
        tx = cat.transaction()
        d = cat._version_path("dwh", "t", tx.txid)
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            pa.table({"txid": [tx.txid]}), os.path.join(d, "part-0.parquet")
        )
        tx.staged["dwh/t"] = tx.txid
        ids.append((tx.txid, tx.commit()))
    out_q.put(ids)


def test_concurrent_publishers_cross_process(spark, tmp_path):
    """VERDICT r15 item 4: N processes publishing concurrently — every
    commit lands, staging txids are unique, committed manifest ids are
    strictly increasing with no gaps, and every archived manifest
    resolves to a readable version dir."""
    import multiprocessing as mp

    root = str(tmp_path / "wh")
    Warehouse(root)  # create the root
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    n_procs, n_each = 4, 3
    procs = [
        ctx.Process(target=_publish_worker, args=(root, n_each, q))
        for _ in range(n_procs)
    ]
    for p in procs:
        p.start()
    results = [q.get(timeout=120) for _ in procs]
    for p in procs:
        p.join(timeout=120)
        assert p.exitcode == 0
    pairs = [pair for r in results for pair in r]
    txids = [t for t, _c in pairs]
    committed = [c for _t, c in pairs]
    n = n_procs * n_each
    assert len(set(txids)) == n  # no two publishes staged the same id
    # committed ids are distinct (strictly increasing per commit — not
    # necessarily dense: a high-txid early commit shifts later ids up)
    assert len(set(committed)) == n
    cat = ManifestCatalog(Warehouse(root))
    assert cat.versions() == sorted(committed)  # every commit archived
    assert cat.load()["id"] == max(committed)
    for mid in cat.versions():
        m = cat.load_version(mid)
        df = cat.read(spark, "dwh", "t", m)
        assert df is not None and df.count() == 1


def test_manifest_time_travel_and_prune_alignment(spark, tmp_path):
    """Every commit archives its manifest: load_version pins the exact
    cross-table state of any past commit (multi-table time travel), and
    prune(keep_manifests=k) keeps precisely the dirs those k snapshots
    reference — a kept manifest never dangles."""
    import pytest as _pt

    cust, orders = _dims_facts(spark)
    cat = ManifestCatalog(Warehouse(str(tmp_path / "wh")))
    cat.publish({("dwh", "dim"): cust, ("dwh", "fact"): orders})
    cat.publish({("dwh", "fact"): orders.limit(10)})  # dim carried forward
    cat.publish({("dwh", "dim"): cust.limit(3), ("dwh", "fact"): orders.limit(7)})
    assert cat.versions() == [1, 2, 3]
    m2 = cat.load_version(2)
    # snapshot 2: fact replaced, dim still v1 (carry-forward)
    assert cat.read(spark, "dwh", "fact", m2).count() == 10
    assert cat.read(spark, "dwh", "dim", m2).count() == cust.count()
    # dry-run first (VERDICT r15 item 6): reports the deletions WITHOUT
    # performing them — state fully intact afterwards
    preview = cat.prune(keep_manifests=2, dry_run=True)
    assert cat.versions() == [1, 2, 3]
    assert cat.read(spark, "dwh", "fact", cat.load_version(1)).count() > 10
    # keep the last two snapshots: v2's carried-forward dim v1 SURVIVES
    # (referenced by a kept manifest) while the v1 fact dir drops
    acts = cat.prune(keep_manifests=2)
    # the real run performed exactly the previewed deletions
    assert sorted(acts) == sorted(preview)
    assert cat.versions() == [2, 3]
    assert cat.read(spark, "dwh", "dim", m2).count() == cust.count()
    assert cat.read(spark, "dwh", "fact", m2).count() == 10
    assert any("fact.mv1" in a for a in acts)
    with _pt.raises(FileNotFoundError):
        cat.load_version(1)
