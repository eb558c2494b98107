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
    # keep the last two snapshots: v2's carried-forward dim v1 SURVIVES
    # (referenced by a kept manifest) while the v1 fact dir drops
    acts = cat.prune(keep_manifests=2)
    assert cat.versions() == [2, 3]
    assert cat.read(spark, "dwh", "dim", m2).count() == cust.count()
    assert cat.read(spark, "dwh", "fact", m2).count() == 10
    assert any("fact.mv1" in a for a in acts)
    with _pt.raises(FileNotFoundError):
        cat.load_version(1)
