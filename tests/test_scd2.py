"""SCD2 semantics: first load, change → close+open, new key, idempotent
rerun, timestamp alignment, invariants (SURVEY.md §5.2.1/§5.2.4)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from data_platform_spark.ops import scd2_apply

TS1 = datetime(2026, 1, 1, 12, 0, 0)
TS2 = datetime(2026, 2, 1, 12, 0, 0)
INF = datetime(9999, 12, 31, 0, 0, 0)


def _stg(spark, rows):
    return spark.createDataFrame(rows, "bk int, attr string, extra string")


def _apply(dim, stg, ts):
    return scd2_apply(
        dim, stg,
        business_key="bk",
        tracked_cols=["attr"],
        carried_cols=["extra"],
        sk_col="sk",
        batch_ts=F.lit(ts),
    )


def test_first_load(spark):
    dim = _apply(None, _stg(spark, [(1, "a", "x"), (2, "b", "y")]), TS1)
    rows = {r["bk"]: r for r in dim.collect()}
    assert len(rows) == 2
    assert all(r["is_current"] for r in rows.values())
    assert all(r["valid_from"] == TS1 and r["valid_to"] == INF for r in rows.values())
    assert sorted(r["sk"] for r in rows.values()) == [1, 2]


def test_change_close_open_and_new_key(spark):
    d1 = _apply(None, _stg(spark, [(1, "a", "x"), (2, "b", "y")]), TS1)
    d2 = _apply(d1, _stg(spark, [(1, "A2", "x"), (2, "b", "y"), (3, "c", "z")]), TS2)
    rows = d2.collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["bk"], []).append(r)

    # bk=1 changed: one closed + one opened, timestamps aligned
    v1 = sorted(by_key[1], key=lambda r: r["valid_from"])
    assert len(v1) == 2
    closed, opened = v1
    assert not closed["is_current"] and closed["valid_to"] == TS2
    assert opened["is_current"] and opened["valid_from"] == TS2
    assert opened["valid_to"] == INF and opened["attr"] == "A2"
    assert closed["valid_to"] == opened["valid_from"]  # PG same-now() parity

    # bk=2 unchanged: single untouched current version
    assert len(by_key[2]) == 1 and by_key[2][0]["is_current"]
    assert by_key[2][0]["last_upd_at"] == TS1

    # bk=3 new: opened with fresh SK above previous max (batch opens
    # bk=1-v2 and bk=3, ordered by bk -> sks 3 and 4)
    assert len(by_key[3]) == 1 and by_key[3][0]["sk"] == 4
    assert opened["sk"] == 3


def test_rerun_idempotent(spark):
    snap = _stg(spark, [(1, "a", "x"), (2, "b", "y")])
    d1 = _apply(None, snap, TS1)
    d2 = _apply(d1, snap, TS2)
    a = sorted([tuple(r) for r in d1.collect()])
    b = sorted([tuple(r) for r in d2.collect()])
    assert a == b  # unchanged snapshot -> byte-identical state


def test_invariants(spark):
    d1 = _apply(None, _stg(spark, [(1, "a", "x"), (2, "b", "y")]), TS1)
    d2 = _apply(d1, _stg(spark, [(1, "A2", "x"), (2, "b", "y"), (3, "c", "z")]), TS2)
    # ≤1 current row per business key
    cur = d2.filter("is_current").groupBy("bk").count().filter("count > 1")
    assert cur.count() == 0
    # valid_from < valid_to always
    assert d2.filter(F.col("valid_from") >= F.col("valid_to")).count() == 0
    # SK uniqueness
    assert d2.select("sk").distinct().count() == d2.count()


def test_close_missing_soft_deletes(spark):
    d1 = _apply(None, _stg(spark, [(1, "a", "x"), (2, "b", "y")]), TS1)
    # key 2 vanishes from the snapshot
    snap2 = _stg(spark, [(1, "a", "x")])

    # default (reference semantics): absent key stays current
    d2_keep = scd2_apply(
        d1, snap2, business_key="bk", tracked_cols=["attr"],
        carried_cols=["extra"], sk_col="sk", batch_ts=F.lit(TS2),
    )
    r2 = [r for r in d2_keep.collect() if r["bk"] == 2]
    assert len(r2) == 1 and r2[0]["is_current"]

    # close_missing: absent key soft-closed at the batch clock
    d2_close = scd2_apply(
        d1, snap2, business_key="bk", tracked_cols=["attr"],
        carried_cols=["extra"], sk_col="sk", batch_ts=F.lit(TS2),
        close_missing=True,
    )
    r2c = [r for r in d2_close.collect() if r["bk"] == 2]
    assert len(r2c) == 1
    assert not r2c[0]["is_current"] and r2c[0]["valid_to"] == TS2
    # present unchanged key untouched in both modes
    r1c = [r for r in d2_close.collect() if r["bk"] == 1]
    assert len(r1c) == 1 and r1c[0]["is_current"]
