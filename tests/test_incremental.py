"""Incremental rollup maintenance: folded per-batch state must equal a
one-shot recompute (sum/count/min/max exactly; HLL within its error
bound), replays must be skipped, and only touched partitions rewrite."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_platform_spark.ops.incremental import (
    combine_rollups,
    hll_estimate,
    incremental_rollup,
    rollup_delta,
)
from data_platform_spark.pipeline import Warehouse
from data_platform_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE

KEYS = ["event_type"]
MEASURES = {"value": "sum", "event_id": "count", "ts": "max", "user_id": "hll"}


@pytest.fixture
def wh(tmp_path):
    return Warehouse(str(tmp_path / "warehouse"))


def _batches(spark, n=3):
    ev = load_table(spark, SF_SMOKE, "events")
    return ev, [ev.filter(F.pmod("event_id", F.lit(n)) == i) for i in range(n)]


def _assert_matches_oneshot(rolled, ev):
    oneshot = rollup_delta(ev, KEYS, MEASURES)
    got = {
        r["event_type"]: r
        for r in rolled.select(
            "event_type",
            F.col("sum_value"),
            "count_event_id",
            "max_ts",
            hll_estimate("hll_user_id").alias("nd_user"),
        ).collect()
    }
    exact_nd = {
        r["event_type"]: r["nd"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("nd"))
        .collect()
    }
    for r in oneshot.select(
        "event_type", "sum_value", "count_event_id", "max_ts"
    ).collect():
        g = got[r["event_type"]]
        assert g["count_event_id"] == r["count_event_id"]
        assert g["max_ts"] == r["max_ts"]
        assert abs(g["sum_value"] - r["sum_value"]) < 1e-6 * abs(r["sum_value"])
        nd = exact_nd[r["event_type"]]
        assert abs(g["nd_user"] - nd) <= max(3, 0.05 * nd)
    assert set(got) == set(exact_nd)


def test_fold_equals_oneshot(spark):
    ev, batches = _batches(spark)
    state = None
    for b in batches:
        d = rollup_delta(b, KEYS, MEASURES)
        state = d if state is None else combine_rollups(state, d, KEYS, MEASURES)
    _assert_matches_oneshot(state, ev)


def test_fold_order_invariant(spark):
    ev, batches = _batches(spark)
    deltas = [rollup_delta(b, KEYS, MEASURES) for b in batches]
    ab_c = combine_rollups(
        combine_rollups(deltas[0], deltas[1], KEYS, MEASURES), deltas[2], KEYS, MEASURES
    )
    c_ba = combine_rollups(
        deltas[2], combine_rollups(deltas[1], deltas[0], KEYS, MEASURES), KEYS, MEASURES
    )
    a = {
        r["event_type"]: (r["count_event_id"], r["max_ts"])
        for r in ab_c.collect()
    }
    b = {
        r["event_type"]: (r["count_event_id"], r["max_ts"])
        for r in c_ba.collect()
    }
    assert a == b


def test_warehouse_incremental_rollup(spark, wh):
    ev, batches = _batches(spark)
    for i, b in enumerate(batches):
        incremental_rollup(
            spark, wh, "dwh", "ev_rollup", b, KEYS, MEASURES, "event_type",
            batch_id=f"b{i}",
        )
    _assert_matches_oneshot(wh.read(spark, "dwh", "ev_rollup"), ev)


def test_replayed_batch_is_skipped(spark, wh):
    ev, batches = _batches(spark)
    for i, b in enumerate(batches):
        incremental_rollup(
            spark, wh, "dwh", "ev_rollup", b, KEYS, MEASURES, "event_type",
            batch_id=f"b{i}",
        )
    # at-least-once delivery replays batch 1; marker must short-circuit it
    assert (
        incremental_rollup(
            spark, wh, "dwh", "ev_rollup", batches[1], KEYS, MEASURES,
            "event_type", batch_id="b1",
        )
        == []
    )
    _assert_matches_oneshot(wh.read(spark, "dwh", "ev_rollup"), ev)


def test_only_touched_partitions_rewrite(spark, wh):
    ev, _ = _batches(spark)
    incremental_rollup(
        spark, wh, "dwh", "ev_rollup", ev, KEYS, MEASURES, "event_type"
    )
    one_type = ev.filter(F.col("event_type") == "click")
    written = incremental_rollup(
        spark, wh, "dwh", "ev_rollup", one_type, KEYS, MEASURES, "event_type"
    )
    assert written == ["event_type=click"]
    # the click row absorbed the second fold; every other key unchanged
    final = wh.read(spark, "dwh", "ev_rollup")
    n_click_all = ev.filter(F.col("event_type") == "click").count()
    row = {r["event_type"]: r for r in final.collect()}
    assert row["click"]["count_event_id"] == 2 * n_click_all
    other = [t for t in row if t != "click"][0]
    assert (
        row[other]["count_event_id"]
        == ev.filter(F.col("event_type") == other).count()
    )
