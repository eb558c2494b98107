"""Structured Streaming pipelines: file-drop source → windowed aggs →
memory sink; results must equal their batch duals on the same data."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from data_platform_spark.queries.events import (
    events_hourly_by_type,
    events_sessionize,
)
from data_platform_spark.sources.tables import load_table
from data_platform_spark.streaming import (
    hourly_agg_stream,
    read_events_stream,
    sessionize_stream,
    user_running_totals_stream,
)
from data_platform_spark.streaming.events import run_to_memory_sink

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """Dump sf0.001 events as JSON file-drops (3 files ≈ 3 micro-batches)."""
    spark_dir = str(tmp_path_factory.mktemp("events_stream"))
    import duckdb

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT event_id, ts, user_id, event_type, value, props "
        f"FROM '{SF}/events.parquet' ORDER BY event_id"
    ).fetchall()
    con.close()
    chunks = [rows[i::3] for i in range(3)]
    for i, chunk in enumerate(chunks):
        with open(os.path.join(spark_dir, f"part-{i}.json"), "w") as f:
            for r in chunk:
                f.write(
                    json.dumps(
                        {
                            "event_id": r[0],
                            "ts": r[1].isoformat(),
                            "user_id": r[2],
                            "event_type": r[3],
                            "value": r[4],
                            "props": r[5],
                        }
                    )
                    + "\n"
                )
    return spark_dir


def test_hourly_agg_stream_equals_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    q = run_to_memory_sink(hourly_agg_stream(stream), "hourly_sink")
    q.awaitTermination(120)

    got = {
        (r["hour_start"], r["event_type"]): (r["n_events"], round(r["total_value"], 2))
        for r in spark.table("hourly_sink").collect()
    }
    want = {
        (r["hour_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in events_hourly_by_type(spark, SF).collect()
    }
    assert got == want


def test_session_stream_matches_batch_session_count(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    q = run_to_memory_sink(sessionize_stream(stream), "session_sink")
    q.awaitTermination(120)

    got = spark.table("session_sink")
    want = events_sessionize(spark, SF)
    # session boundaries agree: same number of sessions per user and same
    # total events (start/end equality checked on a sample user)
    g = {r["user_id"]: r["n"] for r in got.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    w = {r["user_id"]: r["n"] for r in want.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    assert g == w
    assert got.agg(F.sum("n_events")).collect()[0][0] == 1000


def test_running_totals_stream(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    q = run_to_memory_sink(user_running_totals_stream(stream), "totals_sink")
    q.awaitTermination(120)

    got = spark.table("totals_sink")
    batch = load_table(spark, SF, "events").groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    assert got.count() == batch.count()
    assert got.agg(F.sum("n_events")).collect()[0][0] == 1000


def test_stateful_ema_stream_single_batch_equals_batch(spark, events_dir, tmp_path):
    """applyInPandasWithState custom operator: a single-batch streaming run
    must produce each user's final EMA exactly (the batch dual)."""
    import glob
    import shutil

    from data_platform_spark.queries.events import events_user_ema
    from data_platform_spark.streaming import read_events_stream
    from data_platform_spark.streaming.stateful import user_ema_stream

    # one combined file -> one micro-batch -> per-user fold sees all
    # events in (ts, event_id) order, same as the batch dual
    one_dir = tmp_path / "one_batch"
    one_dir.mkdir()
    with open(one_dir / "all.json", "w") as out:
        for f in sorted(glob.glob(f"{events_dir}/*.json")):
            with open(f) as src:
                shutil.copyfileobj(src, out)

    stream = read_events_stream(spark, str(one_dir))
    q = (
        user_ema_stream(stream)
        .writeStream.format("memory")
        .queryName("ema_sink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    import math
    got = {
        r["user_id"]: (r["n_events"], math.floor(r["ema"] * 10000 + 0.5) / 10000)
        for r in spark.table("ema_sink").collect()
    }
    batch = events_user_ema(spark, SF)
    # batch dual emits per-event EMA; the stream emits the final state ->
    # compare against each user's last event's EMA
    from pyspark.sql import functions as F

    ev = spark.read.json(str(one_dir))
    last_eid = ev.groupBy("user_id").agg(F.max("event_id").alias("event_id"))
    want_rows = batch.join(last_eid, ["user_id", "event_id"]).collect()
    counts = {r["user_id"]: r["n"] for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    want = {r["user_id"]: (counts[r["user_id"]], r["ema"]) for r in want_rows}
    assert got == want


def test_stateful_ema_state_carries_across_batches(spark, tmp_path):
    """State persistence across micro-batches: events split by time into
    two files (per-user order preserved across the split), streamed one
    file per trigger — the final EMA must equal the single-batch result."""
    import duckdb
    import json as _json

    from data_platform_spark.streaming import read_events_stream
    from data_platform_spark.streaming.stateful import user_ema_stream

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT event_id, ts, user_id, event_type, value, props "
        f"FROM '{SF}/events.parquet' ORDER BY ts, event_id"
    ).fetchall()
    con.close()
    halves = [rows[: len(rows) // 2], rows[len(rows) // 2 :]]
    src = tmp_path / "halves"
    src.mkdir()
    for i, chunk in enumerate(halves):
        with open(src / f"t{i}.json", "w") as f:
            for r in chunk:
                f.write(
                    _json.dumps(
                        {
                            "event_id": r[0],
                            "ts": r[1].isoformat(),
                            "user_id": r[2],
                            "event_type": r[3],
                            "value": r[4],
                            "props": r[5],
                        }
                    )
                    + "\n"
                )

    stream = read_events_stream(spark, str(src), max_files_per_trigger=1)
    q = (
        user_ema_stream(stream)
        .writeStream.format("memory")
        .queryName("ema_carry_sink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # 'update' memory sink appends one row per user per batch; the LAST
    # row per user is the final state
    import pandas as pd

    sink = spark.table("ema_carry_sink").toPandas()
    final = sink.groupby("user_id").last()

    # python reference over the full ordered stream
    state, counts = {}, {}
    for _, ts, uid, _t, v, _p in rows:
        s = state.get(uid)
        state[uid] = v if s is None else 0.3 * v + 0.7 * s
        counts[uid] = counts.get(uid, 0) + 1
    for uid, row in final.iterrows():
        assert counts[uid] == row["n_events"], uid
        assert abs(state[uid] - row["ema"]) < 1e-9, uid


def test_stream_to_warehouse_upsert_sink(spark, events_dir, tmp_path):
    """foreachBatch ELT sink: streamed events land in the warehouse with
    upsert identity; restarting the stream over the same source does not
    duplicate rows."""
    from data_platform_spark.pipeline import Warehouse
    from data_platform_spark.streaming import read_events_stream
    from data_platform_spark.streaming.sink import stream_upsert_sink

    wh = Warehouse(str(tmp_path / "wh"))
    q = stream_upsert_sink(
        read_events_stream(spark, events_dir, max_files_per_trigger=1),
        wh, "raw", "events_stream",
        key_cols=["event_id"], order_col="ts",
        checkpoint_dir=str(tmp_path / "ckpt1"),
    )
    q.awaitTermination(120)
    assert wh.read(spark, "raw", "events_stream").count() == 1000

    # replay from scratch (fresh checkpoint): upsert identity absorbs it
    q2 = stream_upsert_sink(
        read_events_stream(spark, events_dir),
        wh, "raw", "events_stream",
        key_cols=["event_id"], order_col="ts",
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination(120)
    assert wh.read(spark, "raw", "events_stream").count() == 1000


def test_stream_stream_interval_join_equals_batch(spark, events_dir):
    """Stream-stream join with watermarks: matched (purchase, click)
    pairs equal the batch time-range join on the same data."""
    from pyspark.sql import functions as F

    from data_platform_spark.sources.tables import load_table
    from data_platform_spark.streaming import read_events_stream
    from data_platform_spark.streaming.events import click_purchase_join_stream

    stream = read_events_stream(spark, events_dir)
    clicks_s = stream.filter(F.col("event_type") == "click")
    purchases_s = stream.filter(F.col("event_type") == "purchase")
    q = (
        click_purchase_join_stream(clicks_s, purchases_s)
        .writeStream.format("memory")
        .queryName("ssj_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["purchase_id"], r["click_ts"])
        for r in spark.table("ssj_sink").collect()
    }

    ev = load_table(spark, SF, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    want = {
        (r["purchase_id"], r["click_ts"])
        for r in p.join(
            c,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("click_ts") <= F.col("purchase_ts"))
            & (
                F.col("click_ts")
                >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")
            ),
        ).collect()
    }
    assert got == want and len(got) > 0


def test_watermark_drops_late_data(spark, tmp_path):
    """Late-data handling: events arriving after the watermark has passed
    their window are DROPPED from the aggregation. File 1 carries the
    newest events (advancing the watermark); file 2 replays much older
    events — with a 2h watermark they are beyond the threshold and must
    not create/update their windows."""
    import json as _json

    import duckdb

    from data_platform_spark.streaming import hourly_agg_stream, read_events_stream

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT event_id, ts, user_id, event_type, value, props "
        f"FROM '{SF}/events.parquet' ORDER BY ts"
    ).fetchall()
    con.close()

    def dump(path, chunk):
        with open(path, "w") as f:
            for r in chunk:
                f.write(_json.dumps({
                    "event_id": r[0], "ts": r[1].isoformat(), "user_id": r[2],
                    "event_type": r[3], "value": r[4], "props": r[5],
                }) + "\n")

    src = tmp_path / "late_src"
    src.mkdir()
    # Spark's late-event filter uses the PREVIOUS batch's eviction
    # watermark, so the watermark advanced by batch A only filters from
    # batch C onward — three micro-batches: A bulk-new, B newest sliver
    # (keeps the clock advanced), C the late replay.
    import os as _os
    import time as _time

    dump(src / "a-bulk.json", rows[500:900])
    dump(src / "b-tip.json", rows[900:])
    dump(src / "c-late.json", rows[:500])   # weeks older than the watermark
    now = _time.time()
    _os.utime(src / "a-bulk.json", (now - 200, now - 200))
    _os.utime(src / "b-tip.json", (now - 100, now - 100))
    _os.utime(src / "c-late.json", (now, now))

    stream = read_events_stream(spark, str(src), max_files_per_trigger=1)
    q = (
        hourly_agg_stream(stream, watermark="2 hours")
        .writeStream.format("memory")
        .queryName("late_sink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    from pyspark.sql import functions as F

    sink = spark.table("late_sink")
    split_hour = rows[500][1].replace(minute=0, second=0, microsecond=0)
    # the late replay (weeks before the watermark) must NOT have created
    # any of its windows (the boundary hour itself belongs to the new era)
    late_windows = sink.filter(F.col("hour_start") < F.lit(split_hour)).count()
    assert late_windows == 0, late_windows
    # ...while the new-era events are fully aggregated
    got_events = (
        sink.groupBy("hour_start", "event_type")
        .agg(F.max("n_events").alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert got_events == 500, got_events


def test_dedup_stream_drops_redelivered_events(spark, tmp_path):
    """At-least-once redelivery across micro-batches: event_ids repeated in
    a later file (within the watermark) must come out exactly once."""
    from datetime import datetime, timedelta

    from data_platform_spark.streaming.events import (
        dedup_events_stream,
        read_events_stream,
        run_to_memory_sink,
    )

    src = tmp_path / "dedup_src"
    src.mkdir()
    t0 = datetime(2026, 1, 1, 10, 0, 0)

    def _evt(eid, minutes):
        return {
            "event_id": eid,
            "ts": (t0 + timedelta(minutes=minutes)).isoformat(),
            "user_id": eid % 3,
            "event_type": "click",
            "value": 1.0,
            "props": "{}",
        }

    batch1 = [_evt(i, i) for i in range(10)]
    batch2 = [_evt(i, i) for i in range(5, 15)]  # 5..9 redelivered
    with open(src / "b1.json", "w") as f:
        f.writelines(json.dumps(e) + "\n" for e in batch1)
    with open(src / "b2.json", "w") as f:
        f.writelines(json.dumps(e) + "\n" for e in batch2)

    stream = read_events_stream(spark, str(src), max_files_per_trigger=1)
    q = run_to_memory_sink(
        dedup_events_stream(stream), "dedup_sink", output_mode="append"
    )
    q.awaitTermination(120)

    rows = spark.table("dedup_sink").collect()
    ids = sorted(r["event_id"] for r in rows)
    assert ids == list(range(15))  # each id exactly once


def test_stream_to_warehouse_merge_sink(spark, events_dir, tmp_path):
    """Partition-pruned MERGE as a streaming sink: same exactly-once
    contract as the upsert sink, table hive-partitioned by event_type;
    replaying the whole source is absorbed by newest-wins resolution."""
    from data_platform_spark.pipeline import Warehouse
    from data_platform_spark.streaming import read_events_stream
    from data_platform_spark.streaming.sink import stream_merge_sink

    wh = Warehouse(str(tmp_path / "wh"))
    q = stream_merge_sink(
        read_events_stream(spark, events_dir, max_files_per_trigger=1),
        wh, "raw", "events_merged",
        key_cols=["event_id"], order_col="ts", partition_col="event_type",
        checkpoint_dir=str(tmp_path / "ckpt1"),
    )
    q.awaitTermination(120)
    out = wh.read(spark, "raw", "events_merged")
    assert out.count() == 1000
    import os

    parts = sorted(
        d
        for d in os.listdir(wh.path("raw", "events_merged"))
        if d.startswith("event_type=")
    )
    assert len(parts) == 5  # hive layout by event_type

    q2 = stream_merge_sink(
        read_events_stream(spark, events_dir),
        wh, "raw", "events_merged",
        key_cols=["event_id"], order_col="ts", partition_col="event_type",
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination(120)
    assert wh.read(spark, "raw", "events_merged").count() == 1000


def test_stream_rollup_sink_matches_batch_rollup(spark, events_dir, tmp_path):
    """Streaming incremental-rollup sink: per-micro-batch partial aggs
    folded into the stored rollup must equal a one-shot batch GROUP BY
    over the whole source; restarting over the same source (replayed
    batch ids) must not double-count."""
    from data_platform_spark.ops.incremental import incremental_rollup  # noqa: F401
    from data_platform_spark.ops.incremental import stream_rollup_sink
    from data_platform_spark.pipeline import Warehouse
    from data_platform_spark.streaming import read_events_stream

    wh = Warehouse(str(tmp_path / "wh"))
    keys, measures = ["event_type"], {"value": "sum", "event_id": "count"}
    q = stream_rollup_sink(
        read_events_stream(spark, events_dir, max_files_per_trigger=1),
        wh, "dwh", "ev_rollup", keys, measures, "event_type",
        checkpoint_dir=str(tmp_path / "ckpt1"),
    )
    q.awaitTermination(120)

    batch = (
        spark.read.schema("event_id LONG, ts TIMESTAMP, user_id LONG, "
                          "event_type STRING, value DOUBLE, props STRING")
        .json(events_dir)
        .groupBy("event_type")
        .agg(F.sum("value").alias("s"), F.count("event_id").alias("n"))
    )
    expect = {r["event_type"]: (r["s"], r["n"]) for r in batch.collect()}
    got = {
        r["event_type"]: (r["sum_value"], r["count_event_id"])
        for r in wh.read(spark, "dwh", "ev_rollup").collect()
    }
    assert set(got) == set(expect)
    for t, (s, n) in expect.items():
        assert got[t][1] == n
        assert abs(got[t][0] - s) < 1e-6 * abs(s)

    # same source, fresh checkpoint -> same deterministic batch ids ->
    # every batch is a replay; the marker set must absorb all of them
    q2 = stream_rollup_sink(
        read_events_stream(spark, events_dir, max_files_per_trigger=1),
        wh, "dwh", "ev_rollup", keys, measures, "event_type",
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination(120)
    got2 = {
        r["event_type"]: (r["sum_value"], r["count_event_id"])
        for r in wh.read(spark, "dwh", "ev_rollup").collect()
    }
    assert got2 == got


def test_daily_quality_monitor_stream_equals_batch(spark, events_dir, tmp_path):
    """foreachBatch quality monitor over 3 micro-batches: after the
    stream drains, the monitor table must EQUAL the oracle-gated batch
    query over the same events (same metric core, incremental
    maintenance only recomputing touched days)."""
    from data_platform_spark.pipeline import Warehouse
    from data_platform_spark.queries.events import events_daily_quality
    from data_platform_spark.streaming import read_events_stream
    from data_platform_spark.streaming.monitors import (
        daily_quality_monitor_sink,
    )

    wh = Warehouse(str(tmp_path / "wh"))
    q = daily_quality_monitor_sink(
        read_events_stream(spark, events_dir, max_files_per_trigger=1),
        wh,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    got = sorted(
        tuple(r)
        for r in wh.read(spark, "dwh", "daily_quality")
        .select("day", "n_rows", "n_users", "null_value_rate",
                "null_props_rate", "median_value")
        .collect()
    )
    want = sorted(tuple(r) for r in events_daily_quality(spark, SF).collect())
    assert got == want and len(got) > 0


def test_anomaly_monitor_stream_equals_batch(spark, events_dir, tmp_path):
    """foreachBatch z-score monitor over 3 micro-batches: the final
    monitor table must EQUAL the oracle-gated batch query — late
    arrivals for a user shift the trailing baselines of that user's
    later events, so per-batch recompute replaces the user's scores
    wholesale."""
    from data_platform_spark.pipeline import Warehouse
    from data_platform_spark.queries.events import (
        ZSCORE_CUT,
        ZSCORE_LOOKBACK,
        ZSCORE_MIN_N,
        events_anomaly_zscore,
    )
    from data_platform_spark.streaming import read_events_stream
    from data_platform_spark.streaming.monitors import anomaly_monitor_sink

    wh = Warehouse(str(tmp_path / "wh"))
    q = anomaly_monitor_sink(
        read_events_stream(spark, events_dir, max_files_per_trigger=1),
        wh,
        checkpoint_dir=str(tmp_path / "ckpt"),
        lookback=ZSCORE_LOOKBACK,
        min_n=ZSCORE_MIN_N,
        cut=ZSCORE_CUT,
    )
    q.awaitTermination(180)

    cols = ["event_id", "user_id", "n_prior", "base_mean", "base_std",
            "zscore", "is_anomaly"]
    got = sorted(
        tuple(r)
        for r in wh.read(spark, "dwh", "event_anomalies").select(*cols).collect()
    )
    want = sorted(
        tuple(r) for r in events_anomaly_zscore(spark, SF).collect()
    )
    assert got == want and len(got) == 1000


def test_neardup_stream_sink_daily_loop(spark, tmp_path):
    """The crawler loop end-to-end over 2 micro-batches: batch-1 docs
    seed the index (all kept), a batch-2 near-duplicate of a batch-1
    doc is flagged against the GROWN index, an intra-batch duplicate
    resolves lowest-id-wins, and novel docs keep."""
    import json
    import os

    from data_platform_spark.ops.neardup_index import build_band_index
    from data_platform_spark.pipeline import Warehouse
    from data_platform_spark.streaming.dedup import neardup_stream_sink

    src = str(tmp_path / "docs_stream")
    os.makedirs(src)
    batch1 = [
        {"doc_id": 1, "text": "alpha beta gamma delta epsilon zeta"},
        {"doc_id": 2, "text": "one two three four five six seven"},
    ]
    batch2 = [
        # near-dup of doc 1 (one word changed)
        {"doc_id": 10, "text": "alpha beta gamma delta epsilon eta"},
        # novel
        {"doc_id": 11, "text": "completely different content right here"},
        # intra-batch pair: 12 kept (lower id), 13 dropped
        {"doc_id": 12, "text": "red orange yellow green blue indigo violet"},
        {"doc_id": 13, "text": "red orange yellow green blue indigo pink"},
    ]
    for i, rows in enumerate([batch1, batch2]):
        with open(f"{src}/b{i}.json", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        # the file source orders by MODIFICATION TIME; files written in
        # the same clock tick would process in arbitrary order and
        # batch 2 could seed the index before batch 1 — pin the order
        os.utime(f"{src}/b{i}.json", (1_000_000 + i, 1_000_000 + i))

    wh = Warehouse(str(tmp_path / "wh"))
    index_path = str(tmp_path / "band_idx")
    # seed an EMPTY index (schema-bearing) so the first search has a
    # standing side to probe
    empty = spark.createDataFrame([], "doc_id long, text string")
    build_band_index(empty, index_path)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = neardup_stream_sink(
        stream, wh, index_path,
        checkpoint_dir=str(tmp_path / "ckpt"), threshold=0.2,
    )
    q.awaitTermination(180)

    dec = {
        r.doc_id: r
        for r in wh.read(spark, "dwh", "neardup_decisions").collect()
    }
    assert dec[1].keep and dec[2].keep            # batch 1 seeds
    assert not dec[10].keep and dec[10].best_match_doc == 1
    assert dec[11].keep                           # novel
    assert dec[12].keep and 13 not in dec         # intra-batch: 13 dropped
    # the index grew by exactly the survivors: 1, 2, 11, 12
    idx_ids = {
        r.doc_id
        for r in spark.read.parquet(f"{index_path}/shingles").collect()
    }
    assert idx_ids == {1, 2, 11, 12}


def test_substring_stream_sink_daily_loop(spark, tmp_path):
    """The exact-substring crawler loop end-to-end over 2 micro-batches
    (VERDICT r15 item 2's streaming leg): batch-1 docs seed the index
    (all kept), a batch-2 doc mostly made of a batch-1 doc's text is
    flagged STRIP against the GROWN index and NOT appended, a doc with
    a sub-threshold shared chunk keeps with its coverage recorded, and
    novel docs keep with zero coverage."""
    import json
    import os
    import random

    from data_platform_spark.ops.substring_index import (
        build_substring_index,
    )
    from data_platform_spark.pipeline import Warehouse
    from data_platform_spark.streaming.dedup import substring_stream_sink

    def _txt(seed, n):
        rng = random.Random(seed)
        return "".join(
            rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(n)
        )

    base = _txt(1, 120)
    src = str(tmp_path / "docs_stream")
    os.makedirs(src)
    batch1 = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": _txt(2, 120)},
    ]
    batch2 = [
        # 80/120 of doc 1's text verbatim -> strip, not appended
        {"doc_id": 10, "text": base[:80] + "Q" + _txt(3, 39)},
        # novel -> keep, zero coverage
        {"doc_id": 11, "text": _txt(4, 120)},
        # 30/120 shared -> keep, coverage recorded
        {"doc_id": 12, "text": base[:30] + "Q" + _txt(5, 89)},
    ]
    for i, rows in enumerate([batch1, batch2]):
        with open(f"{src}/b{i}.json", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.utime(f"{src}/b{i}.json", (1_000_000 + i, 1_000_000 + i))

    wh = Warehouse(str(tmp_path / "wh"))
    index_path = str(tmp_path / "substr_idx")
    empty = spark.createDataFrame([], "doc_id long, text string")
    build_substring_index(empty, index_path)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = substring_stream_sink(
        stream, wh, index_path, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)

    dec = {
        r.doc_id: r
        for r in wh.read(spark, "dwh", "substring_decisions").collect()
    }
    assert set(dec) == {1, 2, 10, 11, 12}
    assert dec[1].decision == "keep" and dec[2].decision == "keep"
    assert dec[10].decision == "strip" and dec[10].dup_chars == 80
    assert dec[11].decision == "keep" and dec[11].dup_chars == 0
    assert dec[12].decision == "keep" and dec[12].dup_chars == 30
    # the index grew by exactly the survivors: 1, 2, 11, 12
    idx_ids = {
        r.doc_id
        for r in spark.read.parquet(f"{index_path}/postings").collect()
    }
    assert idx_ids == {1, 2, 11, 12}
    # replay with a FRESH checkpoint: completed batch markers short-
    # circuit both batches — decisions and index unchanged
    stream2 = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q2 = substring_stream_sink(
        stream2, wh, index_path, checkpoint_dir=str(tmp_path / "ckpt2")
    )
    q2.awaitTermination(180)
    assert {
        r.doc_id
        for r in spark.read.parquet(f"{index_path}/postings").collect()
    } == {1, 2, 11, 12}
    assert wh.read(spark, "dwh", "substring_decisions").count() == 5


def test_daily_quality_monitor_absorbs_late_day_update(spark, tmp_path):
    """Late-data contract (VERDICT r7 item 7), pinned: a NEW event
    arriving after its day was already published must UPDATE that day's
    monitor row — the day comes from the batch itself, so it lands in
    the touched set and the pruned recompute replaces the stale row.
    (The one unhandled shape remains a ts MUTATION of an existing
    event_id across a day boundary — the event-time-immutability
    contract documented in streaming/monitors._merge_batch.)"""
    import json
    import os

    from data_platform_spark.ops.monitors import daily_quality_metrics
    from data_platform_spark.pipeline import Warehouse
    from data_platform_spark.streaming import read_events_stream
    from data_platform_spark.streaming.monitors import (
        daily_quality_monitor_sink,
    )

    src = str(tmp_path / "late_stream")
    os.makedirs(src)
    batch1 = [
        {"event_id": 1, "ts": "2024-03-01T10:00:00", "user_id": 1,
         "event_type": "view", "value": 10.0, "props": None},
        {"event_id": 2, "ts": "2024-03-01T11:00:00", "user_id": 2,
         "event_type": "view", "value": 30.0, "props": "{}"},
        {"event_id": 3, "ts": "2024-03-02T09:00:00", "user_id": 1,
         "event_type": "buy", "value": 5.0, "props": None},
    ]
    batch2 = [
        # LATE: a new event for the already-published 03-01 (moves that
        # day's median from 20.0 to 30.0 and n_rows from 2 to 3)
        {"event_id": 4, "ts": "2024-03-01T23:00:00", "user_id": 3,
         "event_type": "view", "value": 50.0, "props": None},
        {"event_id": 5, "ts": "2024-03-03T08:00:00", "user_id": 2,
         "event_type": "view", "value": 7.0, "props": None},
    ]
    for i, rows in enumerate([batch1, batch2]):
        with open(f"{src}/b{i}.json", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.utime(f"{src}/b{i}.json", (1_000_000 + i, 1_000_000 + i))

    wh = Warehouse(str(tmp_path / "wh"))
    q = daily_quality_monitor_sink(
        read_events_stream(spark, src, max_files_per_trigger=1),
        wh,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    got = {
        str(r["day"]): (r["n_rows"], r["median_value"])
        for r in wh.read(spark, "dwh", "daily_quality").collect()
    }
    # the late event re-published day 1: 3 rows, median 30.0 (not the
    # batch-1 snapshot of 2 rows / 20.0)
    assert got["2024-03-01 00:00:00"] == (3, 30.0)
    assert len(got) == 3

    # and the final table equals the batch metric over the full source
    ev = (
        spark.read.schema(
            "event_id LONG, ts TIMESTAMP, user_id LONG, "
            "event_type STRING, value DOUBLE, props STRING"
        )
        .json(src)
    )
    want = {
        str(r["day"]): (r["n_rows"], r["median_value"])
        for r in daily_quality_metrics(ev).collect()
    }
    assert got == want


def test_ann_ingest_sink_appends_and_rebuilds_on_drift(spark, tmp_path):
    """The embedding pipeline's daily loop end-to-end: batch 0 (same
    distribution) folds in with NO rebuild, batch 1 (drifted region)
    crosses the distortion threshold and triggers the retrain + atomic
    swap INSIDE the stream — after the drain a drifted-region query
    finds its true neighbors through the maintained index, and a full
    replay with a fresh checkpoint adds zero duplicate vectors."""
    import json
    import os

    import numpy as np

    from data_platform_spark.functions.similarity import cosine_topk
    from data_platform_spark.ops.ann_index import (
        build_ivf_index,
        ivf_search_index,
    )
    from data_platform_spark.pipeline import Warehouse
    from data_platform_spark.streaming.ann import (
        ann_ingest_sink,
        indexed_corpus,
        read_embeddings_stream,
    )

    rng = np.random.default_rng(6)
    ca = rng.normal(size=(4, 64))
    ca /= np.linalg.norm(ca, axis=1, keepdims=True)
    cb = rng.normal(size=(8, 64))
    cb /= np.linalg.norm(cb, axis=1, keepdims=True)

    def planted(centers, per, sigma, start_id, label0):
        rows, vid = [], start_id
        for ci, c in enumerate(centers):
            for _ in range(per):
                v = c + sigma * rng.normal(size=64)
                v /= np.linalg.norm(v)
                rows.append((vid, label0 + ci, [float(x) for x in v]))
                vid += 1
        return rows

    initial = planted(ca, 40, 0.10, 0, 0)            # ids 0-159
    same = planted(ca[:2], 40, 0.10, 5000, 0)        # ids 5000-5079
    drifted = planted(cb, 40, 0.10, 1000, 100)       # ids 1000-1319

    index_path = str(tmp_path / "ivf_index")
    build_ivf_index(
        spark.createDataFrame(
            initial, "vec_id: long, label: long, embedding: array<double>"
        ),
        index_path,
        k=8,
    )

    src = str(tmp_path / "emb_stream")
    os.makedirs(src)
    for i, rows in enumerate([same, drifted]):
        with open(f"{src}/b{i}.json", "w") as f:
            for vid, lab, vec in rows:
                f.write(
                    json.dumps(
                        {"vec_id": vid, "label": lab, "embedding": vec}
                    )
                    + "\n"
                )
        os.utime(f"{src}/b{i}.json", (1_000_000 + i, 1_000_000 + i))

    wh = Warehouse(str(tmp_path / "wh"))
    q = ann_ingest_sink(
        read_embeddings_stream(spark, src, max_files_per_trigger=1),
        wh,
        index_path,
        checkpoint_dir=str(tmp_path / "ckpt"),
        drift_threshold=1.5,
    )
    q.awaitTermination(180)

    ledger = {
        r["batch_id"]: (r["rebuilt"], r["ratio"])
        for r in wh.read(spark, "dwh", "ann_index_maintenance").collect()
    }
    assert ledger[0][0] is False and ledger[0][1] <= 1.5
    assert ledger[1][0] is True and ledger[1][1] > 1.5

    corpus = indexed_corpus(spark, index_path)
    assert corpus.count() == 160 + 80 + 320

    # a drifted-region query finds its true neighbors via the rebuilt index
    vecs = {r[0]: r[2] for r in initial + same + drifted}
    qid = 1300
    qv = corpus.filter(F.col("vec_id") == qid).select(
        F.col("embedding").alias("q")
    )
    truth = {
        r.vec_id
        for r in cosine_topk(corpus, qv, k=10, exclude_ids=[qid]).collect()
    }
    got = {
        r.vec_id
        for r in ivf_search_index(
            spark, index_path, vecs[qid], nprobe=2, k=10, exclude_ids=[qid]
        ).collect()
    }
    assert len(got & truth) / 10 >= 0.8

    # replay from a fresh checkpoint: deterministic batch names absorb
    # the re-delivery — zero duplicate vectors
    q2 = ann_ingest_sink(
        read_embeddings_stream(spark, src, max_files_per_trigger=1),
        wh,
        index_path,
        checkpoint_dir=str(tmp_path / "ckpt2"),
        drift_threshold=1.5,
    )
    q2.awaitTermination(180)
    assert indexed_corpus(spark, index_path).count() == 160 + 80 + 320


def test_ann_ingest_sink_drift_check_is_sampled_by_default(spark, tmp_path):
    """The drift check runs after EVERY micro-batch, so the default
    posture must be the bounded hash sample (sample_mod=16), never a
    full-corpus scan per batch (ADVICE r8 / VERDICT r8 item 5). Pins the
    wiring by recording what training_sample receives from the sink's
    in-loop drift evaluation."""
    import json
    import os

    import data_platform_spark.ops.ann_index as AI
    from data_platform_spark.ops.ann_index import build_ivf_index
    from data_platform_spark.pipeline import Warehouse
    from data_platform_spark.streaming.ann import (
        ann_ingest_sink,
        read_embeddings_stream,
    )

    rows = [
        (i, i % 4, [float((i * 7 + j) % 13) for j in range(64)])
        for i in range(64)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id: long, label: long, embedding: array<double>"
    )
    index_path = str(tmp_path / "ivf_index")
    build_ivf_index(emb, index_path, k=4)

    src = str(tmp_path / "emb_stream")
    os.makedirs(src)
    with open(f"{src}/b0.json", "w") as f:
        for i in range(64, 96):
            f.write(
                json.dumps(
                    {
                        "vec_id": i,
                        "label": i % 4,
                        "embedding": [float((i * 7 + j) % 13) for j in range(64)],
                    }
                )
                + "\n"
            )

    seen_mods = []
    real_sample = AI.training_sample

    def recording_sample(df, sample_mod, id_col):
        seen_mods.append(sample_mod)
        return real_sample(df, sample_mod, id_col)

    AI.training_sample = recording_sample
    try:
        q = ann_ingest_sink(
            read_embeddings_stream(spark, src),
            Warehouse(str(tmp_path / "wh")),
            index_path,
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        q.awaitTermination(120)
    finally:
        AI.training_sample = real_sample

    # one drift evaluation for the one batch, bounded by the default mod
    assert seen_mods == [16]


def test_ann_ingest_sink_heals_interrupted_swap_on_construction(
    spark, tmp_path
):
    """A crash between swap_in_stage's two renames leaves no live index
    dir; the sink heals it at construction (ADVICE r8), so a restarted
    stream serves micro-batches instead of failing in read_ivf_params
    until an operator intervenes."""
    import json
    import os

    from data_platform_spark.ops import _index_io as IO
    from data_platform_spark.ops.ann_index import (
        build_ivf_index,
        read_ivf_params,
    )
    from data_platform_spark.pipeline import Warehouse
    from data_platform_spark.streaming.ann import (
        ann_ingest_sink,
        indexed_corpus,
        read_embeddings_stream,
    )

    rows = [
        (i, i % 4, [float((i * 5 + j) % 11) for j in range(64)])
        for i in range(48)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id: long, label: long, embedding: array<double>"
    )
    index_path = str(tmp_path / "ivf_index")
    build_ivf_index(emb, index_path, k=4)

    # simulate the mid-swap crash: live renamed aside, stage never moved in
    os.rename(index_path, index_path + IO.OLD_SUFFIX)
    assert not os.path.isdir(index_path)

    src = str(tmp_path / "emb_stream")
    os.makedirs(src)
    with open(f"{src}/b0.json", "w") as f:
        for i in range(48, 60):
            f.write(
                json.dumps(
                    {
                        "vec_id": i,
                        "label": i % 4,
                        "embedding": [float((i * 5 + j) % 11) for j in range(64)],
                    }
                )
                + "\n"
            )

    q = ann_ingest_sink(
        read_embeddings_stream(spark, src),
        Warehouse(str(tmp_path / "wh")),
        index_path,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    # construction already restored the index (before the stream ran)
    assert read_ivf_params(spark, index_path)["k"] == 4
    q.awaitTermination(120)
    assert indexed_corpus(spark, index_path).count() == 48 + 12


def test_lexical_ingest_sink_two_batches_replay_and_compaction(
    spark, tmp_path
):
    """The fourth index family's streaming loop: an empty-seed index
    absorbs two document micro-batches, searches against it are
    bit-identical to one full build over the same corpus, a full replay
    from a fresh checkpoint adds zero postings rows, and the in-stream
    compaction leg (compact_every=1) keeps results identical while
    rolling the ledger up."""
    import json
    import os

    from data_platform_spark.ops.lexical_index import (
        build_lexical_index,
        bm25_search_index,
    )
    from data_platform_spark.queries.text import BM25_QUERY_TERMS
    from data_platform_spark.sources.tables import load_table
    from data_platform_spark.streaming.lexical import lexical_ingest_sink

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents").select("doc_id", "text")

    src = str(tmp_path / "docs_stream")
    os.makedirs(src)
    halves = [
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
    ]
    for i, half in enumerate(halves):
        with open(f"{src}/b{i}.json", "w") as f:
            for r in half.collect():
                f.write(
                    json.dumps({"doc_id": r.doc_id, "text": r.text}) + "\n"
                )
        os.utime(f"{src}/b{i}.json", (1_000_000 + i, 1_000_000 + i))

    empty = spark.createDataFrame([], "doc_id long, text string")
    index_path = str(tmp_path / "lex_idx")
    build_lexical_index(empty, index_path)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = lexical_ingest_sink(
        stream, index_path, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)

    full_path = str(tmp_path / "lex_full")
    build_lexical_index(docs, full_path)
    want = [
        tuple(r)
        for r in bm25_search_index(
            spark, full_path, BM25_QUERY_TERMS, topk=20
        ).collect()
    ]
    got = [
        tuple(r)
        for r in bm25_search_index(
            spark, index_path, BM25_QUERY_TERMS, topk=20
        ).collect()
    ]
    assert got == want and len(got) == 20

    # full replay from a fresh checkpoint: batch markers absorb it
    n_postings = spark.read.parquet(f"{index_path}/postings").count()
    q2 = lexical_ingest_sink(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src),
        index_path,
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination(180)
    assert (
        spark.read.parquet(f"{index_path}/postings").count() == n_postings
    )

    # in-stream compaction variant: same results, one-row ledger
    cpath = str(tmp_path / "lex_compacting")
    build_lexical_index(empty, cpath)
    q3 = lexical_ingest_sink(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src),
        cpath,
        checkpoint_dir=str(tmp_path / "ckpt3"),
        compact_every=1,
    )
    q3.awaitTermination(180)
    assert [
        tuple(r)
        for r in bm25_search_index(
            spark, cpath, BM25_QUERY_TERMS, topk=20
        ).collect()
    ] == want
    assert spark.read.parquet(f"{cpath}/stats").count() == 1


def test_neardup_stream_sink_in_stream_compaction(spark, tmp_path):
    """Band-index parity with the lexical sink's maintenance leg
    (compact_every): the two-batch crawler loop with compact_every=1
    produces the SAME verdicts and index membership as the
    uncompacted run, bounds the shingles half to one file per doc-id
    bucket, and a full replay from a fresh checkpoint AFTER compaction
    still adds zero rows (the batch markers survive the renames)."""
    import json
    import os

    from data_platform_spark.ops.compaction import _parquet_file_count
    from data_platform_spark.ops.neardup_index import (
        build_band_index,
        read_band_params,
    )
    from data_platform_spark.pipeline import Warehouse
    from data_platform_spark.streaming.dedup import neardup_stream_sink

    src = str(tmp_path / "docs_stream")
    os.makedirs(src)
    batch1 = [
        {"doc_id": 1, "text": "alpha beta gamma delta epsilon zeta"},
        {"doc_id": 2, "text": "one two three four five six seven"},
    ]
    batch2 = [
        {"doc_id": 10, "text": "alpha beta gamma delta epsilon eta"},
        {"doc_id": 11, "text": "completely different content right here"},
    ]
    for i, rows in enumerate([batch1, batch2]):
        with open(f"{src}/b{i}.json", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.utime(f"{src}/b{i}.json", (1_000_000 + i, 1_000_000 + i))

    wh = Warehouse(str(tmp_path / "wh"))
    index_path = str(tmp_path / "band_idx")
    empty = spark.createDataFrame([], "doc_id long, text string")
    build_band_index(empty, index_path)

    q = neardup_stream_sink(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src),
        wh,
        index_path,
        checkpoint_dir=str(tmp_path / "ckpt"),
        threshold=0.2,
        compact_every=1,
    )
    q.awaitTermination(180)

    dec = {
        r.doc_id: r
        for r in wh.read(spark, "dwh", "neardup_decisions").collect()
    }
    assert dec[1].keep and dec[2].keep
    assert not dec[10].keep and dec[10].best_match_doc == 1
    assert dec[11].keep
    idx_ids = {
        r.doc_id
        for r in spark.read.parquet(f"{index_path}/shingles").collect()
    }
    assert idx_ids == {1, 2, 11}

    # compaction bounded the append-per-batch file growth: at most one
    # file per shingle bucket after the final in-stream compact
    n_buckets = read_band_params(spark, index_path).get(
        "n_shingle_buckets"
    )
    n_files = _parquet_file_count(f"{index_path}/shingles")
    assert n_buckets is None or n_files <= n_buckets

    # replay across the compaction's renamed files: still a no-op
    n_sh = spark.read.parquet(f"{index_path}/shingles").count()
    q2 = neardup_stream_sink(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src),
        wh,
        index_path,
        checkpoint_dir=str(tmp_path / "ckpt2"),
        threshold=0.2,
        compact_every=1,
    )
    q2.awaitTermination(180)
    assert spark.read.parquet(f"{index_path}/shingles").count() == n_sh


def test_ann_ingest_sink_in_stream_compaction(spark, tmp_path):
    """IVF parity with the lexical sink's maintenance leg
    (compact_every): two same-distribution micro-batches with
    compact_every=1 leave the vectors half at one file per live cell,
    search through the compacted index still finds the true neighbors,
    and a fresh-checkpoint replay across the renamed files adds zero
    duplicate vectors."""
    import json
    import os

    import numpy as np

    from data_platform_spark.functions.similarity import cosine_topk
    from data_platform_spark.ops.ann_index import (
        build_ivf_index,
        ivf_search_index,
    )
    from data_platform_spark.ops.compaction import _parquet_file_count
    from data_platform_spark.pipeline import Warehouse
    from data_platform_spark.streaming.ann import (
        ann_ingest_sink,
        indexed_corpus,
        read_embeddings_stream,
    )

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(4, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    def planted(per, sigma, start_id):
        rows, vid = [], start_id
        for ci, c in enumerate(centers):
            for _ in range(per):
                v = c + sigma * rng.normal(size=64)
                v /= np.linalg.norm(v)
                rows.append((vid, ci, [float(x) for x in v]))
                vid += 1
        return rows

    initial = planted(20, 0.10, 0)
    b0 = planted(10, 0.10, 1000)
    b1 = planted(10, 0.10, 2000)

    index_path = str(tmp_path / "ivf_index")
    build_ivf_index(
        spark.createDataFrame(
            initial, "vec_id: long, label: long, embedding: array<double>"
        ),
        index_path,
        k=4,
    )

    src = str(tmp_path / "emb_stream")
    os.makedirs(src)
    for i, rows in enumerate([b0, b1]):
        with open(f"{src}/b{i}.json", "w") as f:
            for vid, lab, vec in rows:
                f.write(
                    json.dumps(
                        {"vec_id": vid, "label": lab, "embedding": vec}
                    )
                    + "\n"
                )
        os.utime(f"{src}/b{i}.json", (1_000_000 + i, 1_000_000 + i))

    wh = Warehouse(str(tmp_path / "wh"))
    q = ann_ingest_sink(
        read_embeddings_stream(spark, src, max_files_per_trigger=1),
        wh,
        index_path,
        checkpoint_dir=str(tmp_path / "ckpt"),
        compact_every=1,
    )
    q.awaitTermination(180)

    corpus = indexed_corpus(spark, index_path)
    assert corpus.count() == 80 + 40 + 40
    # one file per live cell after the final in-stream compact
    assert _parquet_file_count(f"{index_path}/vectors") <= 4

    # the compacted index still serves: recall vs exact cosine
    vecs = {r[0]: r[2] for r in initial + b0 + b1}
    qid = 2005
    qv = corpus.filter(F.col("vec_id") == qid).select(
        F.col("embedding").alias("q")
    )
    truth = {
        r.vec_id
        for r in cosine_topk(corpus, qv, k=10, exclude_ids=[qid]).collect()
    }
    got = {
        r.vec_id
        for r in ivf_search_index(
            spark, index_path, vecs[qid], nprobe=2, k=10, exclude_ids=[qid]
        ).collect()
    }
    assert len(got & truth) / 10 >= 0.8

    # replay across compaction's renamed files: zero duplicates
    q2 = ann_ingest_sink(
        read_embeddings_stream(spark, src, max_files_per_trigger=1),
        wh,
        index_path,
        checkpoint_dir=str(tmp_path / "ckpt2"),
        compact_every=1,
    )
    q2.awaitTermination(180)
    assert indexed_corpus(spark, index_path).count() == 80 + 40 + 40


def test_ivfpq_ingest_sink_appends_rebuilds_and_replays_clean(
    spark, tmp_path
):
    """The compressed-index streaming loop end-to-end: batch 0 (same
    distribution) folds into codes/ AND the raw-vector corpus dir with
    NO rebuild; batch 1 (drifted regions) crosses the PQ distortion
    threshold and retrains BOTH quantizers inside the stream — after
    the drain a drifted query's ADC top-k finds its planted twin
    through the maintained index; a full replay with a fresh checkpoint
    adds zero duplicate code rows AND zero duplicate corpus rows."""
    import json
    import os

    import numpy as np

    from data_platform_spark.ops.ivfpq_index import (
        build_ivfpq_index,
        ivfpq_search_index,
    )
    from data_platform_spark.pipeline import Warehouse
    from data_platform_spark.streaming.ann import (
        ivfpq_ingest_sink,
        read_embeddings_stream,
    )

    rng = np.random.default_rng(6)
    ca = rng.normal(size=(4, 64))
    ca /= np.linalg.norm(ca, axis=1, keepdims=True)
    cb = rng.normal(size=(8, 64))
    cb /= np.linalg.norm(cb, axis=1, keepdims=True)

    def planted(centers, per, sigma, start_id, label0):
        rows, vid = [], start_id
        for ci, c in enumerate(centers):
            for _ in range(per):
                v = c + sigma * rng.normal(size=64)
                v /= np.linalg.norm(v)
                rows.append((vid, label0 + ci, [float(x) for x in v]))
                vid += 1
        return rows

    initial = planted(ca, 40, 0.10, 0, 0)        # ids 0-159
    same = planted(ca[:2], 40, 0.10, 5000, 0)    # ids 5000-5079
    drifted = planted(cb, 40, 0.10, 1000, 100)   # ids 1000-1319

    schema = "vec_id: long, label: long, embedding: array<double>"
    seed = spark.createDataFrame(initial, schema)
    index_path = str(tmp_path / "ivfpq_index")
    corpus_path = str(tmp_path / "corpus")
    build_ivfpq_index(seed, index_path, n_cells=8)
    seed.coalesce(1).write.mode("overwrite").parquet(corpus_path)

    src = str(tmp_path / "emb_stream")
    os.makedirs(src)
    for i, rows in enumerate([same, drifted]):
        with open(f"{src}/b{i}.json", "w") as f:
            for vid, lab, vec in rows:
                f.write(
                    json.dumps(
                        {"vec_id": vid, "label": lab, "embedding": vec}
                    )
                    + "\n"
                )
        os.utime(f"{src}/b{i}.json", (1_000_000 + i, 1_000_000 + i))

    wh = Warehouse(str(tmp_path / "wh"))
    q = ivfpq_ingest_sink(
        read_embeddings_stream(spark, src, max_files_per_trigger=1),
        wh,
        index_path,
        corpus_path,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)

    ledger = wh.read(spark, "dwh", "ivfpq_index_maintenance").orderBy(
        "batch_id"
    )
    rows = ledger.collect()
    assert [r.rebuilt for r in rows] == [False, True]
    assert rows[1].ratio > 1.5

    # the maintained index finds a drifted twin via the compressed path
    twin = dict((r[0], r[2]) for r in drifted)[1007]
    got = {
        r.vec_id
        for r in ivfpq_search_index(
            spark, index_path, twin, nprobe=8, k=5, exclude_ids=[1007]
        ).collect()
    }
    assert got & set(range(1000, 1320))

    n_codes = spark.read.parquet(f"{index_path}/codes").count()
    n_corpus = spark.read.parquet(corpus_path).count()
    assert n_corpus == 160 + 80 + 320

    # full replay, fresh checkpoint: zero duplicate rows in either half
    q2 = ivfpq_ingest_sink(
        read_embeddings_stream(spark, src, max_files_per_trigger=1),
        wh,
        index_path,
        corpus_path,
        str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination(300)
    assert spark.read.parquet(f"{index_path}/codes").count() == n_codes
    assert spark.read.parquet(corpus_path).count() == n_corpus


def test_ivfpq_sink_corpus_compaction_and_marker_derived_ledger(
    spark, tmp_path
):
    """The two r10 residuals on the IVF-PQ streaming loop, end-to-end:

    1. corpus compaction (VERDICT r10 item 4) — with ``compact_every=1``
       the raw-vector cold tier rewrites to ONE flat file after each
       batch instead of accumulating one file per batch forever, and a
       full replay with a fresh checkpoint still adds ZERO duplicate
       rows to either half even though the deterministic
       ``stream-<id>-N`` corpus file targets no longer exist (the sink
       gates its corpus move on the index's done marker, not on
       target-file existence);
    2. marker-derived rebuilt flag (ADVICE r10) — the replay runs with
       a FRESH warehouse (simulating the crash window between the
       rebuild swap and the ledger upsert: the swap survived, the
       ledger row didn't) and its drift evaluation scores ≈1 against
       the rebuilt baseline, yet the replayed ledger still records
       rebuilt=True for the batch that triggered the rebuild, derived
       from the swap-published ``rebuilds/stream-1`` marker."""
    import numpy as np

    from data_platform_spark.ops import _index_io as IO
    from data_platform_spark.ops.compaction import _parquet_file_count
    from data_platform_spark.ops.ivfpq_index import build_ivfpq_index
    from data_platform_spark.pipeline import Warehouse
    from data_platform_spark.streaming.ann import (
        ivfpq_ingest_sink,
        read_embeddings_stream,
    )

    rng = np.random.default_rng(11)
    ca = rng.normal(size=(4, 64))
    ca /= np.linalg.norm(ca, axis=1, keepdims=True)
    cb = rng.normal(size=(8, 64))
    cb /= np.linalg.norm(cb, axis=1, keepdims=True)

    def planted(centers, per, sigma, start_id, label0):
        rows, vid = [], start_id
        for ci, c in enumerate(centers):
            for _ in range(per):
                v = c + sigma * rng.normal(size=64)
                v /= np.linalg.norm(v)
                rows.append((vid, label0 + ci, [float(x) for x in v]))
                vid += 1
        return rows

    initial = planted(ca, 40, 0.10, 0, 0)
    same = planted(ca[:2], 40, 0.10, 5000, 0)
    drifted = planted(cb, 40, 0.10, 1000, 100)

    schema = "vec_id: long, label: long, embedding: array<double>"
    seed = spark.createDataFrame(initial, schema)
    index_path = str(tmp_path / "ivfpq_index")
    corpus_path = str(tmp_path / "corpus")
    build_ivfpq_index(seed, index_path, n_cells=8)
    seed.coalesce(1).write.mode("overwrite").parquet(corpus_path)

    src = str(tmp_path / "emb_stream")
    os.makedirs(src)
    for i, rows in enumerate([same, drifted]):
        with open(f"{src}/b{i}.json", "w") as f:
            for vid, lab, vec in rows:
                f.write(
                    json.dumps(
                        {"vec_id": vid, "label": lab, "embedding": vec}
                    )
                    + "\n"
                )
        os.utime(f"{src}/b{i}.json", (1_000_000 + i, 1_000_000 + i))

    wh = Warehouse(str(tmp_path / "wh"))
    q = ivfpq_ingest_sink(
        read_embeddings_stream(spark, src, max_files_per_trigger=1),
        wh,
        index_path,
        corpus_path,
        str(tmp_path / "ckpt"),
        compact_every=1,
    )
    q.awaitTermination(300)

    rows = (
        wh.read(spark, "dwh", "ivfpq_index_maintenance")
        .orderBy("batch_id")
        .collect()
    )
    assert [r.rebuilt for r in rows] == [False, True]
    # the rebuild swap published its marker; the non-rebuilding batch
    # did not
    assert IO.rebuild_done(index_path, "stream-1")
    assert not IO.rebuild_done(index_path, "stream-0")

    # corpus compacted to one flat file (was: seed file + 1/batch)
    assert _parquet_file_count(corpus_path) == 1
    n_corpus = spark.read.parquet(corpus_path).count()
    n_codes = spark.read.parquet(f"{index_path}/codes").count()
    assert n_corpus == 160 + 80 + 320

    # simulate a corpus-compaction swap crashed between its two renames
    # (live dir renamed aside, stage not yet promoted): the sink must
    # heal the CORPUS at construction like it heals the index, or every
    # replayed batch dies in the drift check's corpus read
    os.rename(corpus_path, corpus_path + IO.OLD_SUFFIX)
    assert not os.path.isdir(corpus_path)

    # replay with fresh checkpoint AND fresh warehouse (the crashed-
    # ledger window): zero duplicate rows in either half, and the
    # replayed ledger still reports batch 1's rebuild via the marker
    wh2 = Warehouse(str(tmp_path / "wh2"))
    q2 = ivfpq_ingest_sink(
        read_embeddings_stream(spark, src, max_files_per_trigger=1),
        wh2,
        index_path,
        corpus_path,
        str(tmp_path / "ckpt2"),
        compact_every=1,
    )
    q2.awaitTermination(300)
    assert spark.read.parquet(corpus_path).count() == n_corpus
    assert spark.read.parquet(f"{index_path}/codes").count() == n_codes
    rows2 = (
        wh2.read(spark, "dwh", "ivfpq_index_maintenance")
        .orderBy("batch_id")
        .collect()
    )
    assert [r.rebuilt for r in rows2] == [False, True]
    # the replay's own evaluation did NOT rebuild (ratio ≈ 1 against
    # the rebuilt baseline) — True came from the marker
    assert rows2[1].ratio <= 1.5


def test_prune_rebuild_markers_numeric_window(tmp_path):
    """prune_rebuild_markers drops only stream-<n> markers strictly
    older than the given batch; non-conforming names survive (they are
    operator-written, not the sink's), and a missing rebuilds/ dir is a
    zero no-op (ADVICE r11: the carried-forward marker set must stop
    growing with stream lifetime)."""
    from data_platform_spark.ops import _index_io as IO

    idx = tmp_path / "idx"
    assert IO.prune_rebuild_markers(str(idx), 5) == 0  # no dir yet
    d = idx / IO.REBUILDS_DIR
    d.mkdir(parents=True)
    for name in ("stream-0", "stream-1", "stream-2", "stream-10",
                 "manual-retrain"):
        (d / name).write_text("ok")
    assert IO.prune_rebuild_markers(str(idx), 2) == 2  # 0 and 1
    assert sorted(os.listdir(d)) == [
        "manual-retrain", "stream-10", "stream-2"
    ]
    # idempotent; numeric compare, not lexicographic (10 > 2)
    assert IO.prune_rebuild_markers(str(idx), 2) == 0
    assert IO.prune_rebuild_markers(str(idx), 11) == 2
    assert sorted(os.listdir(d)) == ["manual-retrain"]


def test_ivfpq_sink_intent_covers_corpus_move_window(
    spark, tmp_path, monkeypatch
):
    """ADVICE r11 on the IVF-PQ sink: the append INTENT is written
    before the corpus move, so a crash between the move and the index
    append leaves a visible in-flight batch — compaction refuses to run
    over it (it would rename the deterministic corpus targets away and
    make the replay re-move, i.e. duplicate, the batch's corpus rows) —
    and the replay then completes the batch exactly once."""
    import numpy as np

    from data_platform_spark.ops import _index_io as IO
    from data_platform_spark.ops import ivfpq_index as IPQ
    from data_platform_spark.ops.compaction import compact_ivfpq_corpus
    from data_platform_spark.pipeline import Warehouse
    from data_platform_spark.streaming.ann import (
        ivfpq_ingest_sink,
        read_embeddings_stream,
    )

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(24, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    schema = "vec_id: long, label: long, embedding: array<double>"
    seed = spark.createDataFrame(
        [(i, 0, [float(x) for x in vecs[i]]) for i in range(16)], schema
    )
    index_path = str(tmp_path / "idx")
    corpus_path = str(tmp_path / "corpus")
    IPQ.build_ivfpq_index(seed, index_path, n_cells=2)
    seed.coalesce(1).write.mode("overwrite").parquet(corpus_path)

    src = str(tmp_path / "emb_stream")
    os.makedirs(src)
    with open(f"{src}/b0.json", "w") as f:
        for i in range(16, 24):
            f.write(json.dumps({
                "vec_id": i, "label": 0,
                "embedding": [float(x) for x in vecs[i]],
            }) + "\n")

    # crash the index append AFTER the corpus move
    real_append = IPQ.append_to_ivfpq_index

    def crash(*a, **k):
        raise RuntimeError("simulated crash before index append")

    monkeypatch.setattr(IPQ, "append_to_ivfpq_index", crash)
    wh = Warehouse(str(tmp_path / "wh"))
    q = ivfpq_ingest_sink(
        read_embeddings_stream(spark, src),
        wh, index_path, corpus_path, str(tmp_path / "ckpt"),
        drift_threshold=100.0,
    )
    with pytest.raises(Exception, match="simulated crash"):
        q.awaitTermination(300)

    # the corpus rows moved, but the batch is visibly IN-FLIGHT:
    # maintenance must refuse (this is the window that was blind)
    assert spark.read.parquet(corpus_path).count() == 24
    assert not IO.batch_done(index_path, "stream-0")
    with pytest.raises(RuntimeError, match="in-flight append"):
        IO.assert_no_inflight_appends(index_path)
    with pytest.raises(RuntimeError, match="in-flight append"):
        compact_ivfpq_corpus(spark, corpus_path, index_path=index_path)

    # replay with the SAME checkpoint completes the batch exactly once
    monkeypatch.setattr(IPQ, "append_to_ivfpq_index", real_append)
    q2 = ivfpq_ingest_sink(
        read_embeddings_stream(spark, src),
        wh, index_path, corpus_path, str(tmp_path / "ckpt"),
        drift_threshold=100.0,
    )
    q2.awaitTermination(300)
    assert spark.read.parquet(corpus_path).count() == 24  # no dup rows
    assert spark.read.parquet(f"{index_path}/codes").count() == 24 * 4
    assert IO.batch_done(index_path, "stream-0")
    IO.assert_no_inflight_appends(index_path)  # intent promoted


def test_semantic_dedup_stream_sink_matches_batch_ops(spark, tmp_path):
    """VERDICT r12 item 4: the streaming semantic-dedup sink equals the
    sequential batch operator (incremental_semantic_dedup +
    append_semantic_batch) run over the same micro-batches against an
    identically-built index — decision for decision, survivor for
    survivor — and a fresh-checkpoint replay of the whole stream
    changes NOTHING (completed-batch markers short-circuit)."""
    import json
    import os
    import shutil

    from data_platform_spark.ops.semantic_dedup import (
        append_semantic_batch,
        build_semantic_dedup_index,
        incremental_semantic_dedup,
    )
    from data_platform_spark.pipeline import Warehouse
    from data_platform_spark.streaming.dedup import semantic_dedup_stream_sink

    a = 0.5 ** 0.5
    standing_rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
    ]
    batch1 = [
        (10, [1.0, 0.05, 0.0, 0.0]),   # dups standing 1
        (11, [-1.0, 0.0, 0.0, 0.0]),   # novel
        (12, [0.0, -a, a, 0.0]),       # novel, intra pair with 13
        (13, [0.0, -a, a, 0.001]),     # intra-batch dup of 12 -> dropped
    ]
    batch2 = [
        (20, [-1.0, -0.05, 0.0, 0.0]),  # dups batch-1 SURVIVOR 11
        (21, [0.0, 0.0, 0.0, -1.0]),    # novel
    ]

    def _mk(rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    # ---- batch reference path
    ref_path = str(tmp_path / "sem_ref")
    build_semantic_dedup_index(_mk(standing_rows), ref_path)
    ref_decisions = {}
    for i, rows in enumerate([batch1, batch2]):
        b = _mk(rows)
        rep = incremental_semantic_dedup(spark, ref_path, b)
        for r in rep.collect():
            ref_decisions[r.vec_id] = (
                r.cell, r.n_matches_standing, r.best_cosine,
                r.best_match_id, r.keep,
            )
        append_semantic_batch(b, ref_path, rep, batch_id=f"b{i}")

    # ---- streaming path over the same micro-batches
    src = str(tmp_path / "emb_stream")
    os.makedirs(src)
    for i, rows in enumerate([batch1, batch2]):
        with open(f"{src}/b{i}.json", "w") as f:
            for vid, emb in rows:
                f.write(json.dumps({"vec_id": vid, "embedding": emb}) + "\n")
        os.utime(f"{src}/b{i}.json", (1_000_000 + i, 1_000_000 + i))
    idx_path = str(tmp_path / "sem_stream_idx")
    build_semantic_dedup_index(_mk(standing_rows), idx_path)
    wh = Warehouse(str(tmp_path / "wh"))

    def _run(ckpt):
        stream = (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        q = semantic_dedup_stream_sink(
            stream, wh, idx_path, checkpoint_dir=str(tmp_path / ckpt)
        )
        q.awaitTermination(180)

    _run("ckpt")
    got = {
        r.vec_id: (
            r.cell, r.n_matches_standing, r.best_cosine,
            r.best_match_id, r.keep,
        )
        for r in wh.read(spark, "dwh", "semantic_dedup_decisions").collect()
    }
    assert got == ref_decisions
    stream_surv = {
        r.vec_id: r.survivor
        for r in spark.read.parquet(f"{idx_path}/survivors").collect()
    }
    ref_surv = {
        r.vec_id: r.survivor
        for r in spark.read.parquet(f"{ref_path}/survivors").collect()
    }
    assert stream_surv == ref_surv
    assert spark.read.parquet(f"{idx_path}/vectors").count() == (
        spark.read.parquet(f"{ref_path}/vectors").count()
    )

    # ---- fresh-checkpoint full replay: completed markers skip, nothing
    # doubles, decisions unchanged
    n_vec = spark.read.parquet(f"{idx_path}/vectors").count()
    n_sur = spark.read.parquet(f"{idx_path}/survivors").count()
    _run("ckpt2")
    assert spark.read.parquet(f"{idx_path}/vectors").count() == n_vec
    assert spark.read.parquet(f"{idx_path}/survivors").count() == n_sur
    got2 = {
        r.vec_id: (
            r.cell, r.n_matches_standing, r.best_cosine,
            r.best_match_id, r.keep,
        )
        for r in wh.read(spark, "dwh", "semantic_dedup_decisions").collect()
    }
    assert got2 == ref_decisions
    shutil.rmtree(str(tmp_path / "ckpt2"), ignore_errors=True)


def test_manifest_join_view_stream_sink_equals_per_table(spark, tmp_path):
    """The manifest-committed join-view sink (one manifest rename per
    epoch covers BOTH ledgers) produces exactly the per-table sink's
    view and orphans over the same micro-batches, every epoch advanced
    the manifest id by one, and a fresh-checkpoint replay is a no-op
    via the atomically-committed transaction marks."""
    import os

    from pyspark.sql import functions as F

    from data_platform_spark.ops.join_view import incremental_join_view
    from data_platform_spark.ops.manifest import ManifestCatalog
    from data_platform_spark.pipeline import Warehouse
    from data_platform_spark.sources.tables import load_table
    from data_platform_spark.streaming.sink import (
        manifest_join_view_stream_sink,
    )
    from tests.conftest import SF_SMOKE

    orders = load_table(spark, SF_SMOKE, "orders").withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    cust = load_table(spark, SF_SMOKE, "customer")
    dim0 = cust.filter(F.pmod("c_custkey", F.lit(5)) != 0)
    kw = dict(
        fact_on="o_custkey",
        dim_on="c_custkey",
        fact_key="o_orderkey",
        dim_payload=["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
        partition_col="o_month",
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    batches = [
        orders.filter(F.pmod("o_orderkey", F.lit(3)) == i) for i in range(2)
    ]
    fact_schema = (
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string, o_month string"
    )
    for i, b in enumerate(batches):
        b.coalesce(1).write.mode("overwrite").json(f"{src}/b{i}")
        os.utime(f"{src}/b{i}", (1_000_000 + i, 1_000_000 + i))
        for e in os.listdir(f"{src}/b{i}"):
            os.utime(
                os.path.join(f"{src}/b{i}", e), (1_000_000 + i, 1_000_000 + i)
            )

    cat = ManifestCatalog(Warehouse(str(tmp_path / "wh_m")))
    stream = (
        spark.readStream.schema(fact_schema)
        .option("maxFilesPerTrigger", 1)
        .json(f"{src}/b*")
    )
    q = manifest_join_view_stream_sink(
        stream, cat, "dwh", "oc", dim0,
        checkpoint_dir=str(tmp_path / "ckpt1"), **kw,
    )
    q.awaitTermination(180)
    m = cat.load()
    assert m["id"] == 2 and cat.mark("jv--dwh/oc", m) == 1

    wh_b = Warehouse(str(tmp_path / "wh_b"))
    for i, b in enumerate(batches):
        incremental_join_view(
            spark, wh_b, "dwh", "oc", b, dim0, batch_id=f"b{i}", **kw
        )
    for t in ("oc", "oc__orphans"):
        a = wh_b.read(spark, "dwh", t)
        b = cat.read(spark, "dwh", t, m)
        cols = sorted(a.columns)
        assert sorted(b.columns) == cols
        assert a.select(*cols).exceptAll(b.select(*cols)).count() == 0
        assert b.select(*cols).exceptAll(a.select(*cols)).count() == 0

    # fresh-checkpoint replay: marks short-circuit both epochs
    stream2 = (
        spark.readStream.schema(fact_schema)
        .option("maxFilesPerTrigger", 1)
        .json(f"{src}/b*")
    )
    q2 = manifest_join_view_stream_sink(
        stream2, cat, "dwh", "oc", dim0,
        checkpoint_dir=str(tmp_path / "ckpt2"), **kw,
    )
    q2.awaitTermination(180)
    assert cat.load() == m


def test_join_view_stream_equals_batch(spark, tmp_path):
    """Stream-vs-batch equality for the join-view sink: the view
    maintained by streaming fact micro-batches (plus one out-of-band dim
    upsert) equals the sequential batch operator over the same batches,
    and a fresh-checkpoint full replay changes nothing (marker skips)."""
    import os

    from pyspark.sql import functions as F

    from data_platform_spark.ops.join_view import (
        _has_data,
        incremental_join_view,
        join_view_dim_upsert_persisted,
    )
    from data_platform_spark.pipeline import Warehouse
    from data_platform_spark.sources.tables import load_table
    from data_platform_spark.streaming.sink import join_view_stream_sink
    from tests.conftest import SF_SMOKE

    orders = load_table(spark, SF_SMOKE, "orders").withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    cust = load_table(spark, SF_SMOKE, "customer")
    dim0 = cust.filter(F.pmod("c_custkey", F.lit(5)) != 0)
    late = cust.filter(F.pmod("c_custkey", F.lit(5)) == 0)
    kw = dict(
        fact_on="o_custkey",
        dim_on="c_custkey",
        fact_key="o_orderkey",
        dim_payload=["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
        partition_col="o_month",
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    batches = [
        orders.filter(F.pmod("o_orderkey", F.lit(3)) == i) for i in range(3)
    ]
    fact_schema = (
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string, o_month string"
    )
    for i, b in enumerate(batches):
        b.coalesce(1).write.mode("overwrite").json(f"{src}/b{i}")
        os.utime(f"{src}/b{i}", (1_000_000 + i, 1_000_000 + i))
        for e in os.listdir(f"{src}/b{i}"):
            os.utime(
                os.path.join(f"{src}/b{i}", e), (1_000_000 + i, 1_000_000 + i)
            )

    # streaming leg
    wh_s = Warehouse(str(tmp_path / "wh_s"))
    stream = (
        spark.readStream.schema(fact_schema)
        .option("maxFilesPerTrigger", 1)
        .json(f"{src}/b*")
    )
    q = join_view_stream_sink(
        stream, wh_s, "dwh", "oc", dim0,
        checkpoint_dir=str(tmp_path / "ckpt1"), **kw,
    )
    q.awaitTermination(180)
    join_view_dim_upsert_persisted(
        spark, wh_s, "dwh", "oc", late, batch_id="dim-0", **kw
    )

    # batch leg: same batches, same order, same ops
    wh_b = Warehouse(str(tmp_path / "wh_b"))
    # json round-trips timestamps as strings; align the batch leg to the
    # streamed dtypes by reading the same files
    for i in range(3):
        b = spark.read.schema(fact_schema).json(f"{src}/b{i}")
        incremental_join_view(
            spark, wh_b, "dwh", "oc", b, dim0, batch_id=f"b{i}", **kw
        )
    join_view_dim_upsert_persisted(
        spark, wh_b, "dwh", "oc", late, batch_id="dim-0", **kw
    )

    vs = wh_s.read(spark, "dwh", "oc")
    vb = wh_b.read(spark, "dwh", "oc")
    cols = sorted(vs.columns)
    assert vs.count() == vb.count() > 0
    assert vs.select(*cols).exceptAll(vb.select(*cols)).count() == 0
    assert vb.select(*cols).exceptAll(vs.select(*cols)).count() == 0
    orph_equal = _has_data(wh_s, "dwh", "oc__orphans", "o_month") == _has_data(
        wh_b, "dwh", "oc__orphans", "o_month"
    )
    assert orph_equal

    # fresh-checkpoint full replay: markers make every batch a no-op
    before = vs.count()
    stream2 = (
        spark.readStream.schema(fact_schema)
        .option("maxFilesPerTrigger", 1)
        .json(f"{src}/b*")
    )
    q2 = join_view_stream_sink(
        stream2, wh_s, "dwh", "oc", dim0,
        checkpoint_dir=str(tmp_path / "ckpt2"), **kw,
    )
    q2.awaitTermination(180)
    after = wh_s.read(spark, "dwh", "oc")
    assert after.count() == before
    assert after.select(*cols).exceptAll(vb.select(*cols)).count() == 0


def test_scd2_join_view_stream_equals_batch(spark, tmp_path):
    """Stream-vs-batch equality for the SCD2 join-view sink: streamed
    fact micro-batches against the open version table, one out-of-band
    SCD2 dim batch (mod-7 close+reopen at the cutoff), equals the
    sequential batch operator over the same files; a fresh-checkpoint
    full replay changes nothing."""
    import datetime
    import os

    from pyspark.sql import functions as F

    from data_platform_spark.ops.scd2_join_view import (
        incremental_scd2_join_view,
        scd2_join_view_dim_persisted,
    )
    from data_platform_spark.pipeline import Warehouse
    from data_platform_spark.sources.tables import load_table
    from data_platform_spark.streaming.sink import scd2_join_view_stream_sink
    from tests.conftest import SF_SMOKE
    from tests.test_incremental import _scd2_versions

    orders = load_table(spark, SF_SMOKE, "orders").withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    cust = load_table(spark, SF_SMOKE, "customer")
    v0 = _scd2_versions(cust, include_mod5=True, closed=False)
    v1 = _scd2_versions(cust, include_mod5=True, closed=True)
    touched = cust.filter(
        (F.pmod("c_custkey", F.lit(7)) == 0)
        | (F.pmod("c_custkey", F.lit(11)) == 0)
    ).select("c_custkey")
    cut = datetime.datetime(1998, 1, 1)
    kw = dict(
        fact_on="o_custkey",
        dim_on="c_custkey",
        fact_key="o_orderkey",
        event_col="o_orderdate",
        dim_payload=["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
        partition_col="o_month",
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    batches = [
        orders.filter(F.pmod("o_orderkey", F.lit(3)) == i) for i in range(3)
    ]
    fact_schema = (
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string, o_month string"
    )
    for i, b in enumerate(batches):
        b.coalesce(1).write.mode("overwrite").json(f"{src}/b{i}")
        os.utime(f"{src}/b{i}", (1_000_000 + i, 1_000_000 + i))
        for e in os.listdir(f"{src}/b{i}"):
            os.utime(
                os.path.join(f"{src}/b{i}", e), (1_000_000 + i, 1_000_000 + i)
            )

    # streaming leg: micro-batches against v0, then the SCD2 dim batch
    wh_s = Warehouse(str(tmp_path / "wh_s"))
    stream = (
        spark.readStream.schema(fact_schema)
        .option("maxFilesPerTrigger", 1)
        .json(f"{src}/b*")
    )
    q = scd2_join_view_stream_sink(
        stream, wh_s, "dwh", "oc2", v0,
        checkpoint_dir=str(tmp_path / "ckpt1"), **kw,
    )
    q.awaitTermination(180)
    scd2_join_view_dim_persisted(
        spark, wh_s, "dwh", "oc2", v1, touched, cut, batch_id="d0", **kw
    )

    # batch leg: identical files, identical order
    wh_b = Warehouse(str(tmp_path / "wh_b"))
    for i in range(3):
        b = spark.read.schema(fact_schema).json(f"{src}/b{i}")
        incremental_scd2_join_view(
            spark, wh_b, "dwh", "oc2", b, v0, batch_id=f"b{i}", **kw
        )
    scd2_join_view_dim_persisted(
        spark, wh_b, "dwh", "oc2", v1, touched, cut, batch_id="d0", **kw
    )

    vs = wh_s.read(spark, "dwh", "oc2")
    vb = wh_b.read(spark, "dwh", "oc2")
    cols = sorted(vs.columns)
    assert vs.count() == vb.count() > 0
    assert vs.select(*cols).exceptAll(vb.select(*cols)).count() == 0
    assert vb.select(*cols).exceptAll(vs.select(*cols)).count() == 0
    os_ = wh_s.read(spark, "dwh", "oc2__orphans")
    ob = wh_b.read(spark, "dwh", "oc2__orphans")
    ocols = sorted(os_.columns)
    assert os_.count() == ob.count() > 0
    assert os_.select(*ocols).exceptAll(ob.select(*ocols)).count() == 0

    # fresh-checkpoint full replay: namespaced markers skip every batch
    before = vs.count()
    stream2 = (
        spark.readStream.schema(fact_schema)
        .option("maxFilesPerTrigger", 1)
        .json(f"{src}/b*")
    )
    q2 = scd2_join_view_stream_sink(
        stream2, wh_s, "dwh", "oc2", v0,
        checkpoint_dir=str(tmp_path / "ckpt2"), **kw,
    )
    q2.awaitTermination(180)
    after = wh_s.read(spark, "dwh", "oc2")
    assert after.count() == before
    assert after.select(*cols).exceptAll(vb.select(*cols)).count() == 0
