"""End-to-end pipeline: fixtures → raw → stg → dwh; rerun idempotency;
mutate-rerun SCD2 + fact incrementality (SURVEY.md §5.2.2)."""

from __future__ import annotations

import json
from datetime import datetime

import pytest

from data_platform_spark.pipeline import Warehouse, run_pipeline
from data_platform_spark.schemas import RAW_SCHEMA
from tests.fixtures import base_universe, mutated_universe

TS1 = datetime(2026, 1, 1, 12, 0, 0)
TS2 = datetime(2026, 2, 1, 12, 0, 0)
TS3 = datetime(2026, 3, 1, 12, 0, 0)


def _bronze(spark, entities, ts):
    rows = [(e["id"], json.dumps(e, sort_keys=True), ts) for e in entities]
    return spark.createDataFrame(rows, RAW_SCHEMA)


def _bronze_all(spark, universe, ts):
    chars, locs, eps = universe
    return {
        "character": _bronze(spark, chars, ts),
        "location": _bronze(spark, locs, ts),
        "episode": _bronze(spark, eps, ts),
    }


@pytest.fixture()
def wh(tmp_path):
    return Warehouse(str(tmp_path / "warehouse"))


def _state(spark, wh):
    out = {}
    for schema, table in [
        ("stg", "character"), ("stg", "location"), ("stg", "episode"),
        ("dwh", "dim_character"), ("dwh", "dim_location"),
        ("dwh", "dim_episode"), ("dwh", "fact_char_ep"),
        ("dwh", "fact_char_loc"),
    ]:
        df = wh.read(spark, schema, table)
        out[f"{schema}.{table}"] = sorted(
            tuple(r) for r in df.collect()
        ) if df is not None else None
    return out


def test_full_pipeline_and_idempotency(spark, wh):
    run_pipeline(spark, wh, _bronze_all(spark, base_universe(), TS1), TS1)

    # staging normalized
    stg_ch = wh.read(spark, "stg", "character")
    assert stg_ch.count() == 5
    # guarded date parse: ep 3 'unknown' -> NULL
    ep = {r["id"]: r for r in wh.read(spark, "stg", "episode").collect()}
    assert ep[3]["air_date"] is None
    assert str(ep[1]["air_date"]) == "2013-12-02"

    # dims: all current on first load; Unknown member present
    dim_loc = wh.read(spark, "dwh", "dim_location")
    unk = dim_loc.filter("location_id = -1").collect()
    assert len(unk) == 1 and unk[0]["name"] == "Unknown"
    dim_ch = wh.read(spark, "dwh", "dim_character")
    assert dim_ch.filter("is_current").count() == 5

    # fact_char_ep: union-dedup of both sides
    # char1-(ep1,ep2), char2-ep1, char3-ep2, char4-ep3, char5-(ep2,ep3) = 7 edges
    fce = wh.read(spark, "dwh", "fact_char_ep")
    assert fce.count() == 7

    # fact_char_loc: char3 has NULL urls -> resolves to Unknown (-1)
    fcl = wh.read(spark, "dwh", "fact_char_loc")
    dim_loc_cur = {r["location_sk"]: r["location_id"]
                   for r in dim_loc.filter("is_current").collect()}
    dim_ch_cur = {r["character_sk"]: r["character_id"]
                  for r in dim_ch.filter("is_current").collect()}
    char3_rows = [
        r for r in fcl.collect() if dim_ch_cur[r["character_sk"]] == 3
    ]
    assert char3_rows and all(
        dim_loc_cur[r["location_sk"]] == -1 for r in char3_rows
    )

    # rerun with identical input at a later ts: state unchanged
    before = _state(spark, wh)
    run_pipeline(spark, wh, _bronze_all(spark, base_universe(), TS2), TS2)
    after = _state(spark, wh)
    assert before == after


def test_mutate_rerun_scd2_and_fact_increment(spark, wh):
    run_pipeline(spark, wh, _bronze_all(spark, base_universe(), TS1), TS1)
    fce_before = wh.read(spark, "dwh", "fact_char_ep").count()

    run_pipeline(spark, wh, _bronze_all(spark, mutated_universe(), TS2), TS2)

    dim_ch = wh.read(spark, "dwh", "dim_character")
    # char 1: exactly one closed + one opened version
    v1 = sorted(
        dim_ch.filter("character_id = 1").collect(),
        key=lambda r: r["valid_from"],
    )
    assert len(v1) == 2
    assert not v1[0]["is_current"] and v1[0]["status"] == "Alive"
    assert v1[1]["is_current"] and v1[1]["status"] == "Dead"
    assert v1[0]["valid_to"] == v1[1]["valid_from"] == TS2

    # char 3: type ''->'Clone' also versioned
    assert dim_ch.filter("character_id = 3").count() == 2

    # unchanged chars: single version
    assert dim_ch.filter("character_id = 2").count() == 1

    # facts: edges unchanged in the mutation, but char1/char3 got NEW SKs
    # -> fact gains rows for the new SKs (reference semantics: fact keyed
    # by SK, old rows remain, dags/dwh_fact_character_episode.py:103-107)
    fce_after = wh.read(spark, "dwh", "fact_char_ep").count()
    assert fce_after > fce_before

    # invariants after mutation
    dup_cur = dim_ch.filter("is_current").groupBy("character_id").count().filter(
        "count > 1"
    )
    assert dup_cur.count() == 0

    # third run, no change: fully stable
    before = _state(spark, wh)
    run_pipeline(spark, wh, _bronze_all(spark, mutated_universe(), TS3), TS3)
    assert before == _state(spark, wh)


def test_datamart_and_as_of(spark, wh):
    from data_platform_spark.ops import dim_as_of

    run_pipeline(spark, wh, _bronze_all(spark, base_universe(), TS1), TS1)
    run_pipeline(spark, wh, _bronze_all(spark, mutated_universe(), TS2), TS2)

    # datamart: episode counts match the fixture edge sets
    cec = {r["character_id"]: r["n_episodes"]
           for r in wh.read(spark, "datamart", "character_episode_counts").collect()}
    assert cec[1] == 2 and cec[2] == 1 and cec[5] == 2

    # location population: 'last'-role residents; Unknown holds char 3
    pop = {r["location_id"]: r["n_residents"]
           for r in wh.read(spark, "datamart", "location_population").collect()}
    assert pop[-1] >= 1  # char 3 lives at the Unknown member

    # status summary over current versions: char1 flipped to Dead in run 2
    ss = {r["status"]: r["n_characters"]
          for r in wh.read(spark, "datamart", "status_summary").collect()}
    assert ss["Dead"] == 2 and ss["Alive"] == 3

    # point-in-time: as of TS1 char 1 was Alive; as of TS2 it is Dead
    dim_ch = wh.read(spark, "dwh", "dim_character")
    as_of_1 = {r["character_id"]: r["status"]
               for r in dim_as_of(dim_ch, TS1).collect()}
    as_of_2 = {r["character_id"]: r["status"]
               for r in dim_as_of(dim_ch, TS2).collect()}
    assert as_of_1[1] == "Alive" and as_of_2[1] == "Dead"
    # exactly one version per business key at any point in time
    assert len(as_of_1) == 5 and len(as_of_2) == 5


def test_warehouse_partitioned_write(spark, wh):
    import os
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "2026-01-01", "a"), (2, "2026-01-01", "b"), (3, "2026-01-02", "c")],
        "id int, load_date string, v string",
    )
    wh.write(df, "raw", "partitioned_demo", partition_by=["load_date"])
    root = wh.path("raw", "partitioned_demo")
    assert sorted(
        d for d in os.listdir(root) if d.startswith("load_date=")
    ) == ["load_date=2026-01-01", "load_date=2026-01-02"]
    back = wh.read(spark, "raw", "partitioned_demo")
    assert back.count() == 3
    # partition pruning: only one partition's files scanned for this filter
    pruned = back.filter(F.col("load_date") == "2026-01-02")
    assert pruned.count() == 1
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "partition" in plan.lower() or pruned.count() == 1


def test_corrupt_payload_rows_dropped(spark, wh):
    """Malformed JSON and key-less payloads must not reach staging."""
    from pyspark.sql import functions as F

    chars, locs, eps = base_universe()
    bronze = _bronze_all(spark, (chars, locs, eps), TS1)
    garbage = spark.createDataFrame(
        [
            (9001, "{not valid json", TS1),
            (9002, '{"name": "keyless"}', TS1),
        ],
        RAW_SCHEMA,
    )
    bronze["character"] = bronze["character"].unionByName(garbage)
    run_pipeline(spark, wh, bronze, TS1)

    stg_ch = wh.read(spark, "stg", "character")
    assert stg_ch.count() == 5  # only the 5 valid characters
    assert stg_ch.filter(F.col("id").isNull()).count() == 0
    dim = wh.read(spark, "dwh", "dim_character")
    assert dim.filter(F.col("character_id").isNull()).count() == 0


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key must join with NO exchange on
    either side (the co-location contract bucketing exists for)."""
    from pyspark.sql import functions as F

    from data_platform_spark.pipeline import BucketedWarehouse
    from data_platform_spark.sources.tables import load_table

    bw = BucketedWarehouse(spark, database="dps_test", location=str(tmp_path / "bucketed_db"))
    sf = "/root/testdata/sf0.001"
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    bw.write_bucketed(orders, "orders_b", ["o_orderkey"], 8)
    bw.write_bucketed(li, "lineitem_b", ["l_orderkey"], 8)

    o = bw.read("orders_b")
    l = bw.read("lineitem_b")
    # disable broadcast so the join strategy is the bucketed sort-merge
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = o.join(l, o.o_orderkey == l.l_orderkey).groupBy(
            "o_orderstatus"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join inputs are bucket-local: no Exchange below the join
        join_part = plan.split("SortMergeJoin")[-1]
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        # result still correct
        got = {r["o_orderstatus"]: r["n"] for r in joined.collect()}
        want = {
            r["o_orderstatus"]: r["n"]
            for r in orders.join(li, orders.o_orderkey == li.l_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_warehouse_swap_preserves_state_on_failure(spark, wh):
    """O2 atomicity: a failing write must leave the previous table state
    untouched (write-temp-then-swap never mutates in place)."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    good = spark.createDataFrame([(1, "ok")], "id int, v string")
    wh.write(good, "stg", "swap_demo")

    @F.udf(T.StringType())
    def boom(v):
        raise RuntimeError("simulated mid-write failure")

    bad = good.withColumn("v", boom(F.col("v")))
    with pytest.raises(Exception):
        wh.write(bad, "stg", "swap_demo")

    back = wh.read(spark, "stg", "swap_demo")
    assert [tuple(r) for r in back.collect()] == [(1, "ok")]


def test_warehouse_recover_rolls_back_interrupted_swap(spark, wh):
    """Crash between rename(final, old) and rename(tmp, final) leaves the
    table ABSENT with a surviving .old-*; recover() must restore it rather
    than let the next run silently first-load."""
    import os
    import shutil

    df = spark.createDataFrame([(1, "v1")], "id int, v string")
    wh.write(df, "dwh", "crash_demo")
    final = wh.path("dwh", "crash_demo")

    # simulate the mid-swap crash state
    os.rename(final, f"{final}.old-deadbeef")
    os.makedirs(f"{final}.tmp-cafe0000")  # stale staging dir too

    wh2 = Warehouse(wh.root)  # fresh startup runs recovery
    assert wh2.exists("dwh", "crash_demo")
    assert not os.path.isdir(f"{final}.tmp-cafe0000")
    back = wh2.read(spark, "dwh", "crash_demo")
    assert [tuple(r) for r in back.collect()] == [(1, "v1")]


def test_warehouse_recover_sweeps_completed_swap_leftovers(spark, wh):
    """Crash after the swap completed but before old-dir cleanup: the
    .old-* must be garbage-collected, final state untouched."""
    import os

    df = spark.createDataFrame([(2, "v2")], "id int, v string")
    wh.write(df, "dwh", "leftover_demo")
    final = wh.path("dwh", "leftover_demo")
    os.makedirs(f"{final}.old-feedf00d")

    wh2 = Warehouse(wh.root)
    assert not os.path.isdir(f"{final}.old-feedf00d")
    back = wh2.read(spark, "dwh", "leftover_demo")
    assert [tuple(r) for r in back.collect()] == [(2, "v2")]


def test_link_tables_preserve_loaded_at_across_reruns(spark, wh):
    """Reference parity (ON CONFLICT DO NOTHING / conditional update):
    rerunning the pipeline must NOT bump link-table loaded_at for rows
    that already existed."""
    run_pipeline(spark, wh, _bronze_all(spark, base_universe(), TS1), TS1)
    first = {
        (r["id"], r["url"]): r["loaded_at"]
        for r in wh.read(spark, "stg", "episode_ch").collect()
    }
    assert first and all(ts == TS1 for ts in first.values())

    run_pipeline(spark, wh, _bronze_all(spark, base_universe(), TS2), TS2)
    second = {
        (r["id"], r["url"]): r["loaded_at"]
        for r in wh.read(spark, "stg", "episode_ch").collect()
    }
    assert second == first  # identical input -> loaded_at untouched

    # location_ch (conditional-update PK (id, role)): same invariant, and
    # last_upd_at also untouched when nothing changed
    lch = wh.read(spark, "stg", "location_ch").collect()
    assert all(r["loaded_at"] == TS1 and r["last_upd_at"] == TS1 for r in lch)


def test_warehouse_concurrent_writers_keep_state_consistent(spark, wh):
    """Racing writers must serialize on the table lock: the final state is
    ONE writer's complete output (never a torn mix), every reader between
    writes sees a complete table, and no stray swap dirs remain."""
    import os
    import threading

    dfs = {
        v: spark.createDataFrame(
            [(i, v) for i in range(50)], "id int, version string"
        )
        for v in ("alpha", "beta", "gamma", "delta")
    }
    errors = []

    def _write(version):
        try:
            for _ in range(3):
                wh.write(dfs[version], "dwh", "race_demo")
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=_write, args=(v,)) for v in dfs]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert not errors
    rows = wh.read(spark, "dwh", "race_demo").collect()
    versions = {r["version"] for r in rows}
    assert len(versions) == 1 and len(rows) == 50  # one complete dataset
    sdir = os.path.join(wh.root, "dwh")
    stray = [d for d in os.listdir(sdir) if ".tmp-" in d or ".old-" in d]
    assert stray == []


def _merge_demo_table(spark, wh, table="merge_demo"):
    """4-date partitioned table for the pruned-merge tests."""
    rows = [
        (i, f"2026-0{1 + i % 4}-01", f"v{i}") for i in range(20)
    ]
    df = spark.createDataFrame(rows, "id int, pdate string, v string")
    wh.write(df, "dwh", table, partition_by=["pdate"])
    return {(r["id"]): (r["pdate"], r["v"]) for r in rows_as(spark, wh, table)}


def rows_as(spark, wh, table):
    return wh.read(spark, "dwh", table).collect()


def _part_files(wh, table):
    import os

    base = wh.path("dwh", table)
    out = {}
    for dirpath, _d, files in os.walk(base):
        for fn in files:
            if fn.endswith(".parquet"):
                rel = os.path.relpath(dirpath, base)
                full = os.path.join(dirpath, fn)
                out.setdefault(rel, []).append((fn, os.path.getmtime(full)))
    return {k: sorted(v) for k, v in out.items()}


def test_merge_rewrites_only_affected_partitions(spark, wh):
    """Pruned MERGE: update 1 partition + insert a new one; the other
    3 partition dirs must be byte-for-byte untouched (same files, same
    mtimes) — the 100 TB property: cost ∝ touched partitions."""
    _merge_demo_table(spark, wh)
    before = _part_files(wh, "merge_demo")

    updates = spark.createDataFrame(
        [
            (0, "2026-01-01", "v0-updated"),   # update existing key
            (100, "2026-01-01", "v100-new"),   # insert into existing part
            (200, "2026-05-01", "v200-new"),   # brand-new partition
        ],
        "id int, pdate string, v string",
    )
    touched = wh.merge(spark, "dwh", "merge_demo", updates, ["id"], "pdate")
    assert touched == ["pdate=2026-01-01", "pdate=2026-05-01"]

    after = _part_files(wh, "merge_demo")
    for part in ("pdate=2026-02-01", "pdate=2026-03-01", "pdate=2026-04-01"):
        assert after[part] == before[part]  # identical files AND mtimes

    got = {
        r["id"]: (str(r["pdate"]), r["v"])
        for r in rows_as(spark, wh, "merge_demo")
    }
    assert got[0] == ("2026-01-01", "v0-updated")
    assert got[100] == ("2026-01-01", "v100-new")
    assert got[200] == ("2026-05-01", "v200-new")
    assert len(got) == 22 and got[1] == ("2026-02-01", "v1")


def test_merge_deletes_and_drops_emptied_partition(spark, wh):
    """WHEN MATCHED DELETE: deleting every row of a partition removes the
    partition dir entirely (no residual empty dir shadowing the delete)."""
    import os

    _merge_demo_table(spark, wh)
    # partition 2026-04-01 holds ids 3,7,11,15,19 — delete them all, and
    # one row from 2026-01-01
    dels = [(i, f"2026-0{1 + i % 4}-01", None, True) for i in (3, 7, 11, 15, 19)]
    updates = spark.createDataFrame(
        dels + [(4, "2026-01-01", None, True), (8, "2026-01-01", "v8-upd", False)],
        "id int, pdate string, v string, is_deleted boolean",
    )
    wh.merge(
        spark, "dwh", "merge_demo", updates, ["id"], "pdate",
        delete_col="is_deleted",
    )
    got = {r["id"]: r["v"] for r in rows_as(spark, wh, "merge_demo")}
    assert set(got) == set(range(20)) - {3, 7, 11, 15, 19, 4}
    assert got[8] == "v8-upd"
    assert not os.path.isdir(
        os.path.join(wh.path("dwh", "merge_demo"), "pdate=2026-04-01")
    )


def test_merge_journal_rollback_restores_premerge_state(spark, wh):
    """A merge interrupted mid-swap (journal still on disk) must roll back
    to the EXACT pre-merge state on the next startup — atomic-or-nothing
    across all touched partitions, not per-partition torn state."""
    import json as _json
    import os

    _merge_demo_table(spark, wh)
    pre = sorted(tuple(r) for r in rows_as(spark, wh, "merge_demo"))
    final = wh.path("dwh", "merge_demo")

    # Simulate the torn mid-merge crash state by hand: partition
    # 2026-01-01 already swapped to new data, 2026-02-01 renamed away but
    # its replacement not yet moved in, journal present.
    tmp = f"{final}.tmp-cafe1234"
    os.makedirs(tmp, exist_ok=True)
    new1 = spark.createDataFrame(
        [(999, "TORN")], "id int, v string"
    )
    p1, p2 = os.path.join(final, "pdate=2026-01-01"), os.path.join(
        final, "pdate=2026-02-01"
    )
    os.rename(p1, f"{p1}.old-aaaa1111")
    new1.write.parquet(p1)
    os.rename(p2, f"{p2}.old-bbbb2222")
    journal = {
        "table": "merge_demo",
        "tmp": tmp,
        "swaps": [
            {"part": "pdate=2026-01-01", "old": "pdate=2026-01-01.old-aaaa1111",
             "had_old": True, "in_tmp": True},
            {"part": "pdate=2026-02-01", "old": "pdate=2026-02-01.old-bbbb2222",
             "had_old": True, "in_tmp": True},
        ],
    }
    with open(os.path.join(wh.root, "dwh", ".merge-journal-dead0001"), "w") as f:
        _json.dump(journal, f)

    wh2 = Warehouse(wh.root)  # startup recovery
    post = sorted(tuple(r) for r in rows_as(spark, wh2, "merge_demo"))
    assert post == pre
    assert not os.path.isdir(tmp)
    assert not os.path.exists(
        os.path.join(wh.root, "dwh", ".merge-journal-dead0001")
    )


def test_compact_reduces_file_count(spark, wh):
    """OPTIMIZE analog: a fragmented table (40 files) compacts to the
    byte-sized target with identical contents."""
    df = spark.createDataFrame(
        [(i, "x" * 100) for i in range(2000)], "id int, payload string"
    ).repartition(40)
    wh.write(df, "dwh", "frag_demo")
    pre = sorted(tuple(r) for r in rows_as(spark, wh, "frag_demo"))

    before, after = wh.compact(spark, "dwh", "frag_demo")
    assert before >= 40 and after <= 4
    post = sorted(tuple(r) for r in rows_as(spark, wh, "frag_demo"))
    assert post == pre


def test_merge_order_col_newest_wins(spark, wh):
    """order_col mode: a stale replay (older order_col) must not regress
    a newer existing row; newer batch rows replace; in-batch duplicate
    keys resolve to the newest."""
    base = spark.createDataFrame(
        [(1, "2026-01-01", "v1", 10), (2, "2026-01-01", "v2", 10)],
        "id int, pdate string, v string, seq int",
    )
    wh.merge(spark, "dwh", "ord_demo", base, ["id"], "pdate", order_col="seq")

    updates = spark.createDataFrame(
        [
            (1, "2026-01-01", "v1-stale", 5),    # older -> must lose
            (2, "2026-01-01", "v2-new", 20),     # newer -> must win
            (3, "2026-01-01", "v3-a", 7),        # in-batch dup key...
            (3, "2026-01-01", "v3-b", 9),        # ...newest survives
        ],
        "id int, pdate string, v string, seq int",
    )
    wh.merge(spark, "dwh", "ord_demo", updates, ["id"], "pdate", order_col="seq")
    got = {r["id"]: (r["v"], r["seq"]) for r in rows_as(spark, wh, "ord_demo")}
    assert got == {1: ("v1", 10), 2: ("v2-new", 20), 3: ("v3-b", 9)}


def test_merge_schema_evolution(spark, wh):
    """allow_new_columns: a batch with an extra column widens the table
    (old rows NULL); a later batch missing that column is NULL-filled;
    strict mode keeps projecting unknown columns away."""
    from pyspark.sql import functions as F

    base = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30)], "id: long, day: string, v: long"
    )
    wh.write(base, "raw", "evo", partition_by=["day"])

    widened = spark.createDataFrame(
        [(2, "a", 21, "new"), (4, "a", 40, "new")],
        "id: long, day: string, v: long, tag: string",
    )
    wh.merge(spark, "raw", "evo", widened, keys=["id"], partition_col="day",
             allow_new_columns=True)
    out = wh.read(spark, "raw", "evo")
    assert set(out.columns) == {"id", "day", "v", "tag"}
    rows = {r.id: (r.v, r.tag) for r in out.collect()}
    # day=b partition untouched on disk; mergeSchema read still shows tag
    assert rows == {1: (10, None), 2: (21, "new"), 3: (30, None), 4: (40, "new")}

    narrow = spark.createDataFrame([(5, "a", 50)], "id: long, day: string, v: long")
    wh.merge(spark, "raw", "evo", narrow, keys=["id"], partition_col="day",
             allow_new_columns=True)
    rows = {r.id: (r.v, r.tag) for r in wh.read(spark, "raw", "evo").collect()}
    assert rows[5] == (50, None) and rows[2] == (21, "new")

    # strict mode: unknown batch columns are projected away, not added
    # (and a batch MISSING a table column fails analysis loudly)
    stray = spark.createDataFrame(
        [(6, "a", 60, "t6", "zzz")],
        "id: long, day: string, v: long, tag: string, stray: string",
    )
    wh.merge(spark, "raw", "evo", stray, keys=["id"], partition_col="day")
    out = wh.read(spark, "raw", "evo")
    assert "stray" not in out.columns
    assert {r.id for r in out.collect()} == {1, 2, 3, 4, 5, 6}


def test_warehouse_snapshot_retention_and_time_travel(spark, tmp_path):
    """retain_versions keeps the replaced table directory as a numbered
    snapshot: three overwrites with retention 2 leave the current table
    plus the two newest snapshots (oldest pruned), each time-travel
    readable with its exact historical content; recovery scanning
    ignores the .vN dirs."""
    from data_platform_spark.pipeline import Warehouse

    wh = Warehouse(str(tmp_path / "wh"), retain_versions=2)

    def write_gen(gen: int):
        df = spark.createDataFrame(
            [(i, f"gen{gen}") for i in range(5)], "id int, v string"
        )
        wh.write(df, "dwh", "snap_t")

    write_gen(1)
    assert wh.versions("dwh", "snap_t") == []  # first write: nothing replaced
    write_gen(2)
    assert wh.versions("dwh", "snap_t") == [1]
    write_gen(3)
    assert wh.versions("dwh", "snap_t") == [1, 2]
    write_gen(4)
    # retention 2: v1 pruned, v2/v3 kept
    assert wh.versions("dwh", "snap_t") == [2, 3]

    assert (
        wh.read(spark, "dwh", "snap_t").select("v").distinct().collect()[0][0]
        == "gen4"
    )
    assert (
        wh.read_version(spark, "dwh", "snap_t", 2)
        .select("v").distinct().collect()[0][0]
        == "gen2"
    )
    assert (
        wh.read_version(spark, "dwh", "snap_t", 3)
        .select("v").distinct().collect()[0][0]
        == "gen3"
    )
    import pytest as _pt

    with _pt.raises(FileNotFoundError, match="no retained version 1"):
        wh.read_version(spark, "dwh", "snap_t", 1)

    # recovery must not mistake snapshot dirs for crashed swaps
    assert Warehouse(str(tmp_path / "wh"), retain_versions=2).versions(
        "dwh", "snap_t"
    ) == [2, 3]


def test_corpus_version_diff_classifies_all_transitions(spark, tmp_path):
    """Snapshot diff over time-travel reads: write v1, overwrite with a
    mutated corpus, diff the retained snapshot against the current table
    — every transition class (added/removed/changed/unchanged) must come
    out exactly."""
    from data_platform_spark.ops.core import corpus_version_diff
    from data_platform_spark.pipeline import Warehouse

    wh = Warehouse(str(tmp_path / "wh"), retain_versions=1)
    v1 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "doc_id int, text string"
    )
    wh.write(v1, "dwh", "corpus")
    v2 = spark.createDataFrame(
        [(1, "alpha"), (2, "BETA2"), (4, "delta")], "doc_id int, text string"
    )
    wh.write(v2, "dwh", "corpus")

    old = wh.read_version(spark, "dwh", "corpus", 1)
    new = wh.read(spark, "dwh", "corpus")
    got = {
        r.doc_id: r.status
        for r in corpus_version_diff(old, new, "doc_id", ["text"]).collect()
    }
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_corpus_version_diff_distinguishes_nulls(spark):
    """concat_ws drops NULL args, so without a sentinel a NULL↔'' flip or
    a value sliding between adjacent columns across a NULL hashes
    identically and a changed row would read 'unchanged'. Both shapes
    must classify as 'changed'; a truly identical NULL pattern stays
    'unchanged'."""
    from data_platform_spark.ops.core import corpus_version_diff

    schema = "doc_id int, a string, b string"
    old = spark.createDataFrame(
        [
            (1, None, "x"),   # NULL → ''  (same concat without sentinel)
            (2, None, "v"),   # value slides a←b across the NULL
            (3, None, "same"),
        ],
        schema,
    )
    new = spark.createDataFrame(
        [
            (1, "", "x"),
            (2, "v", None),
            (3, None, "same"),
        ],
        schema,
    )
    got = {
        r.doc_id: r.status
        for r in corpus_version_diff(old, new, "doc_id", ["a", "b"]).collect()
    }
    assert got == {1: "changed", 2: "changed", 3: "unchanged"}


def test_warehouse_recover_promotes_orphan_old_to_snapshot(spark, tmp_path):
    """With retention on, a crash after rename(tmp, final) but before the
    .old-* → .vN promotion must NOT garbage-collect the .old-* (that
    silently drops a snapshot retention promised to keep): recovery
    promotes it to the next version instead."""
    import os

    from data_platform_spark.pipeline import Warehouse

    wh = Warehouse(str(tmp_path / "wh"), retain_versions=2)
    wh.write(
        spark.createDataFrame([(1, "gen1")], "id int, v string"),
        "dwh",
        "promo_t",
    )
    wh.write(
        spark.createDataFrame([(1, "gen2")], "id int, v string"),
        "dwh",
        "promo_t",
    )
    assert wh.versions("dwh", "promo_t") == [1]
    final = wh.path("dwh", "promo_t")

    # simulate the crash window: v2 content sits in an orphaned .old-*
    # while the final dir already holds gen3
    os.rename(final, f"{final}.old-0badc0de")
    wh.write(
        spark.createDataFrame([(1, "gen3")], "id int, v string"),
        "dwh",
        "promo_t",
    )
    # the fresh write found no final dir (we renamed it away), so no new
    # version was cut; the orphan still holds gen2's successor state
    assert os.path.isdir(f"{final}.old-0badc0de")

    wh2 = Warehouse(str(tmp_path / "wh"), retain_versions=2)
    assert not os.path.isdir(f"{final}.old-0badc0de")
    assert wh2.versions("dwh", "promo_t") == [1, 2]
    assert (
        wh2.read_version(spark, "dwh", "promo_t", 2)
        .select("v").collect()[0][0]
        == "gen2"
    )
    assert (
        wh2.read(spark, "dwh", "promo_t").select("v").collect()[0][0]
        == "gen3"
    )
