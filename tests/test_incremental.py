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


def _jv_mutated_cust(cust):
    from pyspark.sql import functions as F

    bal = F.col("c_acctbal") + F.when(
        F.pmod("c_custkey", F.lit(7)) == 0, F.lit(100.0)
    ).otherwise(F.lit(0.0))
    seg = F.when(
        F.pmod("c_custkey", F.lit(7)) == 0,
        F.concat(F.col("c_mktsegment"), F.lit("_V2")),
    ).otherwise(F.col("c_mktsegment"))
    return cust.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        bal.alias("c_acctbal"),
        seg.alias("c_mktsegment"),
    )


def _jv_kwargs():
    return dict(
        fact_on="o_custkey",
        dim_on="c_custkey",
        fact_key="o_orderkey",
        dim_payload=["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
        partition_col="o_month",
    )


def test_persisted_join_view_equals_oneshot(spark, tmp_path):
    """The stored view after the full simulated history (partial dim,
    two fact batches, a dim insert+update batch, a last fact batch)
    equals the one-shot join against the final dim image, and the
    orphan ledger is empty — the persisted twin of the oracle-gated
    order_customer_view_incremental."""
    from pyspark.sql import functions as F

    from data_platform_spark.ops.join_view import (
        incremental_join_view,
        join_view_dim_upsert_persisted,
    )
    from data_platform_spark.pipeline import Warehouse
    from data_platform_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    wh = Warehouse(str(tmp_path / "wh"))
    orders = load_table(spark, SF_SMOKE, "orders").withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    cust = load_table(spark, SF_SMOKE, "customer")
    dim0 = cust.filter(F.pmod("c_custkey", F.lit(5)) != 0)
    dim1 = _jv_mutated_cust(cust)
    upserts = _jv_mutated_cust(
        cust.filter(
            (F.pmod("c_custkey", F.lit(5)) == 0)
            | (F.pmod("c_custkey", F.lit(7)) == 0)
        )
    )
    kw = _jv_kwargs()
    for i, dim in ((0, dim0), (1, dim0)):
        incremental_join_view(
            spark, wh, "dwh", "order_cust", 
            orders.filter(F.pmod("o_orderkey", F.lit(3)) == i),
            dim, batch_id=f"b{i}", **kw,
        )
    join_view_dim_upsert_persisted(
        spark, wh, "dwh", "order_cust", upserts, batch_id="dim-0", **kw
    )
    incremental_join_view(
        spark, wh, "dwh", "order_cust",
        orders.filter(F.pmod("o_orderkey", F.lit(3)) == 2),
        dim1, batch_id="b2", **kw,
    )
    view = wh.read(spark, "dwh", "order_cust")
    oneshot = orders.join(
        dim1, orders["o_custkey"] == dim1["c_custkey"], "inner"
    ).drop("c_custkey")
    assert view.count() == oneshot.count()
    v = view.select(*sorted(view.columns))
    o = oneshot.select(*sorted(view.columns))
    assert v.exceptAll(o).count() == 0 and o.exceptAll(v).count() == 0
    from data_platform_spark.ops.join_view import _has_data

    assert not _has_data(wh, "dwh", "order_cust__orphans", "o_month")


def test_persisted_join_view_replay_skips(spark, tmp_path):
    """A replayed batch_id is a no-op for its OWN leg, and the markers
    are namespaced per leg: a dim batch whose id collides with an
    earlier fact batch id still RUNS (it is different work), it does
    not silently skip on the foreign marker."""
    from pyspark.sql import functions as F

    from data_platform_spark.ops.join_view import (
        incremental_join_view,
        join_view_dim_upsert_persisted,
    )
    from data_platform_spark.pipeline import Warehouse
    from data_platform_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    wh = Warehouse(str(tmp_path / "wh"))
    orders = load_table(spark, SF_SMOKE, "orders").withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    cust = load_table(spark, SF_SMOKE, "customer")
    kw = _jv_kwargs()
    b0 = orders.filter(F.pmod("o_orderkey", F.lit(3)) == 0)
    incremental_join_view(
        spark, wh, "dwh", "oc", b0, cust, batch_id="b0", **kw
    )
    n = wh.read(spark, "dwh", "oc").count()
    assert (
        incremental_join_view(
            spark, wh, "dwh", "oc", b0, cust, batch_id="b0", **kw
        )
        == []
    )
    # same id, DIFFERENT leg: must not skip on the fact marker — the
    # mutated dim images land (this was a silent drop before markers
    # were namespaced per leg)
    assert (
        join_view_dim_upsert_persisted(
            spark, wh, "dwh", "oc", _jv_mutated_cust(cust), batch_id="b0", **kw
        )
        != []
    )
    # ...and replaying the dim leg's own id now skips
    assert (
        join_view_dim_upsert_persisted(
            spark, wh, "dwh", "oc", _jv_mutated_cust(cust), batch_id="b0", **kw
        )
        == []
    )
    assert wh.read(spark, "dwh", "oc").count() == n


def test_join_view_dim_delete_roundtrip_inmemory(spark):
    """Dim DELETE demotes the key's view rows to orphans; re-inserting
    the same dim rows restores the exact original view (lossless
    round trip) — in-memory algebra."""
    from pyspark.sql import functions as F

    from data_platform_spark.ops.join_view import (
        apply_dim_delete,
        apply_dim_upsert,
        init_join_view,
    )
    from data_platform_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    orders = load_table(spark, SF_SMOKE, "orders")
    cust = load_table(spark, SF_SMOKE, "customer")
    payload = ["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    st = init_join_view(orders, cust, "o_custkey", "c_custkey")
    n0_view, n0_orph = st.view.count(), st.orphans.count()
    doomed = cust.filter(F.pmod("c_custkey", F.lit(6)) == 0)
    st1 = apply_dim_delete(st, doomed, "o_custkey", "c_custkey", payload)
    n_demoted = st.view.filter(F.pmod("o_custkey", F.lit(6)) == 0).count()
    assert n_demoted > 0
    assert st1.view.count() == n0_view - n_demoted
    assert st1.orphans.count() == n0_orph + n_demoted
    st2 = apply_dim_upsert(
        st1, doomed, "o_custkey", "c_custkey", "o_orderkey", payload
    )
    cols = sorted(st.view.columns)
    a, b = st2.view.select(*cols), st.view.select(*cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert st2.orphans.count() == n0_orph


def test_join_view_dim_delete_roundtrip_persisted(spark, tmp_path):
    """Same round trip through the stored tables, plus replay skip."""
    from pyspark.sql import functions as F

    from data_platform_spark.ops.join_view import (
        incremental_join_view,
        join_view_dim_delete_persisted,
        join_view_dim_upsert_persisted,
    )
    from data_platform_spark.pipeline import Warehouse
    from data_platform_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    wh = Warehouse(str(tmp_path / "wh"))
    orders = load_table(spark, SF_SMOKE, "orders").withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    cust = load_table(spark, SF_SMOKE, "customer")
    kw = _jv_kwargs()
    incremental_join_view(
        spark, wh, "dwh", "oc", orders, cust, batch_id="b0", **kw
    )
    before = wh.read(spark, "dwh", "oc")
    n0 = before.count()
    snapshot = [tuple(r) for r in before.select(*sorted(before.columns)).collect()]
    doomed = cust.filter(F.pmod("c_custkey", F.lit(6)) == 0)
    join_view_dim_delete_persisted(
        spark, wh, "dwh", "oc", doomed, batch_id="del-0", **kw
    )
    mid = wh.read(spark, "dwh", "oc")
    assert mid.count() < n0
    assert mid.filter(F.pmod("o_custkey", F.lit(6)) == 0).count() == 0
    orph = wh.read(spark, "dwh", "oc__orphans")
    assert orph.count() == n0 - mid.count()
    # replayed delete is a no-op
    assert (
        join_view_dim_delete_persisted(
            spark, wh, "dwh", "oc", doomed, batch_id="del-0", **kw
        )
        == []
    )
    join_view_dim_upsert_persisted(
        spark, wh, "dwh", "oc", doomed, batch_id="dim-1", **kw
    )
    after = wh.read(spark, "dwh", "oc")
    assert sorted(
        tuple(r) for r in after.select(*sorted(after.columns)).collect()
    ) == sorted(snapshot)


def test_join_view_redelivery_to_missing_dim_moves_ledger(spark):
    """A fact key re-delivered while the current dim image lacks its
    join key must MOVE from the view to the orphan ledger (never linger
    in both) — the in-memory twin of the persisted _DEL legs."""
    from pyspark.sql import functions as F

    from data_platform_spark.ops.join_view import (
        apply_fact_batch,
        init_join_view,
    )
    from data_platform_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    orders = load_table(spark, SF_SMOKE, "orders")
    cust = load_table(spark, SF_SMOKE, "customer")
    st = init_join_view(orders, cust, "o_custkey", "c_custkey")
    assert st.orphans.count() == 0
    n = st.view.count()
    # re-deliver the mod-4 orders against a dim image missing their keys
    redelivered = orders.filter(F.pmod("o_custkey", F.lit(4)) == 0)
    n_re = redelivered.count()
    assert n_re > 0
    shrunk = cust.filter(F.pmod("c_custkey", F.lit(4)) != 0)
    st2 = apply_fact_batch(
        st, redelivered, shrunk, "o_custkey", "c_custkey", "o_orderkey"
    )
    assert st2.orphans.count() == n_re
    assert st2.view.count() == n - n_re
    # no key in both ledgers
    assert (
        st2.view.join(st2.orphans, ["o_orderkey"], "left_semi").count() == 0
    )


def test_join_view_dim_upsert_crash_between_merges_reconciles(
    spark, tmp_path, monkeypatch
):
    """Crash window: the dim-upsert leg merges the view FIRST, then
    deletes promoted orphans. A crash between the two leaves the
    promoted key in BOTH ledgers with no marker; the replay must
    reconcile to exactly the uncrashed result (no double-insert of the
    promoted row, orphans drained)."""
    from pyspark.sql import functions as F

    import data_platform_spark.pipeline as pl
    from data_platform_spark.ops.join_view import (
        incremental_join_view,
        join_view_dim_upsert_persisted,
    )
    from data_platform_spark.pipeline import Warehouse
    from data_platform_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    orders = load_table(spark, SF_SMOKE, "orders").withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    cust = load_table(spark, SF_SMOKE, "customer")
    dim0 = cust.filter(F.pmod("c_custkey", F.lit(5)) != 0)
    late = cust.filter(F.pmod("c_custkey", F.lit(5)) == 0)
    kw = _jv_kwargs()

    def build(wh):
        incremental_join_view(
            spark, wh, "dwh", "oc", orders, dim0, batch_id="b0", **kw
        )

    # reference: uncrashed run
    wh_ref = Warehouse(str(tmp_path / "ref"))
    build(wh_ref)
    join_view_dim_upsert_persisted(
        spark, wh_ref, "dwh", "oc", late, batch_id="dim-0", **kw
    )
    ref = wh_ref.read(spark, "dwh", "oc")
    cols = sorted(ref.columns)
    ref_rows = sorted(tuple(r) for r in ref.select(*cols).collect())

    # crashed run: merge raises AFTER the first (view) merge commits
    wh = Warehouse(str(tmp_path / "crash"))
    build(wh)
    real_merge = Warehouse.merge
    calls = {"n": 0}

    def flaky_merge(self, *a, **k):
        out = real_merge(self, *a, **k)
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated crash after view merge")
        return out

    monkeypatch.setattr(pl.Warehouse, "merge", flaky_merge)
    try:
        join_view_dim_upsert_persisted(
            spark, wh, "dwh", "oc", late, batch_id="dim-0", **kw
        )
        raise AssertionError("expected simulated crash")
    except RuntimeError:
        pass
    monkeypatch.setattr(pl.Warehouse, "merge", real_merge)
    # the window: promoted keys in BOTH ledgers, no marker
    orph_mid = wh.read(spark, "dwh", "oc__orphans")
    assert orph_mid.count() > 0
    # replay with the same batch id completes and reconciles
    join_view_dim_upsert_persisted(
        spark, wh, "dwh", "oc", late, batch_id="dim-0", **kw
    )
    got = wh.read(spark, "dwh", "oc")
    got_rows = sorted(tuple(r) for r in got.select(*cols).collect())
    assert got_rows == ref_rows
    from data_platform_spark.ops.join_view import _has_data

    assert not _has_data(wh, "dwh", "oc__orphans", "o_month")


def test_join_view_fact_crash_never_in_neither(spark, tmp_path, monkeypatch):
    """The fact leg's cross-ledger eviction lands inserts BEFORE deletes:
    a fact key re-delivered while the dim lost its join key moves
    view → orphans via (orphans insert, then view delete). A crash
    between the two merges must leave the key in BOTH ledgers — never
    in neither (the pre-r14 ordering merged the view's delete first, so
    the crash window dropped the key entirely); the marker-less replay
    reconciles to exactly the uncrashed result."""
    from pyspark.sql import functions as F

    import data_platform_spark.pipeline as pl
    from data_platform_spark.ops.join_view import incremental_join_view
    from data_platform_spark.pipeline import Warehouse
    from data_platform_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    orders = load_table(spark, SF_SMOKE, "orders").withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    cust = load_table(spark, SF_SMOKE, "customer")
    kw = _jv_kwargs()
    batch = orders.filter(F.pmod("o_orderkey", F.lit(3)) == 0)
    shrunk = cust.filter(F.pmod("c_custkey", F.lit(2)) == 0)
    redelivered = batch.join(
        shrunk, batch["o_custkey"] == shrunk["c_custkey"], "left_anti"
    )
    red_keys = {r[0] for r in redelivered.select("o_orderkey").collect()}
    assert red_keys

    def build(wh):
        incremental_join_view(
            spark, wh, "dwh", "oc", batch, cust, batch_id="b0", **kw
        )

    # reference: uncrashed re-delivery against the shrunk dim
    wh_ref = Warehouse(str(tmp_path / "ref"))
    build(wh_ref)
    incremental_join_view(
        spark, wh_ref, "dwh", "oc", redelivered, shrunk, batch_id="b1", **kw
    )
    ref_orph = {
        r[0]
        for r in wh_ref.read(spark, "dwh", "oc__orphans")
        .select("o_orderkey")
        .collect()
    }
    assert ref_orph == red_keys

    # crashed run: the re-delivery's merge sequence is (1) view
    # matched-upsert (empty here), (2) orphans insert (a first-load
    # WRITE in this scenario), (3) view delete — crash just BEFORE the
    # second merge call, i.e. after the orphan rows are committed and
    # before the view delete runs
    wh = Warehouse(str(tmp_path / "crash"))
    build(wh)
    real_merge = Warehouse.merge
    calls = {"n": 0}

    def flaky_merge(self, *a, **k):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash before the view delete")
        return real_merge(self, *a, **k)

    monkeypatch.setattr(pl.Warehouse, "merge", flaky_merge)
    try:
        incremental_join_view(
            spark, wh, "dwh", "oc", redelivered, shrunk, batch_id="b1", **kw
        )
        raise AssertionError("expected simulated crash")
    except RuntimeError:
        pass
    monkeypatch.setattr(pl.Warehouse, "merge", real_merge)
    # the window: every re-delivered key is in BOTH ledgers, none lost
    view_mid = {
        r[0]
        for r in wh.read(spark, "dwh", "oc").select("o_orderkey").collect()
    }
    orph_mid = {
        r[0]
        for r in wh.read(spark, "dwh", "oc__orphans")
        .select("o_orderkey")
        .collect()
    }
    assert red_keys <= view_mid and red_keys <= orph_mid
    # marker-less replay reconciles to the uncrashed state
    incremental_join_view(
        spark, wh, "dwh", "oc", redelivered, shrunk, batch_id="b1", **kw
    )
    got_view = {
        r[0]
        for r in wh.read(spark, "dwh", "oc").select("o_orderkey").collect()
    }
    got_orph = {
        r[0]
        for r in wh.read(spark, "dwh", "oc__orphans")
        .select("o_orderkey")
        .collect()
    }
    assert got_orph == red_keys
    assert got_view.isdisjoint(red_keys)


# --- SCD2-versioned join view -----------------------------------------------


def _scd2_versions(cust, *, include_mod5: bool, closed: bool):
    """Deterministic SCD2 version table over the customer dim.

    ``closed=False`` → the pre-dim-batch state: one open version per key,
    raw image, valid [lo, hi). ``closed=True`` → the post-batch state:
    mod-7 keys close v1 at the cutoff and open a mutated v2; mod-11 keys
    (that are not mod-7) are soft-closed at the cutoff with NO successor;
    everyone else keeps v1 open. ``include_mod5`` drops/keeps the mod-5
    keys (they insert late, backdated)."""
    from pyspark.sql import functions as F

    lo = F.to_timestamp(F.lit("1000-01-01"))
    hi = F.to_timestamp(F.lit("5000-01-01"))
    cut = F.to_timestamp(F.lit(_SCD2_CUTOFF))
    base = cust if include_mod5 else cust.filter(F.pmod("c_custkey", F.lit(5)) != 0)
    payload = ["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    if not closed:
        return base.select(
            "c_custkey", *payload, lo.alias("valid_from"), hi.alias("valid_to")
        )
    is7 = F.pmod("c_custkey", F.lit(7)) == 0
    is11 = F.pmod("c_custkey", F.lit(11)) == 0
    v1 = base.select(
        "c_custkey",
        *payload,
        lo.alias("valid_from"),
        F.when(is7 | is11, cut).otherwise(hi).alias("valid_to"),
    )
    v2 = base.filter(is7).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        (F.col("c_acctbal") + F.lit(100.0)).alias("c_acctbal"),
        F.concat(F.col("c_mktsegment"), F.lit("_V2")).alias("c_mktsegment"),
        cut.alias("valid_from"),
        hi.alias("valid_to"),
    )
    return v1.unionByName(v2)


_SCD2_CUTOFF = "1998-01-01"


def _scd2_rows(df, cols):
    return sorted(tuple(r) for r in df.select(*sorted(cols)).collect())


def test_scd2_join_view_equals_oneshot_inmemory(spark):
    """The maintained SCD2 view after interleaved fact/dim batches —
    including a LATE fact batch whose pre-cutoff rows must resolve to a
    version that is already CLOSED — equals the one-shot as-of join of
    all facts against the final version table, and the orphan ledgers
    agree (mod-11 keys' post-cutoff facts demoted, mod-5 keys' orphans
    promoted by the backdated insert)."""
    import datetime

    from pyspark.sql import functions as F

    from data_platform_spark.ops.scd2_join_view import (
        apply_fact_batch_scd2,
        apply_scd2_dim_batch,
        init_scd2_join_view,
    )
    from data_platform_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    orders = load_table(spark, SF_SMOKE, "orders")
    cust = load_table(spark, SF_SMOKE, "customer")
    v0 = _scd2_versions(cust, include_mod5=False, closed=False)
    v1 = _scd2_versions(cust, include_mod5=True, closed=True)
    touched = cust.filter(
        (F.pmod("c_custkey", F.lit(5)) == 0)
        | (F.pmod("c_custkey", F.lit(7)) == 0)
        | (F.pmod("c_custkey", F.lit(11)) == 0)
    ).select("c_custkey")
    cut = datetime.datetime(1998, 1, 1)

    st = init_scd2_join_view(
        orders.filter(F.pmod("o_orderkey", F.lit(3)) == 0),
        v0, "o_custkey", "c_custkey", "o_orderdate",
    )
    st = apply_fact_batch_scd2(
        st,
        orders.filter(F.pmod("o_orderkey", F.lit(3)) == 1),
        v0, "o_custkey", "c_custkey", "o_orderkey", "o_orderdate",
    )
    st = apply_scd2_dim_batch(
        st, v1, touched, cut,
        "o_custkey", "c_custkey", "o_orderkey", "o_orderdate",
        ["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    )
    # LATE batch: contains pre-cutoff orders of mod-7 customers, which
    # must resolve to the CLOSED v1 image
    st = apply_fact_batch_scd2(
        st,
        orders.filter(F.pmod("o_orderkey", F.lit(3)) == 2),
        v1, "o_custkey", "c_custkey", "o_orderkey", "o_orderdate",
    )

    ref = init_scd2_join_view(orders, v1, "o_custkey", "c_custkey", "o_orderdate")
    cols = st.view.columns
    assert _scd2_rows(st.view, cols) == _scd2_rows(ref.view, cols)
    ocols = st.orphans.columns
    assert _scd2_rows(st.orphans, ocols) == _scd2_rows(ref.orphans, ocols)
    # the scenario actually exercises all three ledger motions
    assert st.orphans.count() > 0
    late_closed = st.view.filter(
        (F.pmod("o_custkey", F.lit(7)) == 0)
        & (F.col("o_orderdate") < F.lit(cut))
        & (F.pmod("o_orderkey", F.lit(3)) == 2)
    )
    assert late_closed.count() > 0
    assert (
        late_closed.filter(F.col("c_mktsegment").endswith("_V2")).count() == 0
    )


def test_scd2_join_view_demotes_on_soft_close(spark):
    """A soft-closed key (open version closed at the cutoff, no
    successor) demotes exactly its post-cutoff view rows to orphans;
    pre-cutoff rows stay resolved to the closed version."""
    import datetime

    from pyspark.sql import functions as F

    from data_platform_spark.ops.scd2_join_view import (
        apply_scd2_dim_batch,
        init_scd2_join_view,
    )
    from data_platform_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    orders = load_table(spark, SF_SMOKE, "orders")
    cust = load_table(spark, SF_SMOKE, "customer")
    v0 = _scd2_versions(cust, include_mod5=True, closed=False)
    v1 = _scd2_versions(cust, include_mod5=True, closed=True)
    cut = datetime.datetime(1998, 1, 1)
    is_mod11_only = (F.pmod("o_custkey", F.lit(11)) == 0) & (
        F.pmod("o_custkey", F.lit(7)) != 0
    )

    st = init_scd2_join_view(orders, v0, "o_custkey", "c_custkey", "o_orderdate")
    assert st.orphans.count() == 0
    touched = cust.filter(
        (F.pmod("c_custkey", F.lit(7)) == 0)
        | (F.pmod("c_custkey", F.lit(11)) == 0)
    ).select("c_custkey")
    st = apply_scd2_dim_batch(
        st, v1, touched, cut,
        "o_custkey", "c_custkey", "o_orderkey", "o_orderdate",
        ["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    )
    expected = orders.filter(
        is_mod11_only & (F.col("o_orderdate") >= F.lit(cut))
    )
    got = {r[0] for r in st.orphans.select("o_orderkey").collect()}
    want = {r[0] for r in expected.select("o_orderkey").collect()}
    assert want and got == want
    # pre-cutoff rows of the soft-closed keys stay in the view
    kept = st.view.filter(is_mod11_only)
    assert kept.count() == orders.filter(
        is_mod11_only & (F.col("o_orderdate") < F.lit(cut))
    ).count()


def test_persisted_scd2_join_view_equals_oneshot(spark, tmp_path):
    """Persisted twin: the stored SCD2 view after the interleaved history
    equals the in-memory one-shot as-of join against the final version
    table; replays of both legs skip on their namespaced markers."""
    import datetime

    from pyspark.sql import functions as F

    from data_platform_spark.ops.scd2_join_view import (
        incremental_scd2_join_view,
        init_scd2_join_view,
        scd2_join_view_dim_persisted,
    )
    from data_platform_spark.pipeline import Warehouse
    from data_platform_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    wh = Warehouse(str(tmp_path / "wh"))
    orders = load_table(spark, SF_SMOKE, "orders").withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    cust = load_table(spark, SF_SMOKE, "customer")
    v0 = _scd2_versions(cust, include_mod5=False, closed=False)
    v1 = _scd2_versions(cust, include_mod5=True, closed=True)
    touched = cust.filter(
        (F.pmod("c_custkey", F.lit(5)) == 0)
        | (F.pmod("c_custkey", F.lit(7)) == 0)
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

    for i, dimv in ((0, v0), (1, v0)):
        incremental_scd2_join_view(
            spark, wh, "dwh", "oc2",
            orders.filter(F.pmod("o_orderkey", F.lit(3)) == i),
            dimv, batch_id=f"b{i}", **kw,
        )
    scd2_join_view_dim_persisted(
        spark, wh, "dwh", "oc2", v1, touched, cut, batch_id="d0", **kw
    )
    incremental_scd2_join_view(
        spark, wh, "dwh", "oc2",
        orders.filter(F.pmod("o_orderkey", F.lit(3)) == 2),
        v1, batch_id="b2", **kw,
    )

    ref = init_scd2_join_view(orders, v1, "o_custkey", "c_custkey", "o_orderdate")
    view = wh.read(spark, "dwh", "oc2").drop("o_month")
    cols = view.columns
    assert _scd2_rows(view, cols) == _scd2_rows(ref.view.select(*cols), cols)
    orph = wh.read(spark, "dwh", "oc2__orphans").drop("o_month")
    ocols = orph.columns
    assert _scd2_rows(orph, ocols) == _scd2_rows(ref.orphans.select(*ocols), ocols)
    # namespaced replays skip
    assert (
        incremental_scd2_join_view(
            spark, wh, "dwh", "oc2",
            orders.filter(F.pmod("o_orderkey", F.lit(3)) == 2),
            v1, batch_id="b2", **kw,
        )
        == []
    )
    assert (
        scd2_join_view_dim_persisted(
            spark, wh, "dwh", "oc2", v1, touched, cut, batch_id="d0", **kw
        )
        == []
    )


def test_compact_join_view_files_and_bit_identity(spark, tmp_path):
    """Compaction collapses each ledger to one file per partition,
    preserves content row-for-row, keeps replay markers working, and
    refuses while a merge journal for either ledger is pending."""
    import json
    import os

    from pyspark.sql import functions as F

    from data_platform_spark.ops.join_view import (
        compact_join_view,
        incremental_join_view,
    )
    from data_platform_spark.pipeline import Warehouse
    from data_platform_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    wh = Warehouse(str(tmp_path / "wh"))
    orders = load_table(spark, SF_SMOKE, "orders").withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    cust = load_table(spark, SF_SMOKE, "customer")
    dim0 = cust.filter(F.pmod("c_custkey", F.lit(5)) != 0)
    kw = _jv_kwargs()
    for i in range(4):
        incremental_join_view(
            spark, wh, "dwh", "oc", 
            orders.filter(F.pmod("o_orderkey", F.lit(4)) == i),
            dim0, batch_id=f"b{i}", **kw,
        )
    before_view = sorted(
        tuple(r) for r in wh.read(spark, "dwh", "oc").collect()
    )
    before_orph = sorted(
        tuple(r) for r in wh.read(spark, "dwh", "oc__orphans").collect()
    )

    # refusal: a pending merge journal for the orphans ledger blocks it
    jpath = os.path.join(wh.root, "dwh", ".merge-journal-deadbeef")
    with open(jpath, "w", encoding="utf-8") as f:
        json.dump({"table": "oc__orphans", "tmp": "/nope", "swaps": []}, f)
    try:
        compact_join_view(spark, wh, "dwh", "oc", "o_month")
        raise AssertionError("expected refusal over pending journal")
    except RuntimeError as e:
        assert "refusing" in str(e)
    os.remove(jpath)

    out = compact_join_view(spark, wh, "dwh", "oc", "o_month")
    for t in ("oc", "oc__orphans"):
        n_parts = len(
            [
                e
                for e in os.listdir(wh.path("dwh", t))
                if e.startswith("o_month=")
            ]
        )
        assert out[t]["files_after"] == n_parts
        assert out[t]["files_before"] > out[t]["files_after"]
    assert before_view == sorted(
        tuple(r) for r in wh.read(spark, "dwh", "oc").collect()
    )
    assert before_orph == sorted(
        tuple(r) for r in wh.read(spark, "dwh", "oc__orphans").collect()
    )
    # replay markers survive the swap (sibling dir)
    assert (
        incremental_join_view(
            spark, wh, "dwh", "oc",
            orders.filter(F.pmod("o_orderkey", F.lit(4)) == 0),
            dim0, batch_id="b0", **kw,
        )
        == []
    )


def test_scd2_dim_crash_between_merges_reconciles(spark, tmp_path, monkeypatch):
    """SCD2 dim-batch crash window: the persisted leg lands INSERT halves
    (view refresh, orphan demotions) before the cross-ledger DELETEs, so
    a crash mid-sequence leaves moved keys in BOTH ledgers — never in
    neither — and the marker-less replay reconciles to exactly the
    uncrashed result (the probe's dropDuplicates absorbs the doubled
    rows)."""
    import datetime

    from pyspark.sql import functions as F

    import data_platform_spark.pipeline as pl
    from data_platform_spark.ops.scd2_join_view import (
        incremental_scd2_join_view,
        scd2_join_view_dim_persisted,
    )
    from data_platform_spark.pipeline import Warehouse
    from data_platform_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

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

    def build(wh):
        incremental_scd2_join_view(
            spark, wh, "dwh", "oc2", orders, v0, batch_id="b0", **kw
        )

    # reference: uncrashed dim batch
    wh_ref = Warehouse(str(tmp_path / "ref"))
    build(wh_ref)
    scd2_join_view_dim_persisted(
        spark, wh_ref, "dwh", "oc2", v1, touched, cut, batch_id="d0", **kw
    )
    vcols = sorted(wh_ref.read(spark, "dwh", "oc2").columns)
    ref_view = sorted(
        tuple(r)
        for r in wh_ref.read(spark, "dwh", "oc2").select(*vcols).collect()
    )
    ocols = sorted(wh_ref.read(spark, "dwh", "oc2__orphans").columns)
    ref_orph = sorted(
        tuple(r)
        for r in wh_ref.read(spark, "dwh", "oc2__orphans")
        .select(*ocols)
        .collect()
    )
    demoted_keys = {r[0] for r in wh_ref.read(
        spark, "dwh", "oc2__orphans").select("o_orderkey").collect()}
    assert demoted_keys  # mod-11 soft-close produces demotions

    # crashed run: the dim leg's merge sequence here is (1) view refresh
    # upsert, (2) orphans demotion first-load WRITE (no orphans table
    # yet), (3) view delete of demoted keys — crash just BEFORE merge
    # call 2, i.e. after the demotion rows landed, before the view
    # delete
    wh = Warehouse(str(tmp_path / "crash"))
    build(wh)
    real_merge = Warehouse.merge
    calls = {"n": 0}

    def flaky_merge(self, *a, **k):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash before the view delete")
        return real_merge(self, *a, **k)

    monkeypatch.setattr(pl.Warehouse, "merge", flaky_merge)
    try:
        scd2_join_view_dim_persisted(
            spark, wh, "dwh", "oc2", v1, touched, cut, batch_id="d0", **kw
        )
        raise AssertionError("expected simulated crash")
    except RuntimeError:
        pass
    monkeypatch.setattr(pl.Warehouse, "merge", real_merge)
    # the window: demoted keys present in BOTH ledgers, none lost
    view_mid = {
        r[0]
        for r in wh.read(spark, "dwh", "oc2").select("o_orderkey").collect()
    }
    orph_mid = {
        r[0]
        for r in wh.read(spark, "dwh", "oc2__orphans")
        .select("o_orderkey")
        .collect()
    }
    assert demoted_keys <= view_mid and demoted_keys <= orph_mid
    # marker-less replay reconciles both ledgers to the uncrashed state
    scd2_join_view_dim_persisted(
        spark, wh, "dwh", "oc2", v1, touched, cut, batch_id="d0", **kw
    )
    got_view = sorted(
        tuple(r)
        for r in wh.read(spark, "dwh", "oc2").select(*vcols).collect()
    )
    got_orph = sorted(
        tuple(r)
        for r in wh.read(spark, "dwh", "oc2__orphans")
        .select(*ocols)
        .collect()
    )
    assert got_view == ref_view
    assert got_orph == ref_orph


def test_scd2_apply_composes_with_temporal_join_view(spark):
    """The composition claim end-to-end: a dimension maintained by
    ops/scd2.scd2_apply (first load at T1, one change batch at the
    cutoff mutating the mod-7 keys) feeds its version table straight
    into the temporal join view, and the maintained view equals the
    one-shot as-of join against the final SCD2 state. ``touched_keys``
    is deliberately the FULL snapshot key set — the documented
    superset-is-safe contract (unchanged keys re-resolve to themselves)."""
    import datetime

    from pyspark.sql import functions as F

    from data_platform_spark.ops.scd2 import scd2_apply
    from data_platform_spark.ops.scd2_join_view import (
        apply_fact_batch_scd2,
        apply_scd2_dim_batch,
        init_scd2_join_view,
    )
    from data_platform_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    orders = load_table(spark, SF_SMOKE, "orders")
    cust = load_table(spark, SF_SMOKE, "customer")
    tracked = ["c_acctbal", "c_mktsegment"]
    carried = ["c_name", "c_nationkey"]
    payload = tracked + carried
    t1 = F.to_timestamp(F.lit("1000-01-01"))
    cut_dt = datetime.datetime(1998, 1, 1)
    cut = F.to_timestamp(F.lit("1998-01-01"))

    stg1 = cust.select("c_custkey", *payload)
    dim1 = scd2_apply(
        None, stg1, "c_custkey", tracked, carried, "c_sk", batch_ts=t1
    ).localCheckpoint()
    stg2 = cust.select(
        "c_custkey",
        (
            F.col("c_acctbal")
            + F.when(F.pmod("c_custkey", F.lit(7)) == 0, 100.0).otherwise(0.0)
        ).alias("c_acctbal"),
        F.when(
            F.pmod("c_custkey", F.lit(7)) == 0,
            F.concat(F.col("c_mktsegment"), F.lit("_V2")),
        ).otherwise(F.col("c_mktsegment")).alias("c_mktsegment"),
        "c_name",
        "c_nationkey",
    )
    dim2 = scd2_apply(
        dim1, stg2, "c_custkey", tracked, carried, "c_sk", batch_ts=cut
    ).localCheckpoint()

    def versions(dim):
        return dim.select(
            "c_custkey", *payload, "valid_from", "valid_to"
        )

    st = init_scd2_join_view(
        orders.filter(F.pmod("o_orderkey", F.lit(2)) == 0),
        versions(dim1), "o_custkey", "c_custkey", "o_orderdate",
    )
    st = apply_scd2_dim_batch(
        st, versions(dim2), stg2.select("c_custkey"), cut_dt,
        "o_custkey", "c_custkey", "o_orderkey", "o_orderdate", payload,
    )
    st = apply_fact_batch_scd2(
        st,
        orders.filter(F.pmod("o_orderkey", F.lit(2)) == 1),
        versions(dim2), "o_custkey", "c_custkey", "o_orderkey", "o_orderdate",
    )

    ref = init_scd2_join_view(
        orders, versions(dim2), "o_custkey", "c_custkey", "o_orderdate"
    )
    cols = st.view.columns
    assert _scd2_rows(st.view, cols) == _scd2_rows(ref.view, cols)
    assert st.orphans.count() == 0 == ref.orphans.count()
    # the mutation is visible exactly era-side: a mod-7 post-cutoff row
    # carries the _V2 image, its pre-cutoff sibling the original
    mod7 = st.view.filter(F.pmod("o_custkey", F.lit(7)) == 0)
    assert (
        mod7.filter(
            (F.col("o_orderdate") >= cut)
            & ~F.col("c_mktsegment").endswith("_V2")
        ).count()
        == 0
    )
    assert (
        mod7.filter(
            (F.col("o_orderdate") < cut)
            & F.col("c_mktsegment").endswith("_V2")
        ).count()
        == 0
    )

def test_legacy_marker_spellings_still_skip(spark, tmp_path):
    """ADVICE r14: a warehouse written by PREVIOUS marker layouts keeps
    its replay protection after upgrade. Both legacy spellings —
    ``fact:b0`` (the first namespaced form) and bare ``b0`` (the
    pre-namespacing form) — must short-circuit a replay; new markers are
    written with the portable ``--`` separator."""
    import os

    from pyspark.sql import functions as F

    from data_platform_spark.ops.incremental import _marker_dir
    from data_platform_spark.ops.join_view import incremental_join_view
    from data_platform_spark.pipeline import Warehouse
    from data_platform_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    wh = Warehouse(str(tmp_path / "wh"))
    orders = load_table(spark, SF_SMOKE, "orders").withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    cust = load_table(spark, SF_SMOKE, "customer")
    kw = _jv_kwargs()
    b0 = orders.filter(F.pmod("o_orderkey", F.lit(3)) == 0)
    incremental_join_view(spark, wh, "dwh", "oc", b0, cust, batch_id="b0", **kw)
    d = _marker_dir(wh, "dwh", "oc")
    # the new layout writes the portable separator
    assert "fact--b0" in os.listdir(d)
    # simulate a pre-upgrade warehouse: swap in each legacy spelling
    os.remove(os.path.join(d, "fact--b0"))
    for legacy in ("fact:b1", "b2"):
        open(os.path.join(d, legacy), "w").close()
    b1 = orders.filter(F.pmod("o_orderkey", F.lit(3)) == 1)
    assert (
        incremental_join_view(
            spark, wh, "dwh", "oc", b1, cust, batch_id="b1", **kw
        )
        == []
    )
    assert (
        incremental_join_view(
            spark, wh, "dwh", "oc", b1, cust, batch_id="b2", **kw
        )
        == []
    )
    # and b0, whose marker we removed, re-runs (idempotent re-apply)
    assert (
        incremental_join_view(
            spark, wh, "dwh", "oc", b0, cust, batch_id="b0", **kw
        )
        != []
    )


def test_table_lock_reentrant_and_compaction_holds_it(spark, tmp_path):
    """The per-table lock is reentrant within the owning thread (so
    compact_join_view can hold it across journal scan + read + write
    while the inner Warehouse.write re-acquires), and still EXCLUDES
    other threads for the duration of the hold."""
    import threading
    import time

    from pyspark.sql import functions as F

    from data_platform_spark.ops.join_view import (
        compact_join_view,
        incremental_join_view,
    )
    from data_platform_spark.pipeline import Warehouse
    from data_platform_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    wh = Warehouse(str(tmp_path / "wh"))
    # reentrancy: nested acquisition of the same table lock must not
    # deadlock, and the inner exit must not release the outer hold
    acquired_by_other: list[float] = []

    def _contender():
        with wh._table_lock("dwh", "t"):
            acquired_by_other.append(time.monotonic())

    with wh._table_lock("dwh", "t"):
        with wh._table_lock("dwh", "t"):
            pass
        th = threading.Thread(target=_contender)
        th.start()
        time.sleep(0.3)
        # inner exit above must NOT have released the lock for the thread
        assert not acquired_by_other
        released_at = time.monotonic()
    th.join(timeout=10)
    assert acquired_by_other and acquired_by_other[0] >= released_at

    # compaction drives the reentrant path end-to-end (outer hold +
    # inner Warehouse.write acquire) and stays bit-identical
    orders = load_table(spark, SF_SMOKE, "orders").withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    cust = load_table(spark, SF_SMOKE, "customer")
    kw = _jv_kwargs()
    for i in range(2):
        incremental_join_view(
            spark, wh, "dwh", "oc",
            orders.filter(F.pmod("o_orderkey", F.lit(2)) == i),
            cust, batch_id=f"b{i}", **kw,
        )
    before = wh.read(spark, "dwh", "oc").orderBy("o_orderkey").collect()
    out = compact_join_view(spark, wh, "dwh", "oc", "o_month")
    assert out["oc"]["files_after"] <= out["oc"]["files_before"]
    after = wh.read(spark, "dwh", "oc").orderBy("o_orderkey").collect()
    assert before == after


def test_merge_holds_lock_across_read_and_stage(spark, tmp_path):
    """ADVICE r15: ``Warehouse.merge`` acquires the table lock BEFORE
    reading/deriving, not just for the swap. Without that, a concurrent
    rewrite of the table (another merge, or compact_join_view's
    ``expire_orphans_below`` retention pass) can land between the
    merge's read and its swap — the merge then reinstalls partition
    images derived from the PRE-rewrite table, resurrecting dropped
    rows. Pin: a merge launched while another thread holds the lock and
    rewrites the table must fold its batch into the POST-rewrite image."""
    import threading

    from pyspark.sql import functions as F

    from data_platform_spark.pipeline import Warehouse

    wh = Warehouse(str(tmp_path / "wh"))
    base = spark.range(1, 11).select(
        F.col("id").alias("k"), F.lit("a").alias("p"), F.lit(0).alias("v")
    )
    wh.write(base, "dwh", "t", partition_by=["p"])

    batch = spark.createDataFrame([(1, "a", 99)], "k long, p string, v int")
    done = threading.Event()

    def _merge():
        wh.merge(spark, "dwh", "t", batch, ["k"], "p")
        done.set()

    with wh._table_lock("dwh", "t"):
        th = threading.Thread(target=_merge)
        th.start()
        # the merge must be blocked BEFORE its read; give it time to
        # (wrongly) race ahead, then rewrite the table under our hold
        done.wait(timeout=1.0)
        assert not done.is_set()
        wh.write(
            wh.read(spark, "dwh", "t").filter(F.col("k") != 5),
            "dwh", "t", partition_by=["p"],
        )
    th.join(timeout=120)
    assert done.is_set()
    rows = {r.k: r.v for r in wh.read(spark, "dwh", "t").collect()}
    assert 5 not in rows  # the concurrent delete survives the merge
    assert rows[1] == 99  # and the merge's upsert landed
    assert set(rows) == {1, 2, 3, 4, 6, 7, 8, 9, 10}


def test_compact_join_view_orphan_expiry_and_replay(spark, tmp_path):
    """Orphan retention: compaction with ``expire_orphans_below`` drops
    only orphan rows below the partition cutoff (the view ledger is
    untouched), a replayed fact batch does NOT resurrect expired
    orphans (markers skip it), and a later dim insert claims only the
    surviving orphans."""
    from pyspark.sql import functions as F

    from data_platform_spark.ops.join_view import (
        compact_join_view,
        incremental_join_view,
        join_view_dim_upsert_persisted,
    )
    from data_platform_spark.pipeline import Warehouse
    from data_platform_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    wh = Warehouse(str(tmp_path / "wh"))
    orders = load_table(spark, SF_SMOKE, "orders").withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    cust = load_table(spark, SF_SMOKE, "customer")
    kw = _jv_kwargs()
    # partial dim -> every order of a %5==0 customer parks as an orphan
    dim0 = cust.filter(F.pmod("c_custkey", F.lit(5)) != 0)
    b0 = orders.filter(F.pmod("o_orderkey", F.lit(2)) == 0)
    incremental_join_view(spark, wh, "dwh", "oc", b0, dim0, batch_id="b0", **kw)
    orph = wh.read(spark, "dwh", "oc__orphans")
    n_orph = orph.count()
    cutoff = "1997-01"
    n_old = orph.filter(F.col("o_month") < cutoff).count()
    assert 0 < n_old < n_orph  # the cutoff splits the ledger both ways
    n_view = wh.read(spark, "dwh", "oc").count()

    # dry-run first (VERDICT r15 item 6): the preview reports exactly
    # what the real run will drop — and mutates NOTHING
    preview = compact_join_view(
        spark, wh, "dwh", "oc", "o_month",
        expire_orphans_below=cutoff, dry_run=True,
    )
    assert preview["dry_run"] and preview["orphans_expired"] == n_old
    assert (
        sum(preview["orphans_expired_by_partition"].values()) == n_old
    )
    assert all(p < cutoff for p in preview["orphans_expired_by_partition"])
    assert wh.read(spark, "dwh", "oc__orphans").count() == n_orph
    assert wh.read(spark, "dwh", "oc").count() == n_view

    out = compact_join_view(
        spark, wh, "dwh", "oc", "o_month", expire_orphans_below=cutoff
    )
    assert out["orphans_expired"] == n_old
    kept = wh.read(spark, "dwh", "oc__orphans")
    assert kept.count() == n_orph - n_old
    assert kept.filter(F.col("o_month") < cutoff).count() == 0
    assert wh.read(spark, "dwh", "oc").count() == n_view  # view untouched

    # replaying the SAME fact batch skips on its marker: expiry is
    # durable against at-least-once delivery
    assert (
        incremental_join_view(
            spark, wh, "dwh", "oc", b0, dim0, batch_id="b0", **kw
        )
        == []
    )
    assert wh.read(spark, "dwh", "oc__orphans").count() == n_orph - n_old

    # a late dim insert claims ONLY surviving orphans; expired facts of
    # the same keys stay forgotten
    missing = cust.filter(F.pmod("c_custkey", F.lit(5)) == 0)
    n_claimable = kept.join(
        missing, kept["o_custkey"] == missing["c_custkey"], "left_semi"
    ).count()
    join_view_dim_upsert_persisted(
        spark, wh, "dwh", "oc", missing, batch_id="d0", **kw
    )
    final_view = wh.read(spark, "dwh", "oc")
    assert final_view.count() == n_view + n_claimable
    # all surviving orphans were claimable at sf0.001 -> ledger emptied
    # (an empty merge leaves the table root with no partition dirs)
    from data_platform_spark.ops.join_view import _has_data

    assert not _has_data(wh, "dwh", "oc__orphans", "o_month")
