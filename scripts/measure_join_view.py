"""Measure persisted join-view maintenance vs standing view size.

The 100 TB claim under test (ops/join_view.py): folding a fact batch into
the stored denormalized view costs O(batch + touched partitions),
INDEPENDENT of how large the standing view has grown, while the naive
alternative — re-joining the full fact table and rewriting the view —
grows linearly with it. A dim-upsert batch likewise touches only the rows
referencing changed keys.

Protocol: replicate the sf0.001 orders table x{1,20,60} (key-shifted
copies, the make_scale discipline) as the STANDING fact history already
folded in; then measure (a) folding ONE fixed-size, TIME-LOCAL fresh
batch (all rows in one new month — the shape a daily fact feed has, so
the merge rewrites ONE partition), (b) one fixed-size dim-upsert (cost
honestly grows with the number of standing rows REFERENCING the changed
keys — at fixed key-change share that is proportional to the corpus; the
saving vs naive is that untouched-partition rows are never read), and
(c) the naive alternative: full re-join of the whole standing fact +
full view rewrite. A warmup fold on a scratch warehouse runs first so
JVM/codegen startup is not billed to x1. Wall-clocks print as one JSON
line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_platform_spark.ops.join_view import (
    incremental_join_view,
    join_view_dim_upsert_persisted,
)
from data_platform_spark.pipeline import Warehouse
from data_platform_spark.session import get_spark
from data_platform_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"
KW = dict(
    fact_on="o_custkey",
    dim_on="c_custkey",
    fact_key="o_orderkey",
    dim_payload=["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    partition_col="o_month",
)


def replicate(orders, mult: int, stride: int):
    parts = [
        orders.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * stride))
        for i in range(mult)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    spark = get_spark(shuffle_partitions=16)
    orders = load_table(spark, SF_DIR, "orders").withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    cust = load_table(spark, SF_DIR, "customer")
    stride = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    n_batch = orders.count()

    # warmup: one full fold+upsert cycle on a scratch warehouse
    wtmp = tempfile.mkdtemp(prefix="jv_warm_")
    wwh = Warehouse(wtmp + "/wh")
    incremental_join_view(
        spark, wwh, "dwh", "oc", orders, cust, batch_id="w0", **KW
    )
    incremental_join_view(
        spark, wwh, "dwh", "oc",
        orders.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(stride)),
        cust, batch_id="w1", **KW,
    )
    shutil.rmtree(wtmp, ignore_errors=True)

    results = {}
    for mult in (1, 20, 60):
        tmp = tempfile.mkdtemp(prefix="jv_scale_")
        wh = Warehouse(tmp + "/wh")
        standing = replicate(orders, mult, stride).localCheckpoint()
        incremental_join_view(
            spark, wh, "dwh", "oc", standing, cust, batch_id="seed", **KW
        )
        # time-local fresh batch: same rows, keys shifted past the
        # standing range, every row landed in ONE new month partition
        fresh = (
            orders.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(mult * stride)
            )
            .withColumn("o_month", F.lit("2030-01"))
            .localCheckpoint()
        )

        t0 = time.monotonic()
        incremental_join_view(
            spark, wh, "dwh", "oc", fresh, cust, batch_id="probe", **KW
        )
        t_fact = time.monotonic() - t0

        upserts = cust.filter(F.pmod("c_custkey", F.lit(7)) == 0).select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
            F.concat(F.col("c_mktsegment"), F.lit("_V2")).alias("c_mktsegment"),
        )
        t0 = time.monotonic()
        join_view_dim_upsert_persisted(
            spark, wh, "dwh", "oc", upserts, batch_id="dim-probe", **KW
        )
        t_dim = time.monotonic() - t0

        # naive: full re-join of the entire standing fact + full rewrite
        all_fact = standing.unionByName(fresh)
        t0 = time.monotonic()
        full = all_fact.join(
            cust, all_fact["o_custkey"] == cust["c_custkey"], "inner"
        ).drop("c_custkey")
        wh.write(full, "dwh", "oc_naive", partition_by=["o_month"])
        t_naive = time.monotonic() - t0

        results[f"x{mult}"] = {
            "standing_rows": n_batch * mult,
            "fold_fresh_batch_s": round(t_fact, 3),
            "dim_upsert_s": round(t_dim, 3),
            "naive_full_rejoin_s": round(t_naive, 3),
        }
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({"metric": "join_view_maintenance_scale", **results}))

    measure_scd2(spark, orders, cust, stride, n_batch)


def _versions(cust, closed: bool):
    """Version table over the customer dim: one open raw version per key;
    with ``closed`` the mod-7 keys close v1 at the cutoff and open a
    mutated v2 (the measurement's SCD2 dim batch)."""
    lo = F.to_timestamp(F.lit("1000-01-01"))
    hi = F.to_timestamp(F.lit("5000-01-01"))
    cut = F.to_timestamp(F.lit("1998-01-01"))
    payload = ["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    if not closed:
        return cust.select(
            "c_custkey", *payload, lo.alias("valid_from"), hi.alias("valid_to")
        )
    is7 = F.pmod("c_custkey", F.lit(7)) == 0
    v1 = cust.select(
        "c_custkey",
        *payload,
        lo.alias("valid_from"),
        F.when(is7, cut).otherwise(hi).alias("valid_to"),
    )
    v2 = cust.filter(is7).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
        F.concat(F.col("c_mktsegment"), F.lit("_V2")).alias("c_mktsegment"),
        cut.alias("valid_from"),
        hi.alias("valid_to"),
    )
    return v1.unionByName(v2)


def measure_scd2(spark, orders, cust, stride: int, n_batch: int) -> None:
    """SCD2 twin of the SCD1 measurement (VERDICT r13 item 7): fold a
    fixed time-local batch as the standing view grows x{1,20,60}; run
    one SCD2 dim batch (mod-7 keys close+reopen at the cutoff — its
    honest cost is the standing rows of changed keys dated ON OR AFTER
    the cutoff, about half the SCD1 dim delta here since facts on
    closed versions are never read); and the naive one-shot as-of
    re-join of the full standing fact for the column alongside."""
    import datetime

    from data_platform_spark.ops.scd2_join_view import (
        incremental_scd2_join_view,
        scd2_join_view_dim_persisted,
    )

    kw = dict(
        fact_on="o_custkey",
        dim_on="c_custkey",
        fact_key="o_orderkey",
        event_col="o_orderdate",
        dim_payload=["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
        partition_col="o_month",
    )
    v0 = _versions(cust, closed=False).localCheckpoint()
    v1 = _versions(cust, closed=True).localCheckpoint()
    touched = cust.filter(F.pmod("c_custkey", F.lit(7)) == 0).select(
        "c_custkey"
    )
    cut = datetime.datetime(1998, 1, 1)

    # warmup on a scratch warehouse
    wtmp = tempfile.mkdtemp(prefix="jv2_warm_")
    wwh = Warehouse(wtmp + "/wh")
    incremental_scd2_join_view(
        spark, wwh, "dwh", "oc2", orders, v0, batch_id="w0", **kw
    )
    scd2_join_view_dim_persisted(
        spark, wwh, "dwh", "oc2", v1, touched, cut, batch_id="wd", **kw
    )
    shutil.rmtree(wtmp, ignore_errors=True)

    results = {}
    for mult in (1, 20, 60):
        tmp = tempfile.mkdtemp(prefix="jv2_scale_")
        wh = Warehouse(tmp + "/wh")
        standing = replicate(orders, mult, stride).localCheckpoint()
        incremental_scd2_join_view(
            spark, wh, "dwh", "oc2", standing, v0, batch_id="seed", **kw
        )
        fresh = (
            orders.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(mult * stride)
            )
            .withColumn("o_month", F.lit("2030-01"))
            .localCheckpoint()
        )

        t0 = time.monotonic()
        incremental_scd2_join_view(
            spark, wh, "dwh", "oc2", fresh, v0, batch_id="probe", **kw
        )
        t_fact = time.monotonic() - t0

        t0 = time.monotonic()
        scd2_join_view_dim_persisted(
            spark, wh, "dwh", "oc2", v1, touched, cut, batch_id="dim-probe",
            **kw,
        )
        t_dim = time.monotonic() - t0

        all_fact = standing.unionByName(fresh)
        t0 = time.monotonic()
        dimr = v1.withColumnRenamed("c_custkey", "_k")
        full = all_fact.join(
            dimr,
            (all_fact["o_custkey"] == dimr["_k"])
            & (all_fact["o_orderdate"] >= dimr["valid_from"])
            & (all_fact["o_orderdate"] < dimr["valid_to"]),
            "inner",
        ).drop("_k", "valid_to")
        wh.write(full, "dwh", "oc2_naive", partition_by=["o_month"])
        t_naive = time.monotonic() - t0

        results[f"x{mult}"] = {
            "standing_rows": n_batch * mult,
            "fold_fresh_batch_s": round(t_fact, 3),
            "scd2_dim_batch_s": round(t_dim, 3),
            "naive_full_asof_rejoin_s": round(t_naive, 3),
        }
        shutil.rmtree(tmp, ignore_errors=True)
    print(
        json.dumps({"metric": "scd2_join_view_maintenance_scale", **results})
    )


if __name__ == "__main__":
    main()
