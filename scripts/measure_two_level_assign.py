#!/usr/bin/env python
"""Measure flat vs two-level nearest-centroid assignment at
corpus-proportional k (the VERDICT r11 item 1 term).

Flat ``ivf_assign`` broadcasts all k centroids into the posexploded
join: O(n·k·d) distance work. ``ivf_assign_two_level`` routes through a
ceil(sqrt(k))-cell coarse quantizer: O(n·sqrt(k)·d), no
corpus-proportional broadcast. This script times both on the SAME
centroid set at the SemDeDup posture (k = n / 64), so PLANS.md can
carry the crossover with numbers instead of complexity classes.

Centroids are a deterministic hash-sample of the corpus itself (every
64th vector by xxhash64 order, relabeled 0..k-1) — the assignment cost
depends only on (n, k, d), not on centroid quality, and sampling skips
an expensive flat k-means build that would dwarf the thing being
measured.

Usage: python scripts/measure_two_level_assign.py [sf_dir] [mult] [runs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
MULT = int(sys.argv[2]) if len(sys.argv) > 2 else 16
RUNS = int(sys.argv[3]) if len(sys.argv) > 3 else 3


def main() -> None:
    from data_platform_spark.functions.similarity import (
        as_double,
        ivf_assign,
        ivf_assign_two_level,
    )
    from data_platform_spark.ops.global_order import global_row_number
    from data_platform_spark.session import get_spark
    from data_platform_spark.sources.tables import load_table

    spark = get_spark(app_name="measure-two-level")
    emb = load_table(spark, SF, "embeddings")
    if MULT > 1:
        stride = emb.agg(F.max("vec_id")).collect()[0][0] + 1
        copies = spark.range(MULT).select(F.col("id").alias("rep"))
        emb = emb.crossJoin(copies).select(
            (F.col("vec_id") + F.col("rep") * stride).alias("vec_id"),
            "label",
            "embedding",
        )
    emb = emb.select("vec_id", "embedding").localCheckpoint()
    n = emb.count()
    k = max(1, n // 64)
    # deterministic sample of k corpus vectors as the centroid set,
    # relabeled 0..k-1 (the long layout ivf_assign expects)
    seeds = (
        global_row_number(
            emb, [F.asc(F.xxhash64(F.col("vec_id"))), F.asc("vec_id")], "__rn"
        )
        .filter(F.col("__rn") <= k)
        .select((F.col("__rn") - 1).cast("int").alias("label"), "embedding")
    )
    cents = seeds.select(
        "label", F.posexplode(as_double(F.col("embedding"))).alias("pos", "x")
    ).select(
        "label", "pos", (F.floor(F.col("x") * 10_000 + F.lit(0.5)) / 10_000)
        .alias("centroid_val"),
    ).localCheckpoint()
    print(f"n={n} k={k} dim=64 runs={RUNS}")

    def timed(name, fn):
        out = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            out.append(round(time.perf_counter() - t0, 2))
        print(
            f"{name}: median={statistics.median(out)} runs={out}",
            flush=True,
        )
        return statistics.median(out)

    t_two = timed(
        "two-level assign (O(n*sqrt(k)*d))",
        lambda: ivf_assign_two_level(emb, cents),
    )
    t_flat = timed(
        "flat assign      (O(n*k*d))     ",
        lambda: ivf_assign(emb, cents),
    )
    print(f"speedup: {round(t_flat / t_two, 2)}x at k={k}")
    spark.stop()


if __name__ == "__main__":
    main()
