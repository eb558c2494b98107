#!/usr/bin/env python
"""Sweep ``coarse_nprobe`` for the two-level centroid assignment
(VERDICT r12 item 7): at coarse_nprobe=1 the two-level router carries a
measured 16-19% routing disagreement vs flat exact argmin on the
isotropic gate corpus (honestly reported via the
kmeans_two_level_assign_profile n_disagree column); multiprobe widens
the candidate set to the nprobe nearest LIVE coarse cells at cost
O(n·(sqrt(k) + nprobe·k/sqrt(k))·d). This script measures, per
coarse_nprobe ∈ {1, 2, 4, full}:

- wall-clock (median of RUNS noop-writes of the assignment);
- disagreement share vs flat exact assignment (cells differ);
- assigned-distance inflation: sum(dist2_two) / sum(dist2_flat) — the
  QUALITY cost of a mis-route (a disagreement that lands in an
  equidistant cell costs nothing; this catches the ones that matter).

Same harness conventions as measure_two_level_assign.py: centroids are
a deterministic hash-sample of the corpus at the SemDeDup posture
(k = n/64), so cost depends only on (n, k, d). Results land in
PLANS.md's round-13 table; the chosen operating point is pinned by a
gate in tests/test_ann_recall.py.

Usage: python scripts/measure_two_level_multiprobe.py [sf_dir] [mult] [runs]
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

    spark = get_spark(app_name="measure-two-level-multiprobe")
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
    coarse_k = max(1, int(-(-(k**0.5) // 1)))
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
    print(f"n={n} k={k} coarse_k={coarse_k} dim=64 runs={RUNS}", flush=True)

    flat = ivf_assign(emb, cents).localCheckpoint()
    flat_sum = flat.agg(
        F.sum("dist2").alias("s"), F.count(F.lit(1)).alias("c")
    ).collect()[0]

    def timed(fn):
        out = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            out.append(round(time.perf_counter() - t0, 2))
        return statistics.median(out), out

    for nprobe in (1, 2, 4, coarse_k):
        med, runs = timed(
            lambda: ivf_assign_two_level(
                emb, cents, coarse_k=coarse_k, coarse_nprobe=nprobe
            )
        )
        two = ivf_assign_two_level(
            emb, cents, coarse_k=coarse_k, coarse_nprobe=nprobe
        )
        j = two.alias("t").join(
            flat.alias("f"), F.col("t.vec_id") == F.col("f.vec_id")
        )
        row = j.agg(
            F.sum(
                F.when(
                    F.col("t.assigned_label") != F.col("f.assigned_label"), 1
                ).otherwise(0)
            ).alias("nd"),
            F.sum("t.dist2").alias("sd"),
        ).collect()[0]
        tag = "full" if nprobe >= coarse_k else str(nprobe)
        print(
            f"coarse_nprobe={tag}: median={med}s runs={runs} "
            f"disagree={row['nd']}/{flat_sum['c']} "
            f"({round(100.0 * row['nd'] / flat_sum['c'], 2)}%) "
            f"dist2_inflation={round(row['sd'] / flat_sum['s'], 4)}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
