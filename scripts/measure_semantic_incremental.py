#!/usr/bin/env python
"""Measure the semantic-dedup PRODUCTION serving claim: a daily batch
decide against the persisted index (ops/semantic_dedup.py) costs
O(batch + the batch's cells), while the oracle-gated query shape pays a
full standing retrain per call. This script grows the STANDING corpus
(x1 / x4 / x10 of sf0.1 via make_scale's perturbed replication) while
holding the BATCH fixed (the 200 sf0.1 vectors with vec_id % 10 == 0,
re-keyed above the standing id range), and times:

- ``build``  — build_semantic_dedup_index over the standing corpus
  (the ONE-time cost the gate query re-pays on every invocation);
- ``decide`` — incremental_semantic_dedup of the fixed batch (median
  of RUNS noop-writes, caches released per run) — the per-batch cost a
  daily curation run actually pays.

The claim to verify: decide stays near-flat as standing grows (the
standing side is pruned to the batch's cell partitions and
survivor-semi-joined; pair fan-out is bounded by cell population),
while build grows with the corpus. Results land in PLANS.md.

Usage: python scripts/measure_semantic_incremental.py [runs]
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
SRC = "/root/testdata/sf0.1"


def main() -> None:
    from data_platform_spark.cache import release_caches
    from data_platform_spark.ops.semantic_dedup import (
        build_semantic_dedup_index,
        incremental_semantic_dedup,
    )
    from data_platform_spark.session import get_spark
    from data_platform_spark.sources.tables import load_table
    from scripts.make_scale import out_dir, scale_tables

    spark = get_spark(app_name="measure-semantic-incremental")
    base_batch = load_table(spark, SRC, "embeddings").filter(
        F.col("vec_id") % 10 == 0
    ).select("vec_id", "embedding")

    for mult in (1, 4, 10):
        if mult == 1:
            sf_dir = SRC
        else:
            sf_dir = out_dir(f"bench-x{mult}-sf0.1")
            if not os.path.isdir(sf_dir):
                scale_tables(spark, SRC, sf_dir, mult, quiet=True)
        standing = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )
        n = standing.count()
        # fixed 200-vector batch, re-keyed above the standing id range
        stride = standing.agg(F.max("vec_id")).collect()[0][0] + 1
        batch = base_batch.select(
            (F.col("vec_id") + F.lit(stride)).alias("vec_id"), "embedding"
        ).localCheckpoint()
        path = tempfile.mkdtemp(prefix=f"dps_sem_x{mult}_") + "/idx"
        t0 = time.perf_counter()
        build_semantic_dedup_index(standing, path)
        release_caches()
        t_build = round(time.perf_counter() - t0, 2)
        decides = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            incremental_semantic_dedup(spark, path, batch).write.format(
                "noop"
            ).mode("overwrite").save()
            decides.append(round(time.perf_counter() - t0, 2))
            release_caches()
        print(
            f"x{mult}: standing={n} batch=200 build={t_build}s "
            f"decide_median={statistics.median(decides)}s runs={decides}",
            flush=True,
        )
        shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
