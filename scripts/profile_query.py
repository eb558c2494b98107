#!/usr/bin/env python
"""Per-query profiling harness for the optimization rounds (guide §1).

For each named query: one untimed warm run, then a timed run split into
BUILD (the query function call — driver-side composition including any
eager actions: seed collects, localCheckpoints, fixpoint rounds) and
MATERIALIZE (the noop write of the returned DataFrame), with Spark
job/stage/task counts per phase via the status tracker.

Usage: python scripts/profile_query.py <query> [<query> ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_platform_spark.cache import release_caches  # noqa: E402
from data_platform_spark.queries import all_queries  # noqa: E402
from data_platform_spark.session import get_spark  # noqa: E402


def _counts(spark, group: str):
    st = spark.sparkContext.statusTracker()
    job_ids = st.getJobIdsForGroup(group)
    n_stages = 0
    n_tasks = 0
    for j in job_ids:
        info = st.getJobInfo(j)
        if info is None:
            continue
        for s in info.stageIds:
            si = st.getStageInfo(s)
            if si is not None:
                n_stages += 1
                n_tasks += si.numTasks
    return len(job_ids), n_stages, n_tasks


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="dps-profile")
    queries = all_queries()
    names = sys.argv[1:]
    print(f"{'query':42s} {'build_s':>8s} {'mat_s':>8s} {'jobs':>5s} "
          f"{'stages':>6s} {'tasks':>6s} {'mjobs':>5s}")
    for name in names:
        # warm (codegen + file listing)
        try:
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
        finally:
            release_caches()
        sc = spark.sparkContext
        group = f"profile-{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        t1 = time.perf_counter()
        bjobs, bstages, btasks = _counts(spark, group)
        group2 = f"profile-mat-{name}"
        sc.setJobGroup(group2, name)
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        mjobs, mstages, mtasks = _counts(spark, group2)
        release_caches()
        sc.setJobGroup(None, None)
        print(f"{name:42s} {t1 - t0:8.2f} {t2 - t1:8.2f} {bjobs:5d} "
              f"{bstages + mstages:6d} {btasks + mtasks:6d} {mjobs:5d}")
    spark.stop()


if __name__ == "__main__":
    main()
