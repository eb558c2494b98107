#!/usr/bin/env python
"""Ad-hoc A/B timing harness: median-of-N noop materializations for the
named queries in one process (bench.py methodology: warm once on
sf0.001, release caches between runs). For adjudicating single-query
deltas in one host window — NOT the artifact of record.

Usage: python scripts/ab_queries.py <runs> <query> [<query> ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_platform_spark.cache import release_caches  # noqa: E402
from data_platform_spark.queries import all_queries  # noqa: E402
from data_platform_spark.session import get_spark  # noqa: E402

WARM = "/root/testdata/sf0.001"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(sys.argv[1])
    names = sys.argv[2:]
    spark = get_spark(app_name="dps-ab")
    queries = all_queries()
    for name in names:
        try:
            queries[name](spark, WARM).write.format("noop").mode(
                "overwrite").save()
        finally:
            release_caches()
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            try:
                queries[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
            finally:
                release_caches()
            samples.append(time.perf_counter() - t0)
        med = statistics.median(samples)
        print(f"{name}: median={med:.2f} samples="
              + " ".join(f"{s:.2f}" for s in samples), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()


