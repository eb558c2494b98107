#!/usr/bin/env python
"""Dump .explain('formatted') for bench headline queries into plans/<tag>/.

Usage: python scripts/dump_plans.py <outdir> [suffix] [query ...]

Writes <outdir>/<query>_<suffix>.txt for each headline query (or the
explicit list given). The optimization rounds commit these so the judge
can check plan claims (Exchange counts, join strategies, PushedFilters)
without running Spark.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from data_platform_spark.cache import release_caches  # noqa: E402
from data_platform_spark.queries import all_queries  # noqa: E402
from data_platform_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or list(HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="dps-plans")
    queries = all_queries()
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # keep going; record the failure
            plan = f"ERROR building plan: {type(e).__name__}: {e}"
        finally:
            release_caches()
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(name, "ok" if not plan.startswith("ERROR") else "ERROR")
    spark.stop()


if __name__ == "__main__":
    main()
