#!/usr/bin/env python
"""Dump the EXECUTED (AQE-final) physical plan for named queries.

`explain("formatted")` before execution shows the initial plan
(`isFinalPlan=false`); exchange/stage REUSE decisions under AQE only
appear in the final plan after the query has run (guide §7.2). This
runs each query through the noop sink and prints
`queryExecution.executedPlan` — the artifact that can prove (or refute)
a ReusedExchange / table-cache-hit claim.

Usage: python scripts/dump_final_plan.py <outdir> <suffix> <query> [...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_platform_spark.cache import release_caches  # noqa: E402
from data_platform_spark.queries import all_queries  # noqa: E402
from data_platform_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="dps-final-plans")
    queries = all_queries()
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # keep going; record the failure
            plan = f"ERROR: {type(e).__name__}: {e}"
        finally:
            release_caches()
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
