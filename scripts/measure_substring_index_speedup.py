#!/usr/bin/env python
"""Quantify the persisted gram-posting index's O(batch)-vs-O(corpus)
claim (the substring member of the measure_neardup_index_speedup.py
family).

The daily exact-substring job finds the new ingest batch's verbatim
spans against the standing corpus. Two paths produce identical spans
(asserted in tests/test_ops.py and gate-checked by
substring_index_roundtrip):

  - RECOMPUTE (the oracle-gated query incremental_substring_spans):
    char-gram the ENTIRE corpus per run, df-cap over the union, then
    the bipartite + batch-self diagonal-island spans;
  - INDEXED (ops/substring_index.py): read the persisted (postings, df)
    halves bucket-pruned to the batch's gram buckets; gram only the
    batch.

Each timed run fully materializes via a noop write on a cleared SQL
cache (the query scope-persists its gram relations; without clearing,
later runs would time cache hits).

Reading the result honestly: the stage the index ELIMINATES is the
corpus scan + stride-1 gram explode + df count (rows ∝ corpus CHARS —
the dominant cost at scale); the span algebra over candidates is
identical work in both paths. make_scale.py replication inflates span
density far above any real corpus, so the end-to-end gap UNDERSTATES
the production win. The structural O(batch) property (no standing-text
access, index-only parquet scans) is proven by the plan + poisoned-
standing tests in tests/test_ops.py, not by wall clock at local scale.

Prints a markdown row (paste into PLANS.md) plus one JSON line.

Usage: python scripts/measure_substring_index_speedup.py [sf_dir] [runs]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_platform_spark.ops.substring_index import (  # noqa: E402
    build_substring_index,
    substring_search_index,
)
from data_platform_spark.queries.dedup import (  # noqa: E402
    INCR_NEW_MOD,
    SUBSTR_DF_CAP,
    SUBSTR_K,
    SUBSTR_MIN_LEN,
    incremental_substring_spans,
)
from data_platform_spark.session import get_spark  # noqa: E402
from data_platform_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="substring-index-bench")

    docs = load_table(spark, sf_dir, "documents")
    standing = docs.filter(F.col("doc_id") % INCR_NEW_MOD != 0)
    batch = docs.filter(F.col("doc_id") % INCR_NEW_MOD == 0).select(
        "doc_id", "text"
    )
    n_corpus, n_batch = docs.count(), batch.count()

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "substr_index")
        t0 = time.perf_counter()
        build_substring_index(
            standing, path, k=SUBSTR_K, df_cap=SUBSTR_DF_CAP,
            min_len=SUBSTR_MIN_LEN,
        )
        build_s = time.perf_counter() - t0

        recompute, indexed = [], []
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df1 = incremental_substring_spans(spark, sf_dir)
            df1.write.format("noop").mode("overwrite").save()
            recompute.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df2 = substring_search_index(spark, path, batch)
            df2.write.format("noop").mode("overwrite").save()
            indexed.append(time.perf_counter() - t0)
        # one equality check outside the timed loop
        assert df1.count() == df2.count()

    rec_med = statistics.median(recompute)
    idx_med = statistics.median(indexed)
    print(
        f"| {os.path.basename(sf_dir.rstrip('/'))} | corpus {n_corpus} / "
        f"batch {n_batch} | build {build_s:.2f}s (once) | "
        f"recompute {rec_med:.2f}s | indexed {idx_med:.2f}s |"
    )
    print(
        json.dumps(
            {
                "metric": "substring_index_speedup",
                "sf_dir": sf_dir,
                "n_corpus": n_corpus,
                "n_batch": n_batch,
                "build_once_s": round(build_s, 3),
                "recompute_median_s": round(rec_med, 3),
                "indexed_median_s": round(idx_med, 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
