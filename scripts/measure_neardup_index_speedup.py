#!/usr/bin/env python
"""Quantify the persisted band index's O(batch)-vs-O(corpus) claim.

The daily near-dup job checks a small ingest batch against the standing
corpus. Three paths produce identical reports (asserted in
tests/test_ops.py):

  - RECOMPUTE (the oracle-gated query): shingle + signature the ENTIRE
    corpus per run, then the bipartite band join;
  - INDEXED (ops/neardup_index.py): read the persisted (bands, shingles)
    halves; shingle + signature only the batch;
  - CAND-ONLY: persisted bands for candidates, verification shingles
    re-derived from only the candidate standing docs (semi-join).

Each timed run fully materializes via a noop write on a cleared SQL
cache (count() alone lets Spark skip most of the pipeline, and the
query's persist()s would otherwise serve later runs from cache).

Reading the result honestly: the stage the index ELIMINATES is the
corpus scan+shingle+signature; the verification of band candidates is
identical work in every path. On make_scale.py-derived corpora the
20x replication makes near-dup density (and so verification cost) far
above any real corpus — the measured end-to-end gap UNDERSTATES the
production win, where candidates are sparse and the corpus scan
dominates. The structural O(batch) property (no standing-text access,
index-only parquet scans) is proven by the plan test in
tests/test_ops.py, not by wall clock at local scale.

Prints a markdown row (paste into PLANS.md) plus one JSON line.

Usage: python scripts/measure_neardup_index_speedup.py [sf_dir] [runs]
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

from data_platform_spark.ops.neardup_index import (  # noqa: E402
    build_band_index,
    incremental_neardup_report,
)
from data_platform_spark.queries.dedup import (  # noqa: E402
    INCR_NEW_MOD,
    JACCARD_THRESHOLD,
    incremental_neardup_new_batch,
)
from data_platform_spark.session import get_spark  # noqa: E402
from data_platform_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="neardup-index-bench")

    docs = load_table(spark, sf_dir, "documents")
    standing = docs.filter(F.col("doc_id") % INCR_NEW_MOD != 0)
    batch = docs.filter(F.col("doc_id") % INCR_NEW_MOD == 0).select(
        "doc_id", "text"
    )
    n_corpus, n_batch = docs.count(), batch.count()

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "band_index")
        t0 = time.perf_counter()
        build_band_index(standing, path)
        build_s = time.perf_counter() - t0

        recompute, indexed, cand_only = [], [], []
        for _ in range(runs):
            # clearCache between runs: the recompute query persist()s its
            # shingle/signature relations, and Spark's cache manager
            # matches by canonicalized plan — without this, every run
            # after the first would time a cache hit, not the recompute
            # the daily job actually pays.
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df1 = incremental_neardup_new_batch(spark, sf_dir)
            df1.write.format("noop").mode("overwrite").save()
            recompute.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df2 = incremental_neardup_report(
                spark, path, batch, threshold=JACCARD_THRESHOLD
            )
            df2.write.format("noop").mode("overwrite").save()
            indexed.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df3 = incremental_neardup_report(
                spark, path, batch, threshold=JACCARD_THRESHOLD,
                standing_docs=standing,
            )
            df3.write.format("noop").mode("overwrite").save()
            cand_only.append(time.perf_counter() - t0)
        # one equality check outside the timed loop
        assert df1.count() == df2.count() == df3.count()

    rec_med = statistics.median(recompute)
    idx_med = statistics.median(indexed)
    cand_med = statistics.median(cand_only)
    print(
        f"| {os.path.basename(sf_dir.rstrip('/'))} | corpus {n_corpus} / "
        f"batch {n_batch} | build {build_s:.2f}s (once) | "
        f"recompute {rec_med:.2f}s | indexed {idx_med:.2f}s | "
        f"cand-only {cand_med:.2f}s |"
    )
    print(
        json.dumps(
            {
                "metric": "neardup_index_speedup",
                "sf_dir": sf_dir,
                "n_corpus": n_corpus,
                "n_batch": n_batch,
                "build_once_s": round(build_s, 3),
                "recompute_median_s": round(rec_med, 3),
                "indexed_median_s": round(idx_med, 3),
                "candidates_only_median_s": round(cand_med, 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
