#!/usr/bin/env python
"""Measure the composed IVF-PQ index's serving cost against its two
parents on the same corpus: flat PQ (all codes scanned, compressed
bytes) and raw IVF (pruned cells, full-precision bytes), plus the
brute-force exact cosine baseline. Records build cost and median serve
wall-clock per path, so PLANS.md carries the composition argument with
numbers: IVF bounds IO (nprobe/n_cells of the corpus), PQ bounds bytes
(codes vs float vectors) — the composed index inherits both bounds.

Usage: python scripts/measure_ivfpq_index.py [sf_dir] [n_serves] [mult]

``mult`` > 1 replicates the embedding corpus (fresh vec_ids) so the
scan-bound differences are visible above fixed per-query overhead at
local test scale.
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_SERVES = int(sys.argv[2]) if len(sys.argv) > 2 else 5
MULT = int(sys.argv[3]) if len(sys.argv) > 3 else 8
WORK = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scale",
    "ivfpq-measure",
)


def main() -> None:
    from data_platform_spark.cache import release_caches
    from data_platform_spark.functions.similarity import cosine_topk
    from data_platform_spark.ops.ann_index import (
        build_ivf_index,
        build_pq_index,
        ivf_search_index,
        pq_search_index,
    )
    from data_platform_spark.ops.ivfpq_index import (
        build_ivfpq_index,
        ivfpq_search_index,
    )
    from data_platform_spark.session import get_spark
    from data_platform_spark.sources.tables import load_table

    spark = get_spark()
    emb = load_table(spark, SF, "embeddings")
    if MULT > 1:
        n = emb.count()
        copies = spark.range(MULT).select(F.col("id").alias("rep"))
        emb = emb.crossJoin(copies).select(
            (F.col("vec_id") + F.col("rep") * (n + 1)).alias("vec_id"),
            "label",
            "embedding",
        )
    emb = emb.localCheckpoint()
    n_vec = emb.count()
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]

    shutil.rmtree(WORK, ignore_errors=True)
    paths = {k: os.path.join(WORK, k) for k in ("ivfpq", "pq", "ivf")}

    t0 = time.perf_counter()
    build_ivfpq_index(emb, paths["ivfpq"], n_cells=8)
    t_build_ivfpq = time.perf_counter() - t0
    t0 = time.perf_counter()
    build_pq_index(emb, paths["pq"])
    t_build_pq = time.perf_counter() - t0
    t0 = time.perf_counter()
    build_ivf_index(emb, paths["ivf"], k=8)
    t_build_ivf = time.perf_counter() - t0

    def serve(fn) -> float:
        times = []
        for _ in range(N_SERVES):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            release_caches()
            times.append(time.perf_counter() - t0)
        return statistics.median(times)

    res = {
        "sf": SF,
        "n_vectors": n_vec,
        "build_s": {
            "ivfpq": round(t_build_ivfpq, 2),
            "pq": round(t_build_pq, 2),
            "ivf": round(t_build_ivf, 2),
        },
        "serve_median_s": {
            "ivfpq_nprobe2": round(
                serve(
                    lambda: ivfpq_search_index(
                        spark, paths["ivfpq"], qvec, nprobe=2, k=10,
                        exclude_ids=[0],
                    )
                ),
                3,
            ),
            "ivfpq_full_probe": round(
                serve(
                    lambda: ivfpq_search_index(
                        spark, paths["ivfpq"], qvec, nprobe=8, k=10,
                        exclude_ids=[0],
                    )
                ),
                3,
            ),
            "pq_flat": round(
                serve(
                    lambda: pq_search_index(
                        spark, paths["pq"], qvec, k=10, exclude_ids=[0]
                    )
                ),
                3,
            ),
            "ivf_raw_nprobe2": round(
                serve(
                    lambda: ivf_search_index(
                        spark, paths["ivf"], qvec, nprobe=2, k=10,
                        exclude_ids=[0],
                    )
                ),
                3,
            ),
            "exact_cosine": round(
                serve(
                    lambda: cosine_topk(
                        emb,
                        spark.range(1).select(
                            F.array(
                                *[F.lit(float(x)) for x in qvec]
                            ).alias("q")
                        ),
                        k=10,
                        exclude_ids=[0],
                    )
                ),
                3,
            ),
        },
    }
    import json

    print(json.dumps(res))
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
