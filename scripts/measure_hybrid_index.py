#!/usr/bin/env python
"""Measure serving-path speedup of the persisted hybrid index
(ops/hybrid_index.hybrid_search_index) vs the oracled full re-derive
(queries/text.hybrid_rrf_topk) on the same corpus.

The oracled query re-tokenizes the corpus and re-scans every embedding
per call so DuckDB can verify the math; the persisted composition reads
only pruned index slices. This script records both wall-clocks at a
given SF plus the index build cost, so PLANS.md can carry the
amortization argument with numbers instead of adjectives.

Usage: python scripts/measure_hybrid_index.py [sf_dir] [n_serves] [mult]
       [width]

``mult`` > 1 replicates the EMBEDDING corpus with fresh vec_ids (the
measure_ivfpq_index pattern) so the dense-leg scan-bound differences —
raw-vector cells vs compressed codes — are visible above fixed
per-query overhead; the lexical corpus stays as-is (the lexical leg is
the same in every variant).

``width`` > 1 tiles each embedding to width×64 dims (array_repeat →
flatten — relative distances and the cluster structure are preserved,
only the bytes-per-vector change), the production-width probe VERDICT
r11 item 6 asked for: the raw dense leg scans width×512 B per probed
vector while the compressed leg's codes stay constant-size, so the
crossover moves decisively toward ivfpq as width grows. The oracled
re-derive reads the table as-is, so it is skipped when width > 1 (the
comparison of interest is raw-leg vs compressed-leg serving)."""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_SERVES = int(sys.argv[2]) if len(sys.argv) > 2 else 5
MULT = int(sys.argv[3]) if len(sys.argv) > 3 else 1
WIDTH = int(sys.argv[4]) if len(sys.argv) > 4 else 1
WORK = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scale",
    "hybrid-measure",
)


def main() -> None:
    from data_platform_spark.cache import release_caches
    from data_platform_spark.ops.ann_index import build_ivf_index
    from data_platform_spark.ops.hybrid_index import hybrid_search_index
    from data_platform_spark.ops.ivfpq_index import build_ivfpq_index
    from data_platform_spark.ops.lexical_index import build_lexical_index
    from data_platform_spark.queries.text import (
        BM25_QUERY_TERMS,
        hybrid_rrf_topk,
    )
    from data_platform_spark.session import get_spark
    from data_platform_spark.sources.tables import load_table

    spark = get_spark(app_name="measure-hybrid")
    shutil.rmtree(WORK, ignore_errors=True)
    lex_path, ivf_path = f"{WORK}/lex", f"{WORK}/ivf"
    pq_path = f"{WORK}/ivfpq"

    docs = load_table(spark, SF, "documents")
    emb = load_table(spark, SF, "embeddings")
    if WIDTH > 1:
        emb = emb.select(
            "vec_id",
            "label",
            F.flatten(F.array_repeat(F.col("embedding"), WIDTH)).alias(
                "embedding"
            ),
        )
    if MULT > 1:
        # offset from max(vec_id)+1, not count()+1: sparse or large ids
        # would silently collide across copies under a count-derived
        # stride and skew the measured corpus size (ADVICE r11)
        stride = emb.agg(F.max("vec_id")).collect()[0][0] + 1
        copies = spark.range(MULT).select(F.col("id").alias("rep"))
        emb = (
            emb.crossJoin(copies)
            .select(
                (F.col("vec_id") + F.col("rep") * stride).alias("vec_id"),
                "label",
                "embedding",
            )
            .localCheckpoint()
        )
    t0 = time.perf_counter()
    build_lexical_index(docs, lex_path)
    t_lex = time.perf_counter() - t0
    t0 = time.perf_counter()
    build_ivf_index(emb, ivf_path, k=8)
    t_ivf = time.perf_counter() - t0
    t0 = time.perf_counter()
    build_ivfpq_index(emb, pq_path, n_cells=8)
    t_pq = time.perf_counter() - t0

    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]

    def timed(fn) -> list[float]:
        out = []
        for _ in range(N_SERVES):
            t = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            release_caches()
            out.append(round(time.perf_counter() - t, 3))
        return out

    rederive = (
        timed(lambda: hybrid_rrf_topk(spark, SF)) if WIDTH == 1 else []
    )
    served_exact = timed(
        lambda: hybrid_search_index(
            spark, lex_path, ivf_path, BM25_QUERY_TERMS, qvec,
            topk=20, nprobe=8, exclude_ids=[0],
        )
    )
    served_pruned = timed(
        lambda: hybrid_search_index(
            spark, lex_path, ivf_path, BM25_QUERY_TERMS, qvec,
            topk=20, nprobe=2, exclude_ids=[0],
        )
    )
    # the compressed dense leg (round 11): probed cells read codes only;
    # full vectors join in from the corpus for the ADC shortlist.
    # Swept over shortlist sizes (VERDICT r11 item 6): the shortlist
    # bounds the full-precision refine join, so a larger one trades
    # refine cost for recall headroom.
    served_ivfpq_by_sl = {
        sl: timed(
            lambda sl=sl: hybrid_search_index(
                spark, lex_path, pq_path, BM25_QUERY_TERMS, qvec,
                topk=20, nprobe=2, exclude_ids=[0],
                dense="ivfpq", corpus_emb=emb, shortlist=sl,
            )
        )
        for sl in (20, 100, 400)
    }
    served_ivfpq = served_ivfpq_by_sl[100]
    print(f"sf_dir={SF} n_serves={N_SERVES} mult={MULT} width={WIDTH}")
    print(f"build: lexical={t_lex:.2f}s ivf={t_ivf:.2f}s ivfpq={t_pq:.2f}s")
    print(f"re-derive (oracled query): {rederive}")
    print(f"served nprobe=8 (exact):   {served_exact}")
    print(f"served nprobe=2 (pruned):  {served_pruned}")
    for sl, ts in served_ivfpq_by_sl.items():
        print(f"served ivfpq nprobe=2 shortlist={sl}: {ts}")
    med = lambda xs: sorted(xs)[len(xs) // 2] if xs else float("nan")
    print(
        f"medians: rederive={med(rederive)} exact={med(served_exact)} "
        f"pruned={med(served_pruned)} ivfpq={med(served_ivfpq)} "
        f"ivfpq_sl20={med(served_ivfpq_by_sl[20])} "
        f"ivfpq_sl400={med(served_ivfpq_by_sl[400])}"
    )
    spark.stop()
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
