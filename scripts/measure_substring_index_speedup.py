#!/usr/bin/env python
"""The persisted gram-posting index's O(batch) FOLD evidence: serve a
FIXED batch against standing corpora of growing size and compare the
indexed search (ops/substring_index.py) with the full recompute the
oracle-gated query performs (char-gram the whole union + df-cap + span
algebra per call).

Corpus construction keeps the matched-span workload CONSTANT across
standing sizes so the measurement isolates the standing-size term:
standing docs are distinct seeded-random texts (no cross-doc spans);
half the batch verbatim-copies chunks of the same 25 standing docs at
every size (each copied gram's union df stays 2 — under the cap — so
candidate and span work are identical per row), half is novel. What
grows with standing is exactly what each path pays for corpus size:
the recompute re-grams and df-counts every standing doc per call; the
indexed serve re-reads only the bucket-pruned postings/df partials and
probes them with the broadcast batch-gram set.

Reading the result honestly: both paths produce identical span rows
(asserted). The slope vs standing size is the claim — recompute grows
with the corpus, the indexed serve's growth is the residual pruned
scan. At local scale re-gramming small in-memory texts is cheap CPU,
so the absolute gap understates the production win (at 100 TB the
recompute's standing scan is remote I/O + a corpus-sized shuffle); the
structural O(batch) property (no standing-text access, index-only
parquet scans, broadcast probes) is proven by the plan + poisoned-
standing tests in tests/test_ops.py.

Prints one markdown row per standing size (paste into PLANS.md) plus
one JSON line.

Usage: python scripts/measure_substring_index_speedup.py [runs] [mults]
  e.g. python scripts/measure_substring_index_speedup.py 3 1,4,16
"""

from __future__ import annotations

import json
import os
import random
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from data_platform_spark.functions.dedup import char_gram_df  # noqa: E402
from data_platform_spark.ops.substring_index import (  # noqa: E402
    build_substring_index,
    substring_search_index,
)
from data_platform_spark.session import get_spark  # noqa: E402

BASE_DOCS = 2000
DOC_CHARS = 600
BATCH_DOCS = 50
K, DF_CAP, MIN_LEN = 20, 8, 24


def _text(seed: int, n: int) -> str:
    rng = random.Random(seed)
    return "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(n))


def _standing_rows(mult: int):
    return [
        (i, _text(i, DOC_CHARS)) for i in range(1, BASE_DOCS * mult + 1)
    ]


def _batch_rows():
    rows = []
    for j in range(BATCH_DOCS // 2):
        # verbatim chunk of standing doc j+1 (constant across mults),
        # "Q"-broken boundary so spans are deterministic
        chunk = _text(j + 1, DOC_CHARS)[: DOC_CHARS // 2]
        rows.append(
            (10_000_000 + j, chunk + "Q" + _text(-j - 1, DOC_CHARS // 2))
        )
    for j in range(BATCH_DOCS // 2):
        rows.append((20_000_000 + j, _text(-1000 - j, DOC_CHARS)))
    return rows


def _recompute_spans(spark, standing, batch):
    """The oracle-gated query's algebra over in-memory frames: union
    df-cap, bipartite + batch-self legs, diagonal islands (mirrors
    queries/dedup.py incremental_substring_spans)."""
    grams = char_gram_df(standing.unionByName(batch), "doc_id", "text", K)
    capped = (
        grams.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= DF_CAP))
        .select("gram")
    )
    g = grams.join(capped, "gram", "left_semi")
    is_new = F.col("doc_id") >= 10_000_000
    b, s = g.filter(is_new), g.filter(~is_new)

    def _sides(df, side):
        return df.select(
            F.col("doc_id").alias(f"doc_{side}"),
            F.col("pos").alias(f"pos_{side}"),
            "gram",
        )

    bi = _sides(b, "a").join(_sides(s, "b"), "gram")
    m = (
        bi.filter(F.col("doc_a") < F.col("doc_b"))
        .unionByName(
            bi.filter(F.col("doc_a") > F.col("doc_b")).select(
                F.col("doc_b").alias("doc_a"),
                F.col("pos_b").alias("pos_a"),
                F.col("doc_a").alias("doc_b"),
                F.col("pos_a").alias("pos_b"),
                "gram",
            )
        )
        .unionByName(
            _sides(b, "a").join(_sides(b, "b"), "gram").filter(
                F.col("doc_a") < F.col("doc_b")
            )
        )
    )
    diag = (F.col("pos_a") - F.col("pos_b")).alias("diag")
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    isl = m.select("doc_a", "doc_b", "pos_a", "pos_b", diag).withColumn(
        "island", F.col("pos_a") - F.row_number().over(w)
    )
    return (
        isl.groupBy("doc_a", "doc_b", "diag", "island")
        .agg(
            F.min("pos_a").cast("long").alias("a_start"),
            F.min("pos_b").cast("long").alias("b_start"),
            (F.max("pos_a") - F.min("pos_a") + K).cast("long").alias(
                "match_len"
            ),
        )
        .filter(F.col("match_len") >= MIN_LEN)
        .select("doc_a", "doc_b", "a_start", "b_start", "match_len")
    )


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    mults = (
        [int(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [1, 4, 16]
    )
    spark = get_spark(app_name="substring-index-fold")
    batch = spark.createDataFrame(
        _batch_rows(), "doc_id long, text string"
    ).localCheckpoint()
    out = []
    for mult in mults:
        standing = spark.createDataFrame(
            _standing_rows(mult), "doc_id long, text string"
        ).localCheckpoint()
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "idx")
            t0 = time.perf_counter()
            build_substring_index(
                standing, path, k=K, df_cap=DF_CAP, min_len=MIN_LEN
            )
            build_s = time.perf_counter() - t0
            rec, idx = [], []
            for _ in range(runs):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                df1 = _recompute_spans(spark, standing, batch)
                df1.write.format("noop").mode("overwrite").save()
                rec.append(time.perf_counter() - t0)
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                df2 = substring_search_index(spark, path, batch)
                df2.write.format("noop").mode("overwrite").save()
                idx.append(time.perf_counter() - t0)
            got = sorted(tuple(r) for r in df2.collect())
            want = sorted(tuple(r) for r in df1.collect())
            assert got == want and len(got) >= BATCH_DOCS // 2, (
                len(got), len(want)
            )
        row = {
            "standing_docs": BASE_DOCS * mult,
            "build_once_s": round(build_s, 2),
            "recompute_median_s": round(statistics.median(rec), 2),
            "indexed_median_s": round(statistics.median(idx), 2),
            "n_spans": len(got),
        }
        out.append(row)
        print(
            f"| standing {row['standing_docs']} / batch {BATCH_DOCS} | "
            f"build {row['build_once_s']}s (once) | "
            f"recompute {row['recompute_median_s']}s | "
            f"indexed {row['indexed_median_s']}s | spans {row['n_spans']} |"
        )
    print(
        json.dumps(
            {
                "metric": "substring_index_fold",
                "batch_docs": BATCH_DOCS,
                "doc_chars": DOC_CHARS,
                "rows": out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
