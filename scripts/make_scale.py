#!/usr/bin/env python
"""Derive a larger scale factor from /root/testdata/sf0.1 by deterministic
replication (x N with key remapping), for scaling experiments beyond the
driver-provided SFs. Output is gitignored (.scale/).

Key remapping keeps referential integrity: every key k in replica i
becomes k*N+i, applied consistently on both sides of each FK. Text gets a
replica token appended so the corpus does not degenerate into pure
exact-duplicate groups; embeddings perturb one coordinate per replica.

Usage: python scripts/make_scale.py [N] (default 10 -> ~sf1)

``scale_tables`` is importable — bench.py uses it to materialize the
upward-scaling corpus for the per-SF ratio section of the bench artifact
(VERDICT r7 item 8).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from data_platform_spark.sources.tables import load_table

SRC = "/root/testdata/sf0.1"
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def out_dir(name: str) -> str:
    return os.path.join(_REPO, ".scale", name)

# key columns remapped per table (k -> k*N + i); non-key attrs copied
KEYMAP = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SMALL = ["region", "nation"]  # bounded dims: copied once, not replicated


def scale_tables(
    spark: SparkSession, src: str, out: str, n: int, quiet: bool = False
) -> None:
    """Replicate every table of ``src`` xN into ``out`` with
    integrity-preserving key remapping (see module docstring)."""
    os.makedirs(out, exist_ok=True)
    for t in SMALL:
        load_table(spark, src, t).write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )
    replicas = spark.range(n).select(F.col("id").cast("int").alias("_rep"))
    for t, keys in KEYMAP.items():
        df = load_table(spark, src, t).crossJoin(F.broadcast(replicas))
        for k in keys:
            ktype = dict(df.dtypes)[k]
            df = df.withColumn(k, (F.col(k) * n + F.col("_rep")).cast(ktype))
        if t == "documents":
            df = df.withColumn(
                "text", F.concat(F.col("text"), F.lit(" rep"), F.col("_rep"))
            )
        if t == "embeddings":
            # nudge the first coordinate per replica so vectors stay distinct
            df = df.withColumn(
                "embedding",
                F.concat(
                    F.array(
                        (F.element_at("embedding", 1) + F.col("_rep") * 0.001).cast(
                            "float"
                        )
                    ),
                    F.slice("embedding", 2, 63),
                ),
            )
        df.drop("_rep").write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )
        if not quiet:
            print(f"wrote {t} x{n}")


def main() -> None:
    from data_platform_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    OUT = out_dir(sys.argv[2] if len(sys.argv) > 2 else f"sf{n // 10}")
    spark = get_spark(app_name="make-scale")
    scale_tables(spark, SRC, OUT, n)
    spark.stop()
    print(f"done -> {OUT}")


if __name__ == "__main__":
    main()
