"""Data-layout clustering: range-cluster / Z-order writes for scan pruning.

Parquet scans prune at two levels below hive partitions: file-level and
row-group-level min/max statistics. Both only help if the WRITER placed
similar values together — a randomly-laid-out table has every file's
min/max spanning the whole domain, so every predicate reads every file.
These writers fix the layout:

- ``cluster_write``: one-dimensional clustering —
  ``repartitionByRange(cols)`` (one range shuffle, sampled bounds) +
  ``sortWithinPartitions(cols)`` → each output file covers a narrow,
  near-disjoint range of the cluster key; a range predicate touches
  ~predicate_span/global_span of the files. The Spark-native analog of
  Iceberg's ``sort_order`` / Delta ``OPTIMIZE`` with a single key.
- ``zorder_write``: multi-dimensional clustering — each column is mapped
  to a RANK bucket (approxQuantile boundaries, so skewed distributions
  still spread evenly — the same choice Delta's ZCube makes by using
  range-partition ids), buckets are bit-interleaved into a Z-value
  (Morton code; pure JVM shift/or expressions), and the table is
  range-clustered on that value. Locality in Z-space implies locality in
  EVERY input dimension, so predicates on ANY of the Z columns prune
  files — the standard layout for 100 TB tables with two or three
  independent filter columns, where hive partitioning can serve only one.

Neither changes query code: pruning happens in the parquet reader from
footer stats (visible as fewer files/row-groups read in the scan node).
Requires statistics-bearing physical types — which is why the session
factory forces INT64-micros timestamps (INT96, Spark's legacy default,
carries no parquet statistics at all).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_COL = "_zvalue"


def cluster_write(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int | None = None,
) -> None:
    """Write ``df`` as parquet range-clustered on ``cluster_cols``."""
    parts = [F.col(c) for c in cluster_cols]
    out = (
        df.repartitionByRange(n_files, *parts)
        if n_files
        else df.repartitionByRange(*parts)
    )
    out.sortWithinPartitions(*parts).write.mode("overwrite").parquet(path)


def rank_bucket(col: Column, boundaries: list[float]) -> Column:
    """Bucket index of ``col`` against sorted quantile ``boundaries`` —
    ``size(filter(bounds, b -> b <= col))``, a codegen'd O(len) row
    expression (no join, no shuffle). len(boundaries)+1 buckets."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    return F.size(F.filter(arr, lambda b: b <= col.cast("double")))


def zorder_value(bucket_cols: list[Column], bits: int = 8) -> Column:
    """Z-value (Morton code): interleave the low ``bits`` bits of k
    bucket columns, most-significant first. Pure JVM expressions."""
    k = len(bucket_cols)
    pieces = []
    for i, b in enumerate(bucket_cols):
        clamped = F.least(
            F.greatest(b.cast("long"), F.lit(0)), F.lit((1 << bits) - 1)
        )
        for bit in range(bits):
            # source bit `bit` of column i lands at position bit*k + (k-1-i)
            pieces.append(
                F.shiftleft(
                    F.shiftright(clamped, bit).bitwiseAND(F.lit(1)),
                    bit * k + (k - 1 - i),
                )
            )
    return reduce(lambda a, c: a.bitwiseOR(c), pieces)


def zorder_write(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    bits: int = 6,
    n_files: int | None = None,
) -> None:
    """Write ``df`` as parquet Z-ordered on ``zorder_cols``.

    Bucket boundaries come from ONE multi-column ``approxQuantile`` pass
    (a mergeable sketch aggregate — scales; the collected boundary list is
    k * 2^bits scalars, never rows). The Z column is dropped before
    writing — layout is a storage property, not schema.
    """
    n_bounds = (1 << bits) - 1
    probs = [(i + 1) / (1 << bits) for i in range(n_bounds)]
    doubled = df.select(
        *[F.col(c).cast("double").alias(c) for c in zorder_cols]
    )
    bounds = doubled.approxQuantile(zorder_cols, probs, 0.001)
    buckets = []
    for i, c in enumerate(zorder_cols):
        bs = sorted(set(bounds[i]))
        if not bs:  # constant column contributes nothing to the ordering
            buckets.append(F.lit(0))
            continue
        # low-cardinality columns dedupe to < 2^bits boundaries; stretch
        # the bucket index over the full bit range so the column still
        # occupies its share of the HIGH interleaved bits
        buckets.append(
            F.floor(rank_bucket(F.col(c), bs) * ((1 << bits) - 1) / len(bs))
        )
    z = df.withColumn(Z_COL, zorder_value(buckets, bits=bits))
    out = (
        z.repartitionByRange(n_files, Z_COL) if n_files else z.repartitionByRange(Z_COL)
    )
    (
        out.sortWithinPartitions(Z_COL)
        .drop(Z_COL)
        .write.mode("overwrite")
        .parquet(path)
    )
