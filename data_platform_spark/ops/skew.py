"""Skew mitigation: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew; these operators are the explicit tools for the cases AQE can't fix:
a groupBy where one key holds half the data (straggler reducer), and a
join whose hot key exceeds a single task even after AQE splitting.

Salts are DETERMINISTIC (hash-derived, never rand()) so reruns and
oracle comparisons reproduce exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(cols: list[str], n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts): hash of the row's non-key
    columns — spreads a hot key's rows evenly without RNG state."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple],
    salt_cols: list[str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    aggs: out_name -> (in_col, kind) with kind in {'count','sum','min','max'}
    — the algebraic aggregates that re-combine losslessly. Phase 1 groups
    by (key, salt) so a hot key's rows split across n_salts reducers;
    phase 2 merges the partials per key. Exact for these aggregates
    regardless of salt layout.
    """
    phase1_aggs = []
    for out, (col, kind) in aggs.items():
        if kind == "count":
            phase1_aggs.append(F.count(F.lit(1)).alias(f"_p_{out}"))
        elif kind == "sum":
            phase1_aggs.append(F.sum(col).alias(f"_p_{out}"))
        elif kind == "min":
            phase1_aggs.append(F.min(col).alias(f"_p_{out}"))
        elif kind == "max":
            phase1_aggs.append(F.max(col).alias(f"_p_{out}"))
        else:
            raise ValueError(f"non-algebraic aggregate {kind!r}")

    partial = (
        df.withColumn("_salt", _salt(salt_cols, n_salts))
        .groupBy(*group_cols, "_salt")
        .agg(*phase1_aggs)
    )

    merge = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
    phase2_aggs = [
        merge[kind](f"_p_{out}").alias(out)
        for out, (col, kind) in aggs.items()
    ]
    return partial.groupBy(*group_cols).agg(*phase2_aggs)


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    salt_cols: list[str],
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: salt the skewed side
    deterministically, replicate the small side n_salts times, join on
    (key, salt). Each hot key now spreads over n_salts tasks; the small
    side grows by n_salts (it must be broadcast-sized × n_salts).
    """
    left = skewed.withColumn("_salt", _salt(salt_cols, n_salts))
    right = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    out = left.join(right, [key, "_salt"])
    return out.drop("_salt")
