"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks.

``asof_join(left, right, ...)``: for each left row, the most recent right
row with ``right_ts <= left_ts`` within the same key group.

Implementation is the union-merge pattern, NOT a join+filter+rank:
tag both inputs, union, single window per key ordered by (ts, side) with
``last(value, ignorenulls=True)`` carrying the latest right value forward,
then keep left rows. Cost: ONE shuffle of |L|+|R| rows keyed by the join
key — no |L|×|R| intermediate blowup, no range-condition nested loop.
This is the standard scalable as-of strategy (same shape Flink/kdb use);
at 100 TB both sides would additionally be pre-bucketed by key.

Tie semantics: a right row at exactly left_ts IS matched (<=) — right
rows sort before left rows at equal timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join. Output = all left columns + ``<value_col><suffix>``
    columns holding the latest right values (NULL when no prior right row).

    ``right`` should be deduplicated to one row per (on, right_ts) by the
    caller if multiple right rows can share a timestamp — otherwise which
    of the tied rows wins is unspecified (same as any as-of engine).
    """
    lcols = left.columns
    l_tagged = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    u = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return filled.filter(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[F.col(f"{c}{suffix}") for c in value_cols],
    )