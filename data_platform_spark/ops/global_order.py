"""Two-phase global-order windows — running sums and ranks over a total
order WITHOUT a single-partition window.

``Window.orderBy(...)`` with no partitionBy funnels the whole relation
through one task: correct at test SF, dead at 100 TB. The classic
distributed layout (documented in PLANS.md since round 2) splits the
computation:

1. **Range phase** — ``repartitionByRange`` on the order keys puts each
   partition in a disjoint, globally-ordered key range; a window
   partitioned by ``spark_partition_id()`` then computes the running
   aggregate *within* each partition fully in parallel.
2. **Offset phase** — per-partition subtotals (one row per partition,
   bounded by cluster parallelism, never by data) collapse into a single
   array row that is broadcast back; every row adds the subtotals of all
   strictly-earlier partitions via ``F.aggregate`` over the filtered
   array — a projection, not a join or a window.

Cost: two narrow shuffles of the key/value projection (range + pid hash)
and a 1-row broadcast. No stage sees more than one partition's rows.

Semantics match the single-partition form exactly whenever the order is
total (callers pass a unique tie-break column, as every registered query
here does).

Cache lifecycle: in the default lazy mode the ranged relation stays
persisted after the call (both branches of the diamond consume it
lazily, so eager unpersist is impossible); short-lived query sessions
rely on LRU eviction. Long-lived drivers composing many global orders
pass ``eager=True``: the result is pinned with
``localCheckpoint(eager=True)`` and the ranged relation is unpersisted
before returning, so each composition releases its intermediate cache
deterministically — the only blocks that remain alive are the
checkpointed result itself, which the context cleaner releases when the
caller drops the DataFrame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PID = "__go_pid"
_VAL = "__go_val"
_LOCAL = "__go_local"
_OFFSETS = "__go_offsets"


def global_running_sum(
    df: DataFrame,
    order_cols: list[Column],
    value: Column,
    out_col: str,
    zero: Column | None = None,
    num_partitions: int | None = None,
    eager: bool = False,
) -> DataFrame:
    """Inclusive running sum of ``value`` over the total order given by
    ``order_cols`` (pass ``F.desc(...)``/``F.asc(...)`` expressions).

    ``zero`` must be a typed zero literal matching ``value``'s type
    (default ``lit(0).cast("long")``; pass ``lit(0.0)`` for doubles).

    ``eager=True`` materializes the result now (``localCheckpoint``) and
    releases the intermediate cache before returning — see the module
    docstring's cache-lifecycle note.
    """
    if zero is None:
        zero = F.lit(0).cast("long")
    spark = df.sparkSession
    num = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    ranged = df.repartitionByRange(num, *order_cols)
    with_pid = ranged.withColumn(_VAL, value).withColumn(
        _PID, F.spark_partition_id()
    )
    w = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Persist the ranged+numbered relation: the offsets branch re-reads it,
    # and (a) without this the whole upstream pipeline executes twice (no
    # exchange reuse across the diamond), (b) spark_partition_id() is
    # nondeterministic, so a recompute could in principle assign different
    # pids to the two branches. Same pattern as the LSH signature diamond.
    local = with_pid.withColumn(_LOCAL, F.sum(_VAL).over(w)).persist()
    offsets = (
        local.groupBy(_PID)
        .agg(F.sum(_VAL).alias("t"))
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(_PID).alias("p"), F.col("t")))
            ).alias(_OFFSETS)
        )
    )
    joined = local.crossJoin(F.broadcast(offsets))
    offset = F.aggregate(
        F.filter(F.col(_OFFSETS), lambda s: s["p"] < F.col(_PID)),
        zero,
        lambda acc, s: acc + s["t"],
    )
    result = joined.withColumn(out_col, F.col(_LOCAL) + offset).drop(
        _PID, _VAL, _LOCAL, _OFFSETS
    )
    if eager:
        result = result.localCheckpoint(eager=True)
        local.unpersist()
    return result


def grouped_running_sum(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    value: Column,
    out_col: str,
    zero: Column | None = None,
    num_partitions: int | None = None,
    broadcast_offsets: bool = True,
    pid_out: str | None = None,
    eager: bool = False,
) -> DataFrame:
    """Per-group inclusive running sum of ``value`` over the total order
    given by ``order_cols`` — the skew-safe form of
    ``Window.partitionBy(*group_cols).orderBy(*order_cols)``.

    The native grouped window funnels each group through ONE task; with a
    realistic corpus shape (one source holding ~90% of the data) that is a
    straggler at 100 TB. Here the range partitioner keys on
    ``(group_cols, order_cols)``, so a dominant group's ordered rows span
    MANY consecutive partitions; the within-partition window (partitioned
    by ``group_cols + [pid]``) runs fully parallel, and per-``(group,
    pid)`` subtotals — at most ``#groups + #partitions`` rows, metadata
    scale — yield each cell's prefix offset via a tiny window ordered by
    pid. The offsets join back on ``(group_cols, pid)``; pass
    ``broadcast_offsets=False`` for very-high-cardinality group columns
    where the subtotal relation outgrows the broadcast threshold (it then
    runs as a plain shuffle join on the same keys the data is already
    ranged by).

    ``pid_out`` keeps the phase-1 partition id in the output under that
    name (diagnostics: tests assert a dominant group spans >1 partition).

    Semantics match the native grouped window whenever the order is total
    within each group (callers pass a unique tie-break column).
    """
    if zero is None:
        zero = F.lit(0).cast("long")
    spark = df.sparkSession
    num = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    range_keys = [F.asc(c) for c in group_cols] + list(order_cols)
    ranged = df.repartitionByRange(num, *range_keys)
    with_pid = ranged.withColumn(_VAL, value).withColumn(
        _PID, F.spark_partition_id()
    )
    w = (
        Window.partitionBy(*group_cols, _PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Persist for the same reason as global_running_sum: the offsets
    # branch re-reads the relation and spark_partition_id() is
    # nondeterministic across recomputes.
    local = with_pid.withColumn(_LOCAL, F.sum(_VAL).over(w)).persist()
    wo = (
        Window.partitionBy(*group_cols)
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        local.groupBy(*group_cols, _PID)
        .agg(F.sum(_VAL).alias("__go_t"))
        .withColumn(_OFFSETS, F.coalesce(F.sum("__go_t").over(wo), zero))
        .drop("__go_t")
    )
    if broadcast_offsets:
        offsets = F.broadcast(offsets)
    joined = local.join(offsets, on=[*group_cols, _PID], how="inner")
    out = joined.withColumn(out_col, F.col(_LOCAL) + F.col(_OFFSETS))
    if pid_out is not None:
        out = out.withColumn(pid_out, F.col(_PID))
    result = out.drop(_PID, _VAL, _LOCAL, _OFFSETS)
    if eager:
        result = result.localCheckpoint(eager=True)
        local.unpersist()
    return result


def global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    out_col: str,
    num_partitions: int | None = None,
    eager: bool = False,
) -> DataFrame:
    """1-based row number over a total order — a running count of 1s
    through the same two-phase layout."""
    return global_running_sum(
        df,
        order_cols,
        F.lit(1).cast("long"),
        out_col,
        num_partitions=num_partitions,
        eager=eager,
    )


def ntile_from_row_number(rn: Column, n_rows: Column, n: int) -> Column:
    """SQL-standard ``ntile(n)`` derived arithmetically from a global row
    number and the total row count: the first ``n_rows % n`` buckets get
    ``n_rows // n + 1`` rows, the rest ``n_rows // n``. Equals the window
    function whenever the order is total (unique tie-break), which is
    when a global row number is well-defined anyway."""
    small = F.floor(n_rows / n)  # floor bucket size
    big_buckets = n_rows % n
    big_span = big_buckets * (small + 1)  # rows covered by the big buckets
    # The otherwise-branch is never taken when small == 0 (big_span covers
    # every row then), but don't rely on CaseWhen's lazy evaluation to
    # avoid the 0-divisor: clamp it. greatest(small, 1) == small whenever
    # the branch is actually evaluated, so results are identical.
    bucket0 = F.when(rn <= big_span, F.floor((rn - 1) / (small + 1))).otherwise(
        big_buckets + F.floor((rn - big_span - 1) / F.greatest(small, F.lit(1)))
    )
    return (bucket0 + 1).cast("int")


def percent_rank_from_row_number(rn: Column, n_rows: Column) -> Column:
    """``percent_rank()`` = (rank - 1) / (N - 1); under a total order
    rank == row_number. Returns 0.0 for a single-row relation, matching
    the window function."""
    return F.when(n_rows > 1, (rn - 1) / (n_rows - 1)).otherwise(F.lit(0.0))
