"""Incremental materialized-rollup maintenance (algebraic + sketch aggs).

At 100 TB you never recompute a rollup over the full fact table per batch;
you MAINTAIN it: aggregate the batch (a partial aggregate — map-side
combinable, one shuffle over batch keys only), then fold the per-key
deltas into the stored rollup. Refresh cost is O(batch + touched keys),
independent of table size — the aggregate counterpart of the reference's
insert-if-absent incremental fact loads
(/root/reference/dags/dwh_fact_charer_location.py:55-117), expressed
Spark-first.

Supported measure kinds (``measures`` maps input column -> kind):

- ``sum`` / ``count`` / ``min`` / ``max`` — algebraic: the combine step is
  the measure itself (add / add / least / greatest). Averages are derived
  at read time as sum/count; never store an avg, it doesn't combine.
- ``hll`` — mergeable HyperLogLog sketch for distinct counts
  (``hll_sketch_agg`` per batch, ``hll_union`` to combine,
  ``hll_sketch_estimate`` to read). Exact distinct does NOT combine
  across batches without reshuffling raw rows; the sketch does, with
  bounded relative error — the standard trade at scale.

Replay semantics: folding a batch twice double-counts (rollup combine is
inherently non-idempotent). ``incremental_rollup`` therefore takes an
optional ``batch_id``; applied ids are recorded as marker files in a
sibling ``<table>._batches/`` dir and replayed ids are skipped — with
foreachBatch's deterministic batch ids this gives effectively-once. The
marker is written AFTER the merge commits, so a crash between the two
replays one batch (documented at-least-once window, same as any
non-transactional two-phase sink); the journaled merge itself can never
tear.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

MEASURE_KINDS = ("sum", "count", "min", "max", "hll")


def out_col(col: str, kind: str) -> str:
    """Stable output column name for a measure (``sum_value`` etc.)."""
    return f"{kind}_{col}"


def _check(measures: dict[str, str]) -> None:
    bad = {c: k for c, k in measures.items() if k not in MEASURE_KINDS}
    if bad:
        raise ValueError(f"unknown measure kinds: {bad}; pick from {MEASURE_KINDS}")


def rollup_delta(batch: DataFrame, keys: list[str], measures: dict[str, str]) -> DataFrame:
    """Partial aggregate of one batch: one row per key, one column per
    measure. Plain groupBy → Catalyst plans map-side partial aggregation;
    the shuffle carries only (key, partial-state) rows."""
    _check(measures)
    aggs = []
    for col, kind in measures.items():
        name = out_col(col, kind)
        if kind == "sum":
            aggs.append(F.sum(col).alias(name))
        elif kind == "count":
            aggs.append(F.count(col).alias(name))
        elif kind == "min":
            aggs.append(F.min(col).alias(name))
        elif kind == "max":
            aggs.append(F.max(col).alias(name))
        elif kind == "hll":
            aggs.append(F.hll_sketch_agg(col).alias(name))
    return batch.groupBy(*keys).agg(*aggs)


def _combine_expr(kind: str, a: Column, b: Column) -> Column:
    if kind in ("sum", "count"):
        add = a + b
    elif kind == "min":
        add = F.least(a, b)  # least/greatest skip nulls in Spark
    elif kind == "max":
        add = F.greatest(a, b)
    elif kind == "hll":
        add = F.hll_union(a, b)
    # a key present on only one side contributes that side's state as-is
    return F.when(a.isNull(), b).when(b.isNull(), a).otherwise(add)


def combine_rollups(
    a: DataFrame, b: DataFrame, keys: list[str], measures: dict[str, str]
) -> DataFrame:
    """Fold two rollup states into one (full-outer on keys, per-kind
    combine). Associative and commutative for every supported kind, so
    any fold order — per-batch incremental, tree reduction, partition
    merge — yields the same state."""
    _check(measures)
    names = [out_col(c, k) for c, k in measures.items()]
    right = b.select(
        *keys, *[F.col(n).alias(f"_r_{n}") for n in names]
    )
    joined = a.join(right, keys, "full_outer")
    combined = [
        _combine_expr(k, F.col(out_col(c, k)), F.col(f"_r_{out_col(c, k)}")).alias(
            out_col(c, k)
        )
        for c, k in measures.items()
    ]
    return joined.select(*keys, *combined)


def hll_estimate(col: str) -> Column:
    """Read-side distinct estimate for a stored ``hll`` measure column."""
    return F.hll_sketch_estimate(col)


def _marker_dir(wh, schema: str, table: str) -> str:
    return wh.path(schema, table) + "._batches"


def applied_batches(wh, schema: str, table: str) -> set[str]:
    d = _marker_dir(wh, schema, table)
    return set(os.listdir(d)) if os.path.isdir(d) else set()


def incremental_rollup(
    spark: SparkSession,
    wh,
    schema: str,
    table: str,
    batch: DataFrame,
    keys: list[str],
    measures: dict[str, str],
    partition_col: str,
    batch_id: str | None = None,
) -> list[str]:
    """Fold one batch into the stored rollup at ``schema.table``.

    ``partition_col`` must be one of ``keys`` (the hive partition column
    of the stored rollup — a rollup key never moves partitions, matching
    ``Warehouse.merge``'s pruning contract). Only partitions present in
    the batch are read or rewritten.

    Returns the rewritten partition list (``[]`` for a skipped replay).
    """
    if partition_col not in keys:
        raise ValueError(f"partition_col {partition_col!r} must be in keys {keys}")
    if batch_id is not None and batch_id in applied_batches(wh, schema, table):
        return []
    delta = rollup_delta(batch, keys, measures)
    if not wh.exists(schema, table):
        wh.write(delta, schema, table, partition_by=[partition_col])
        written = [f"first-load {schema}/{table}"]
    else:
        final = wh.path(schema, table)
        part_vals = [r[0] for r in delta.select(partition_col).distinct().collect()]
        touched = (
            spark.read.parquet(final)
            .filter(F.col(partition_col).isin(part_vals))
            .join(delta.select(*keys).distinct(), keys, "left_semi")
        )
        combined = combine_rollups(touched, delta, keys, measures)
        written = wh.merge(
            spark, schema, table, combined, keys, partition_col=partition_col
        )
    if batch_id is not None:
        d = _marker_dir(wh, schema, table)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, batch_id), "w", encoding="utf-8"):
            pass
    return written


def stream_rollup_sink(
    stream_df: DataFrame,
    wh,
    schema: str,
    table: str,
    keys: list[str],
    measures: dict[str, str],
    partition_col: str,
    checkpoint_dir: str,
):
    """Structured-Streaming writer maintaining a rollup table: each
    micro-batch folds via ``incremental_rollup`` keyed by the
    deterministic foreachBatch batch id (replays skip — effectively-once
    on top of the at-least-once delivery)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        incremental_rollup(
            batch_df.sparkSession,
            wh,
            schema,
            table,
            batch_df,
            keys,
            measures,
            partition_col,
            batch_id=f"b{batch_id}",
        )

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
