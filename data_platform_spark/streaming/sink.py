"""Streaming → warehouse integration: foreachBatch ELT sinks.

Connects the streaming surface to the batch warehouse: each micro-batch
runs the same idempotent upsert primitives the batch pipeline uses
(layers/raw last-writer-wins), so replayed batches (streaming's
at-least-once delivery into foreachBatch) cannot duplicate rows — the
dedup key makes the sink effectively exactly-once.

At 100 TB the parquet rewrite inside upsert becomes a partition-scoped
MERGE (ingest-date partitioning / a table format); the foreachBatch
contract is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from data_platform_spark.pipeline import Warehouse


def stream_upsert_sink(
    stream_df: DataFrame,
    wh: Warehouse,
    schema: str,
    table: str,
    key_cols: list[str],
    order_col: str,
    checkpoint_dir: str,
):
    """writeStream.foreachBatch sink: last-writer-wins upsert per batch.

    key_cols/order_col define the upsert identity (newest order_col value
    per key survives) — the streaming continuation of the bronze layer's
    S4 semantics.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        existing = wh.read(spark, schema, table)
        merged = (
            batch_df
            if existing is None
            else existing.unionByName(batch_df)
        )
        # Deterministic total order: order_col first, then every remaining
        # column as tie-break (mirrors upsert_bronze's payload tie-break) —
        # a replayed foreachBatch (at-least-once) must not flip the
        # surviving row among equal order_col values.
        tie_break = [
            F.desc(c)
            for c in sorted(merged.columns)
            if c != order_col and c not in key_cols
        ]
        w = Window.partitionBy(*key_cols).orderBy(F.desc(order_col), *tie_break)
        deduped = (
            merged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        wh.write(deduped, schema, table)

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_merge_sink(
    stream_df: DataFrame,
    wh: Warehouse,
    schema: str,
    table: str,
    key_cols: list[str],
    order_col: str,
    partition_col: str,
    checkpoint_dir: str,
):
    """foreachBatch sink backed by the partition-pruned MERGE.

    Same exactly-once-effective contract as stream_upsert_sink (newest
    order_col per key survives, deterministic tie-break), but per-batch
    cost is ∝ the hive partitions the batch touches instead of the whole
    table — the sink that stays O(batch) as the table grows to 100 TB.
    The journaled swap in ``Warehouse.merge`` keeps a crashed batch
    atomic-or-nothing, so foreachBatch's at-least-once replay always
    re-merges from a consistent state.
    """

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        wh.merge(
            batch_df.sparkSession,
            schema,
            table,
            batch_df,
            keys=key_cols,
            partition_col=partition_col,
            order_col=order_col,
        )

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def join_view_stream_sink(
    stream_fact: DataFrame,
    wh: Warehouse,
    schema: str,
    table: str,
    dim: DataFrame,
    *,
    fact_on: str,
    dim_on: str,
    fact_key: str,
    dim_payload: list[str],
    partition_col: str,
    checkpoint_dir: str,
):
    """foreachBatch sink maintaining a denormalized join view: each fact
    micro-batch folds through ops/join_view.incremental_join_view
    (matched rows upsert the view, unmatched rows park in the orphan
    ledger) keyed by the deterministic foreachBatch batch id — replays
    skip on the marker, effectively-once on top of at-least-once
    delivery. ``dim`` is the static current dimension image; dimension
    upserts run OUT-OF-BAND between triggers via
    ops/join_view.join_view_dim_upsert_persisted (they carry their own
    namespaced batch ids), promoting any orphans the stream parked."""
    from data_platform_spark.ops.join_view import incremental_join_view

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        incremental_join_view(
            batch_df.sparkSession,
            wh,
            schema,
            table,
            batch_df,
            dim,
            fact_on=fact_on,
            dim_on=dim_on,
            fact_key=fact_key,
            dim_payload=dim_payload,
            partition_col=partition_col,
            batch_id=f"b{batch_id}",
        )

    return (
        stream_fact.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def manifest_join_view_stream_sink(
    stream_fact: DataFrame,
    cat,
    schema: str,
    table: str,
    dim: DataFrame,
    *,
    fact_on: str,
    dim_on: str,
    fact_key: str,
    dim_payload: list[str],
    partition_col: str,
    checkpoint_dir: str,
):
    """foreachBatch sink maintaining a denormalized join view through
    the MANIFEST CATALOG (VERDICT r15 item 3): each fact micro-batch
    folds through ops/join_view.manifest_join_view_epoch — the view and
    the orphan ledger stage as immutable versions and ONE manifest
    rename commits them together, so a crash mid-epoch can never tear
    view/orphan consistency for a manifest-pinned reader (the per-table
    sink's transient both-ledgers window disappears; readers pin
    ``cat.load()`` once and see a consistent pair at every snapshot).
    Replays skip on the transaction mark committed atomically with the
    data — effectively-once with NO marker-after-commit window. ``cat``
    is a ManifestCatalog; ``dim`` is the static current dimension
    image (dim upserts run out-of-band between triggers, staged
    through their own transactions)."""
    from data_platform_spark.ops.join_view import manifest_join_view_epoch

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        manifest_join_view_epoch(
            batch_df.sparkSession,
            cat,
            schema,
            table,
            batch_df,
            dim,
            fact_on=fact_on,
            dim_on=dim_on,
            fact_key=fact_key,
            dim_payload=dim_payload,
            partition_col=partition_col,
            epoch_id=batch_id,
        )

    return (
        stream_fact.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def scd2_join_view_stream_sink(
    stream_fact: DataFrame,
    wh: Warehouse,
    schema: str,
    table: str,
    dim_versions: DataFrame,
    *,
    fact_on: str,
    dim_on: str,
    fact_key: str,
    event_col: str,
    dim_payload: list[str],
    partition_col: str,
    checkpoint_dir: str,
):
    """foreachBatch sink maintaining an SCD2-versioned join view: each
    fact micro-batch folds through
    ops/scd2_join_view.incremental_scd2_join_view — every row resolves
    against the dimension VERSION valid at its own event date (late
    facts land on closed versions; rows with no valid version park in
    the orphan ledger) — keyed by the deterministic foreachBatch batch
    id, so replays skip on the namespaced ``fact--b<n>`` marker.
    ``dim_versions`` is the static current version table; SCD2 dim
    batches run OUT-OF-BAND between triggers via
    ops/scd2_join_view.scd2_join_view_dim_persisted (their own
    ``dim--<id>`` markers), re-resolving only future-dated rows of the
    touched keys."""
    from data_platform_spark.ops.scd2_join_view import (
        incremental_scd2_join_view,
    )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        incremental_scd2_join_view(
            batch_df.sparkSession,
            wh,
            schema,
            table,
            batch_df,
            dim_versions,
            fact_on=fact_on,
            dim_on=dim_on,
            fact_key=fact_key,
            event_col=event_col,
            dim_payload=dim_payload,
            partition_col=partition_col,
            batch_id=f"b{batch_id}",
        )

    return (
        stream_fact.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
