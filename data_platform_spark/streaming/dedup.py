"""Streaming incremental near-dup: the daily-crawl loop as a sink.

The batch pieces exist separately — the persisted band index
(ops/neardup_index.py) and its search/append halves; this module wires
them into the shape a crawler actually runs: a document stream lands in
micro-batches, each batch is checked against the standing index
(O(batch) fresh signature work), the per-doc verdicts append to a
decisions table, and ONLY the surviving docs fold into the index for
the next batch to dedup against.

Exactly-once-effective: the index append uses the deterministic
``batch-<id>`` naming (a replayed foreachBatch re-moves only missing
files — no duplicate rows), and the decisions table upserts on doc_id,
so replays cannot double-report. Intra-batch duplicates are resolved
lowest-id-wins BEFORE the index append (a batch containing two copies
of a new page keeps one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_platform_spark.functions import dedup as D
from data_platform_spark.ops.neardup_index import (
    append_to_band_index,
    incremental_neardup_report,
)
from data_platform_spark.pipeline import Warehouse


def neardup_stream_sink(
    stream_docs: DataFrame,
    wh: Warehouse,
    index_path: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    schema: str = "dwh",
    decisions_table: str = "neardup_decisions",
    compact_every: int | None = None,
):
    """foreachBatch sink over a document stream (doc_id, text):
    dedup each micro-batch against the standing band index, record
    verdicts, append survivors. The decisions table accumulates one row
    per doc that reached the index check: (doc_id, n_matches,
    best_jaccard, best_match_doc, keep). Intra-batch duplicates are
    resolved lowest-id-wins BEFORE the check and do not get rows —
    only the winning copy is scored against the standing corpus.

    ``compact_every=N`` runs the band-index compaction leg after every
    Nth batch (the lexical sink's convention): every append adds one
    file per touched shingle/band bucket, so a long-running stream
    otherwise accumulates one file per batch per bucket. Compaction is
    bit-identity-preserving and replay-safe (the batch markers are
    untouched), so search results and effectively-once semantics are
    unchanged."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        from data_platform_spark.cache import release_caches

        spark = batch_df.sparkSession
        batch = batch_df.select("doc_id", "text")
        try:
            _apply_inner(spark, batch, batch_id)
        finally:
            # the index search scope-persists its candidate relation;
            # each batch drains its caches on the way out (the monitor
            # sinks' convention — cache.py)
            release_caches()

    def _apply_inner(spark, batch: DataFrame, batch_id: int) -> None:
        # intra-batch near-dups: lowest-id-wins among verified pairs
        # WITHIN the batch (the standing index can't see them yet)
        doc_sh = D.shingle_array_df(batch)
        sig = D.minhash_signatures(doc_sh)
        intra = (
            D.verified_jaccard(
                doc_sh, D.lsh_candidate_pairs(sig), threshold=threshold
            )
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
        )
        batch_dedup = batch.join(intra, "doc_id", "left_anti")

        report = incremental_neardup_report(
            spark, index_path, batch_dedup, threshold=threshold
        )
        from data_platform_spark.streaming.monitors import upsert_keyed_rows

        upsert_keyed_rows(wh, schema, decisions_table, report, ["doc_id"])

        survivors = batch_dedup.join(
            report.filter(F.col("keep")).select("doc_id"), "doc_id"
        )
        append_to_band_index(
            survivors, index_path, batch_id=f"stream-{batch_id}"
        )
        if compact_every and (batch_id + 1) % compact_every == 0:
            from data_platform_spark.ops.compaction import (
                compact_band_index,
            )

            compact_band_index(spark, index_path)

    return (
        stream_docs.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
