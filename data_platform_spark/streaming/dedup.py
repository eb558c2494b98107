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


def substring_stream_sink(
    stream_docs: DataFrame,
    wh: Warehouse,
    index_path: str,
    checkpoint_dir: str,
    strip_ratio: float = 0.5,
    schema: str = "dwh",
    decisions_table: str = "substring_decisions",
    compact_every: int | None = None,
):
    """foreachBatch sink over a document stream (doc_id, text): the
    EXACT-SUBSTRING twin of ``neardup_stream_sink`` (VERDICT r15 item 2
    completes the substring production triple) — each micro-batch is
    checked against the standing gram-posting index
    (ops/substring_index.py: O(batch) fresh gram work, bucket-pruned
    postings/df reads, the standing corpus never self-joined or
    re-grammed), per-doc keep/strip verdicts upsert into the decisions
    table (doc_id, dup_chars, dup_ratio, decision), and ONLY the kept
    docs fold into the index for the next batch to check against.

    Effectively-once: the index append uses the two-phase
    ``stream-<batch_id>`` markers (a replayed completed batch re-moves
    only missing files — no duplicate postings or df partials, so no
    double-counted document frequencies), and the decisions table
    upserts on doc_id, so replays cannot double-report. The report is
    computed BEFORE the append, so a batch never matches its own grams.

    Unlike the near-dup sink there is no lowest-id-wins pre-pass: the
    decision is COVERAGE-based (the substring_strip_decisions
    semantics), and the batch self-leg is part of the oracled search —
    so BOTH members of a fully-verbatim within-batch pair strip (each
    is wholly covered by the other). That is the modality's contract —
    strip docs that are mostly verbatim boilerplate — not keep-one
    dedup; run the exact/near-dup sinks first when keep-one semantics
    are wanted.

    ``compact_every=N`` runs compact_substring_index after every Nth
    batch (appends add one file per touched gram bucket per half
    otherwise); postings compaction is bit-identity-preserving and the
    df rollup sums partials — search-identical by construction — while
    replay markers are untouched (the family convention)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        from data_platform_spark.cache import release_caches

        spark = batch_df.sparkSession
        try:
            if batch_df.limit(1).count() == 0:
                return
            bid = f"stream-{batch_id}"
            from data_platform_spark.ops import _index_io as IO
            from data_platform_spark.ops.substring_index import (
                append_to_substring_index,
                incremental_substring_report,
            )

            # a COMPLETED batch's replay (fresh checkpoint) skips
            # entirely: its decisions were upserted before its append
            # promoted the marker, and re-deciding against an index
            # that now CONTAINS the batch would score every doc
            # against its own indexed grams
            if IO.batch_done(index_path, bid):
                return
            batch = batch_df.select("doc_id", "text").dropDuplicates(
                ["doc_id"]
            )
            report = incremental_substring_report(
                spark, index_path, batch, strip_ratio=strip_ratio
            )
            from data_platform_spark.streaming.monitors import (
                upsert_keyed_rows,
            )

            upsert_keyed_rows(wh, schema, decisions_table, report, ["doc_id"])
            survivors = batch.join(
                report.filter(F.col("decision") == "keep").select("doc_id"),
                "doc_id",
            )
            append_to_substring_index(survivors, index_path, batch_id=bid)
            if compact_every and (batch_id + 1) % compact_every == 0:
                from data_platform_spark.ops.compaction import (
                    compact_substring_index,
                )

                compact_substring_index(spark, index_path)
        finally:
            # the search scope-persists its gram relations; each batch
            # drains its caches on the way out (cache.py) — and MUST,
            # because the index state mutates between batches
            release_caches()

    return (
        stream_docs.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def semantic_dedup_stream_sink(
    stream_emb: DataFrame,
    wh: Warehouse,
    index_path: str,
    checkpoint_dir: str,
    schema: str = "dwh",
    decisions_table: str = "semantic_dedup_decisions",
    compact_every: int | None = None,
    drift_threshold: float | None = None,
    sample_mod: int | None = 16,
):
    """foreachBatch sink over an embedding stream (vec_id, embedding,
    plus whatever columns the index was BUILT with — appends pin to the
    index's own vector schema): the SEMANTIC twin of
    neardup_stream_sink (VERDICT r12 item 4) — each micro-batch is
    decided against the standing semantic-dedup index
    (ops/semantic_dedup.py: assignment against the STORED centroids,
    standing scan pruned to the batch's cells, keep/drop vs the
    standing survivor set with within-batch keep-first), verdicts
    upsert into the decisions table (one row per vector: cell,
    n_matches_standing, best_cosine, best_match_id, keep), and the
    KEPT vectors — plus every decision — fold into the index for the
    next batch to dedup against.

    Effectively-once: both index halves move under ONE two-phase
    ``stream-<batch_id>`` marker (append_semantic_batch) — a replayed
    completed batch is a no-op, and a crashed PARTIAL append retries
    safely because the decision report is deterministic EVEN when the
    crash landed both halves before the marker promoted: the standing
    side excludes the batch's own ids outright
    (incremental_semantic_dedup's anti-join), on top of the
    vectors-before-ledger move order that keeps half-landed vectors
    invisible to the survivor semi-join.
    The decisions table upserts on vec_id. Unlike the MinHash sink
    there is no separate intra-batch pre-pass — within-batch
    keep-first is part of the decision core's contract.

    ``compact_every=N`` runs compact_semantic_index after every Nth
    batch (appends add one file per touched cell plus one ledger file
    per batch otherwise); bit-identity-preserving and replay-safe, the
    family convention. ``drift_threshold`` (None = off) additionally
    runs the drift-rebuild leg after each fold —
    ops.semantic_dedup.rebuild_semantic_if_drifted: re-layout at the
    recomputed k = ceil(n_survivors/cell_pop) when sampled assignment
    distortion crosses the threshold, survivors ledger carried forward
    VERBATIM (decisions are history, never recomputed);
    ``sample_mod`` bounds that per-batch check, the ann_ingest_sink
    posture. Interrupted rebuild swaps heal once at construction."""
    from data_platform_spark.ops.semantic_dedup import (
        append_semantic_batch,
        incremental_semantic_dedup,
        rebuild_semantic_if_drifted,
        recover_semantic_index,
    )

    try:
        recover_semantic_index(index_path)
    except FileNotFoundError:
        pass  # nothing at the path yet — the first decide will say so loudly

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        from data_platform_spark.cache import release_caches

        spark = batch_df.sparkSession
        try:
            if batch_df.limit(1).count() == 0:
                return
            bid = f"stream-{batch_id}"
            from data_platform_spark.ops import _index_io as IO

            # a COMPLETED batch's replay (fresh checkpoint) skips
            # entirely: its decisions were upserted before its append
            # promoted the marker, and re-deciding against an index
            # that now CONTAINS the batch would re-score every vector
            # against its own indexed copy
            if IO.batch_done(index_path, bid):
                return
            report = incremental_semantic_dedup(
                spark, index_path, batch_df
            )
            from data_platform_spark.streaming.monitors import (
                upsert_keyed_rows,
            )

            upsert_keyed_rows(
                wh, schema, decisions_table, report, ["vec_id"]
            )
            append_semantic_batch(
                batch_df, index_path, report, batch_id=bid
            )
            if drift_threshold is not None:
                rebuild_semantic_if_drifted(
                    spark,
                    index_path,
                    threshold=drift_threshold,
                    sample_mod=sample_mod,
                    rebuild_marker=bid,
                )
            if compact_every and (batch_id + 1) % compact_every == 0:
                from data_platform_spark.ops import _index_io as _IO
                from data_platform_spark.ops.semantic_dedup import (
                    compact_semantic_index,
                )

                compact_semantic_index(spark, index_path)
                # rebuild markers otherwise accumulate forever (every
                # rebuild copies rebuilds/ forward) — the ann/ivfpq
                # sinks' cadence (ADVICE r11; review r13)
                _IO.prune_rebuild_markers(index_path, batch_id)
        finally:
            # the decision core scope-persists its pair relations; each
            # batch drains its caches on the way out (cache.py) — and
            # MUST, because the index state mutates between batches
            release_caches()

    return (
        stream_emb.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
