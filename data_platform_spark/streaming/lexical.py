"""Streaming lexical ingest: the fourth index family's foreachBatch
loop (VERDICT r8 item 6) — document micro-batches fold into the
persisted BM25 index (ops/lexical_index.py) exactly the way the band
index (streaming/dedup.py) and the IVF index (streaming/ann.py) ingest
theirs.

Each micro-batch is O(batch) work: only the batch tokenizes, its
postings land one file per touched term bucket under deterministic
``stream-<batch_id>`` names, and its document stats ride as one more
ledger row (summed at search — no read-modify-write of global state).
Effectively-once: the two-phase intent/done batch markers make a
replayed foreachBatch a no-op, including across maintenance passes that
rename files (rebuilds don't exist for postings — nothing is trained —
but COMPACTION does rename, and the markers survive it).

Unlike the ANN sink there is no drift leg (postings are exact; nothing
decays). The production maintenance concern is small files — every
batch adds one file per touched bucket — so the sink optionally runs
the compaction leg in-stream: ``compact_every=N`` compacts the index
after every Nth batch, bounding file counts without a separate
maintenance job. Search results are unaffected (compaction is
bit-identity-preserving; tests/test_ops.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame

from data_platform_spark.cache import release_caches
from data_platform_spark.ops.compaction import compact_lexical_index
from data_platform_spark.ops.lexical_index import append_to_lexical_index


def lexical_ingest_sink(
    stream_docs: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    compact_every: int | None = None,
):
    """foreachBatch sink over a document stream (id…, text): append
    each micro-batch to the persisted lexical index; optionally compact
    every ``compact_every`` batches. The index must exist (seed it with
    ``build_lexical_index`` — an EMPTY seed corpus is supported; the
    try_divide avgdl handles the zero-ledger bootstrap)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        try:
            if batch_df.limit(1).count() == 0:
                return
            append_to_lexical_index(
                batch_df,
                index_path,
                text_col=text_col,
                batch_id=f"stream-{batch_id}",
            )
            if compact_every and (batch_id + 1) % compact_every == 0:
                compact_lexical_index(batch_df.sparkSession, index_path)
        finally:
            release_caches()  # the cache.py per-batch drain convention

    return (
        stream_docs.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


__all__ = ["lexical_ingest_sink"]
