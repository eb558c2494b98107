"""Declared analytic query inventory — the oracle-checked surface.

Each submodule exports:
- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
- ``ORACLE:  dict[str, str]`` — ANSI SQL equivalents runnable by DuckDB on
  the same parquet tables (keys without an oracle get a rows-only check).

``all_queries()`` / ``all_oracles()`` merge every submodule; this is what
``__spark_entry__.py`` hands to the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    from data_platform_spark.queries import (
        dedup,
        events,
        graph,
        multimodal,
        relational,
        rm_pipeline,
        similarity,
        text,
    )

    return (
        relational,
        events,
        text,
        dedup,
        similarity,
        multimodal,
        rm_pipeline,
        graph,
    )


# The driver's correctness gate checks the FIRST ~50 registered queries, in
# dict order. Cumulative accounting entering round 7: 171 registered (168
# oracled); after r6 every query registered through r6 carries a
# driver-green row (r6 closed the books: 49 hash + 1 rows-only in the r6
# window, older rounds cover the rest). The round-7 window packs, in order:
# (1) the 10 queries with NO green row ever (new this round: chunk-level
#     hybrid RRF, quality-rule funnel, vocabulary drift, MinHash
#     calibration, dedup decision ledger, curation pipeline summary,
#     term-PMI collocations, embedding centroid drift, event transition
#     matrix, MoM revenue growth);
# (2) re-proof of every implementation changed this round: the
#     window-rewritten attribution family, the monitor-core refactor
#     (daily quality, z-score anomaly), the shard-index clamp, the
#     chunk-BM25 scoring factor-out + hybrid, the PQ/k-means
#     training-knob threading (5 queries), and the whole
#     verified-jaccard family after the bipartite refactor;
# (3) canaries (loader / flagship); then
# (4) the stalest green rows (r3/r4 evidence that yielded slots in r6),
#     rotated in to refresh them.
# --- round-6 window rationale (kept for history) ---
# (1) the 24 queries with NO green row ever (new in r6: BM25
#     retrieval, unigram-LM scoring, BPE pair induction, incremental
#     dedup, the three product-quantization queries, term PageRank,
#     hybrid RRF fusion, n-gram containment, rolling z-score anomaly,
#     incremental near-dup, erasure cascade, temperature mixing,
#     chunk-granularity BM25, image augmentation, attribution,
#     lang-ID scorecard, cross-modal consistency, daily quality monitor,
#     token-balanced sharding, ES weighted sampling, behavioral
#     entropy, per-source rank normalization);
# (2) re-proof of every implementation changed that round: the grouped
#     two-phase rewrite of corpus_mix_by_source, the memory-bounded
#     simhash64, the four global_order consumers (ntile divisor clamp),
#     the rm SCD2 pins moved to localCheckpoint, and multimodal_features
#     (oracle division guard);
# (3) canaries proven earlier and unchanged, kept in-window so a shared
#     loader/pipeline regression is caught by the driver: one events
#     query, the flagship;
# (4) all 11 queries whose last green row is round 1 — the stalest
#     evidence in the registry;
# (5) the 24 oldest r3-green rows, rotated in to refresh them.
# Everything else (green in r4/r5 and unchanged) follows, oracled first.
_R7_WINDOW = (
    # (1) never driver-green — new this round
    "chunk_hybrid_rrf_topk",
    "quality_rule_funnel",
    "corpus_vocab_drift",
    "minhash_estimate_calibration",
    "dedup_decision_report",
    "curation_pipeline_summary",
    "term_cooccurrence_pmi",
    "embedding_centroid_drift",
    "event_transition_matrix",
    "orders_revenue_growth",
    "user_cadence_stats",
    "neardup_degree_histogram",
    "source_token_percentiles",
    "dedup_savings_by_source",
    "events_dow_hour_profile",
    "customer_rfm_segments",
    "session_quality_by_day",
    # newly ORACLED this round (was rows-only): recursive-CTE EMA oracle
    "events_user_ema",
    # (2) changed implementations needing re-proof
    "purchase_attribution",
    "purchase_prior_click_counts",
    "events_daily_quality",
    "events_anomaly_zscore",
    "corpus_shard_summary",
    "chunk_bm25_topk",
    "hybrid_rrf_topk",
    "pq_code_histogram",
    "pq_adc_topk_vec0",
    "pq_rerank_topk_vec0",
    "kmeans_cell_profile",
    "kmeans_ivf_topk_vec0",
    "incremental_neardup_new_batch",
    "neardup_pairs_lsh",
    "documents_after_dedup",
    "neardup_keep_best",
    "neardup_components",
    "neardup_triangle_count",
    "neardup_embedding_consistency",
    # (3) canaries (loader / flagship)
    "events_sessionize",
    "q1_pricing_summary",
    # (4) stalest green rows (r3/r4 evidence that yielded slots in r6)
    "dedup_exact_groups",
    "doc_quality",
    "lang_id_confusion",
    "minhash_signatures",
    "multimodal_image_decode",
    "doc_length_histogram",
    "doc_top_terms_tfidf",
    "doc_fingerprint",
    "customer_order_ids_array",
    "embedding_vector_stats",
    "events_downsample_gapfill",
    # (bigram_top20, cosine_topk_vec0, doc_lang_id, embedding_label_centroids,
    # embedding_neardup_pairs, events_json_extract, chunk_dedup_stats,
    # ngram_jaccard_pairs, simhash32_signatures, stratified_sample_docs
    # yielded their refresh slots to keep the window at the driver's
    # 50-row gate; all r3-green, unchanged, and re-proven green in this
    # round's FULL-registry sweep at sf0.01 regardless)
)


def _ordered_names(merged: dict, oracles: dict) -> list[str]:
    unknown = set(_R7_WINDOW) - merged.keys()
    if unknown:
        # Fail fast: a stale/misspelled window entry would otherwise
        # silently lose its gate slot (this masked a missing query in r4).
        raise ValueError(f"window names not in registry: {sorted(unknown)}")
    order: list[str] = list(_R7_WINDOW)
    seen = set(order)
    # remainder: r3/r4-proven rows, oracled before rows-only
    rest = [n for n in merged if n not in seen]
    order += [n for n in rest if n in oracles]
    order += [n for n in rest if n not in oracles]
    return order


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)
    oracles = all_oracles()
    return {n: merged[n] for n in _ordered_names(merged, oracles)}


def all_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _modules():
        merged.update(mod.ORACLE)
    return merged
