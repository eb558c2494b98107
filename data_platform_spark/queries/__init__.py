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
# dict order. Cumulative accounting entering round 6: 161 registered, 137
# carry a driver-green row from r1-r5 (hash-green, or rows-only with rows
# for the 3 un-oracled ones); the 24 without are new this round. Evidence
# age after r5: 50 green in r5, 40 in r4, 36 in r3, 11 stuck at r1. The
# round-6 window packs, in order:
# (1) the 24 queries with NO green row ever (new this round: BM25
#     retrieval, unigram-LM scoring, BPE pair induction, incremental
#     dedup, the three product-quantization queries, term PageRank,
#     hybrid RRF fusion, n-gram containment, rolling z-score anomaly,
#     incremental near-dup, erasure cascade, temperature mixing,
#     chunk-granularity BM25, image augmentation, attribution,
#     lang-ID scorecard, cross-modal consistency, daily quality monitor,
#     token-balanced sharding, ES weighted sampling, behavioral
#     entropy, per-source rank normalization);
# (2) re-proof of every implementation changed this round: the grouped
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
_R6_WINDOW = (
    # (1) never driver-green — new this round
    "bm25_topk",
    "doc_unigram_logprob",
    "bpe_pair_merge_round",
    "incremental_dedup_new_batch",
    "pq_code_histogram",
    "pq_adc_topk_vec0",
    "pq_rerank_topk_vec0",
    "term_pagerank_topk",
    "hybrid_rrf_topk",
    "ngram_containment_pairs",
    "events_anomaly_zscore",
    "incremental_neardup_new_batch",
    "erasure_cascade_audit",
    "corpus_temperature_mix",
    "chunk_bm25_topk",
    "multimodal_image_augment",
    "purchase_attribution",
    "lang_id_metrics",
    "neardup_embedding_consistency",
    "events_daily_quality",
    "corpus_shard_summary",
    "quality_weighted_sample",
    "user_event_entropy",
    "quality_percentile_by_source",
    # (2) changed implementations needing re-proof
    "corpus_mix_by_source",
    "simhash_signatures",
    "term_zipf_ranks",
    "corpus_token_budget_sample",
    "corpus_pack_sequences",
    "customer_balance_quartiles",
    "rm_dim_character_after_mutation",
    "rm_dim_character_three_batches",
    "multimodal_features",
    # (3) canaries (loader / flagship)
    "events_sessionize",
    "q1_pricing_summary",
    # (4) last green in round 1
    "decimal_revenue_exact",
    "events_props_map",
    "grouping_sets_orders",
    "monthly_order_calendar",
    "nationkeys_except_all",
    "nationkeys_intersect_all",
    "order_price_histogram",
    "q22_idle_customers",
    "q7_nation_trade_volume",
    "q8_market_share",
    "rank_vs_dense_rank_orders",
    # (5) oldest r3-green rows
    "doc_text_stats",
    "events_hourly_by_type",
    "events_running_total",
    "events_session_window_builtin",
    "events_sliding_window_counts",
    "knn_within_buckets",
    # 18 r3-green rows (dedup_exact_groups, doc_quality,
    # lang_id_confusion, minhash_signatures,
    # multimodal_image_decode, doc_length_histogram, doc_top_terms_tfidf,
    # doc_fingerprint, customer_order_ids_array, documents_after_dedup,
    # embedding_vector_stats, events_downsample_gapfill, bigram_top20,
    # cosine_topk_vec0, doc_lang_id, embedding_label_centroids,
    # embedding_neardup_pairs, events_json_extract) yielded their refresh
    # slots to the 24 round-6 queries — first evidence beats refresh, and
    # the window stays near the driver's ~50-query gate
)


def _ordered_names(merged: dict, oracles: dict) -> list[str]:
    unknown = set(_R6_WINDOW) - merged.keys()
    if unknown:
        # Fail fast: a stale/misspelled window entry would otherwise
        # silently lose its gate slot (this masked a missing query in r4).
        raise ValueError(f"window names not in registry: {sorted(unknown)}")
    order: list[str] = list(_R6_WINDOW)
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
