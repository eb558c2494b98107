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
# dict order. Cumulative accounting entering round 8: 186 registered (185
# oracled — the floor: approx_stats_sketches exposes engine-specific
# sketch internals); every query registered through r7 carries a
# driver-green row. The round-8 window packs, in order:
# (1) never driver-green: the 8 queries new this round (IQR outlier
#     fences, cohort LTV, weekly active users, term burstiness,
#     readability, dedup cost curve, PQ subspace distortion, gap
#     histogram) plus simhash_signatures, rows-only until the sha256
#     re-key gave it an oracle;
# (2) re-proof of every implementation changed this round: the four
#     grouped-percentile rewires (source percentiles, session quality,
#     daily quality, order price stats) + the allowlisted cadence stats
#     and the monitor-sharing z-score; the whole persist-sweep family in
#     dedup/similarity (scoped_persist is behavior-identical, but the
#     sweep touched every LSH-family query body); and the global_order
#     consumers after its cache-registry change;
# (3) canaries (loader / flagship); then
# (4) the stalest green rows (r3-green evidence that yielded its refresh
#     slots in r7), rotated in.
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
_R8_WINDOW = (
    # (1) never driver-green — new this round
    "order_value_iqr_outliers",
    "customer_cohort_ltv",
    "events_weekly_active_users",
    "term_burstiness",
    "doc_readability_scores",
    "corpus_dedup_cost_curve",
    "pq_subspace_distortion",
    "events_interarrival_histogram",
    # newly ORACLED this round (was rows-only): sha256-keyed simhash
    "simhash_signatures",
    # (2) changed implementations needing re-proof
    # grouped-percentile rewires + the allowlisted native-percentile site
    "source_token_percentiles",
    "session_quality_by_day",
    "events_daily_quality",
    "order_price_stats",
    "user_cadence_stats",
    "events_anomaly_zscore",
    # persist-sweep (scoped_persist) touched every LSH-family query body
    "neardup_pairs_lsh",
    "documents_after_dedup",
    "neardup_keep_best",
    "neardup_components",
    "neardup_triangle_count",
    "neardup_embedding_consistency",
    "simhash_neardup_pairs",
    "incremental_neardup_new_batch",
    "dedup_decision_report",
    "curation_pipeline_summary",
    "minhash_estimate_calibration",
    "neardup_degree_histogram",
    "dedup_savings_by_source",
    "ngram_containment_pairs",
    "knn_within_buckets",
    "srp_bucket_histogram",
    # global_order consumers after its cache-registry change
    "customer_rfm_segments",
    "bm25_topk",
    "hybrid_rrf_topk",
    "corpus_pack_sequences",
    "corpus_mix_by_source",
    # (3) canaries (loader / flagship)
    "events_sessionize",
    "q1_pricing_summary",
    # (4) stalest green rows (r3-green; yielded their refresh slots in r7)
    "bigram_top20",
    "cosine_topk_vec0",
    "doc_lang_id",
    "embedding_label_centroids",
    "embedding_neardup_pairs",
    "events_json_extract",
    "chunk_dedup_stats",
    "ngram_jaccard_pairs",
    "simhash32_signatures",
    "stratified_sample_docs",
    # (1b) two more never-green queries added late in the round — they
    # take the last two slots from stale refreshes (term_idf,
    # term_zipf_ranks, token_stats_by_lang yielded; r3-green, unchanged)
    "events_user_daily_sequences",
    "customer_revenue_pareto",
)


def _ordered_names(merged: dict, oracles: dict) -> list[str]:
    unknown = set(_R8_WINDOW) - merged.keys()
    if unknown:
        # Fail fast: a stale/misspelled window entry would otherwise
        # silently lose its gate slot (this masked a missing query in r4).
        raise ValueError(f"window names not in registry: {sorted(unknown)}")
    order: list[str] = list(_R8_WINDOW)
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
