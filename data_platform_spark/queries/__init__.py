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
# dict order. Cumulative accounting entering round 9: 200 registered (199
# oracled — the floor: approx_stats_sketches exposes engine-specific
# sketch internals); every query registered through r8 carries a
# driver-green row. The round-9 window packs, in order:
# (1) never driver-green: the 26 queries new this round (retrieval-leg
#     agreement, char entropy, bigram-LM scoring, user Gini, vocabulary
#     overlap, embedding norm audit, order-size percentiles, brand
#     affinity lift, supplier-revenue HHI, weekday seasonality,
#     event-type PMI, n-gram novelty, brand return rates, supplier
#     redundancy, ship-delay percentiles, source KL drift, lexical
#     diversity, session paths, embedding dim stats, order intervals,
#     adjacency-graph degrees, OOV rate, cross-source near-dup share,
#     prefix-dup rate, label separation, per-type value percentiles);
# (2) re-proof of machinery touched this round: the cache registry went
#     thread-scoped (scoped_persist/release semantics identical
#     single-threaded, but every LSH/SRP/global_order consumer body
#     routes through it — representatives of each family), and the
#     grouped_percentile family (two new queries compose it, so its
#     r8-proven consumers re-prove alongside);
# (3) canaries (loader / flagship); then
# (4) the stalest green rows: the r3-green evidence the r8 window
#     dropped for its two late additions (term_idf, term_zipf_ranks,
#     token_stats_by_lang — VERDICT r8 item 7) plus the rest of the
#     r3 cohort, then the oldest r4-green rows to fill 50.
# --- round-8 window rationale (kept for history) ---
# (1) never driver-green: the 8 queries new that round + simhash_signatures
#     (rows-only until the sha256 re-key gave it an oracle);
# (2) re-proof of changed implementations: the four grouped-percentile
#     rewires + allowlisted cadence stats + monitor-sharing z-score; the
#     whole persist-sweep family in dedup/similarity; the global_order
#     consumers after its cache-registry change;
# (3) canaries; (4) stalest green rows rotated in.
_R9_WINDOW = (
    # (1) never driver-green — new this round
    "hybrid_leg_agreement",
    "doc_char_entropy",
    "doc_bigram_logprob",
    "events_user_gini",
    "vocab_overlap_by_source_pair",
    "embedding_norm_audit",
    "order_lineitem_count_percentiles",
    "order_brand_affinity",
    "nation_supplier_revenue_hhi",
    "orders_weekday_profile",
    "event_type_user_affinity_pmi",
    "corpus_ngram_novelty",
    "brand_return_rates",
    "part_supplier_redundancy",
    "ship_delay_percentiles",
    "source_unigram_kl",
    "doc_lexical_diversity",
    "events_session_paths",
    "embedding_dim_stats",
    "customer_order_intervals",
    "term_graph_degree_stats",
    "doc_oov_rate",
    "crosssource_neardup_share",
    "corpus_prefix_dup_rate",
    "label_embedding_separation",
    "events_value_percentiles_by_type",
    # (2) re-proof: thread-scoped cache registry consumers (one per
    # family that scoped_persists: LSH dedup, decision ledger, curation,
    # SRP, bucketed knn) + global_order/grouped_percentile composers
    "neardup_pairs_lsh",
    "dedup_decision_report",
    "curation_pipeline_summary",
    "srp_bucket_histogram",
    # (knn_within_buckets r8-green; srp_bucket_histogram already
    # re-proves the SRP scoped_persist family — slot yielded to batch 4)
    "source_token_percentiles",
    "session_quality_by_day",
    "events_daily_quality",
    "events_anomaly_zscore",
    "bm25_topk",
    "hybrid_rrf_topk",
    "corpus_pack_sequences",
    "customer_rfm_segments",
    "corpus_mix_by_source",
    # (3) canaries (loader / flagship)
    "events_sessionize",
    "q1_pricing_summary",
    # (1b) never driver-green — the round's LATE additions that outrank
    # stale-green refresh under the window policy: the five
    # index-roundtrip queries put the persisted serving paths (lexical,
    # band, IVF, PQ, hybrid) under the driver's oracle via verbatim
    # oracle reuse, and the Gram-matrix correlation is the round's new
    # mapInPandas partial-aggregation family (also bench-headlined)
    "lexical_index_roundtrip",
    "band_index_roundtrip",
    "ivf_index_roundtrip",
    "pq_index_roundtrip",
    "hybrid_index_roundtrip",
    "embedding_dim_correlation_top",
    # (4) stalest green rows — the r3 cohort first (term_idf /
    # term_zipf_ranks / token_stats_by_lang yielded their r8 slots to
    # the late additions; VERDICT r8 item 7). The other r3/r4 refresh
    # candidates (events_sliding_window_counts, multimodal_meta,
    # q12_priority_by_month, retention_cohorts, srp_ann_topk_vec0,
    # top_user_per_hour) yielded their slots to (1b) — all green,
    # unchanged, first in line for r10.
    "term_idf",
    "term_zipf_ranks",
    "token_stats_by_lang",
    # then the oldest r4-green rows, filling the window to 50
    # (asof_purchase_last_click, benchmark_decontamination,
    # customers_with_orders, customers_without_orders, doc_redaction,
    # doc_repetition_stats, events_clustered_time_slice,
    # events_rolling_hour_value, events_rollup_incremental,
    # funnel_click_to_purchase, multimodal_audio_decode,
    # multimodal_frame_sample, multimodal_video_decode yielded their
    # refresh slots to the round's third query batch, and
    # nationkeys_union_distinct, orders_price_band_join, orders_profile,
    # part_name_fuzzy_pairs, part_type_words to the second — all
    # r4-green, unchanged, first in line for r10)
)


def _ordered_names(merged: dict, oracles: dict) -> list[str]:
    unknown = set(_R9_WINDOW) - merged.keys()
    if unknown:
        # Fail fast: a stale/misspelled window entry would otherwise
        # silently lose its gate slot (this masked a missing query in r4).
        raise ValueError(f"window names not in registry: {sorted(unknown)}")
    order: list[str] = list(_R9_WINDOW)
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
