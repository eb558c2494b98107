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
# dict order. Cumulative accounting entering round 10: 248 registered (247
# oracled); every query registered through r8 carries a driver-green row,
# and the r9 window covered that round's first batch + the late
# index-roundtrip family. The round-10 window packs, in order:
# (1) never driver-green — r9's batches 2-4 (25 queries registered below
#     the r9 window; their round-9 evidence is the local deep-compare
#     through the driver's comparison path + the parity sweep);
# (2) never driver-green — the queries new THIS round (15 analytic
#     queries + the IVF-PQ roundtrip putting the round's new composed
#     index family under the driver's oracle);
# (3) re-proof: pq_index_roundtrip — pq_search_index's ADC lookup table
#     was extracted into the shared _pq_query_dist_table this round
#     (consistency-by-construction with the IVF-PQ search), so the
#     persisted PQ serve path re-proves on the changed code;
# (4) canaries (loader / flagship); then
# (5) the six stale-green refreshes deferred from r9
#     (events_sliding_window_counts, multimodal_meta,
#     q12_priority_by_month, retention_cohorts, srp_ann_topk_vec0,
#     top_user_per_hour — all r3/r4-green, unchanged). The rest of the
#     r4 cohort remains first in line for r11.
# --- round-9 window rationale (kept for history) ---
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
_R10_WINDOW = (
    # (1) never driver-green — r9 batches 2-4, registered below that
    # round's window (relational / events / text / dedup / similarity /
    # graph order, the NOTES_r9 listing)
    "nation_trade_balance",
    "customer_spend_band_migration",
    "part_type_market_share_by_region",
    "ship_delay_monthly_trend",
    "order_fulfilment_span",
    "orders_priority_mix_shift",
    "segment_priority_contingency",
    "nation_self_trade_share",
    "brand_unit_price_dispersion",
    "events_bounce_rate_by_day",
    "events_session_duration_by_entry",
    "events_markov_logprob",
    "purchase_attribution_time_decay",
    "events_hourly_value_interpolated",
    "events_value_autocorrelation",
    "events_anomaly_mad",
    "corpus_vocab_growth",
    "positional_unigram_kl",
    "source_bigram_cond_entropy",
    "shingle_df_histogram",
    "neardup_cluster_size_histogram",
    "crosssource_exact_dup_matrix",
    "embedding_quantization_error",
    "term_graph_reciprocity",
    "term_graph_clustering_coefficient",
    # (2) never driver-green — new in round 10
    "events_trimmed_value_stats",
    "events_type_lag_correlation",
    "brand_price_size_slope",
    "corpus_split_assignment",
    "source_unigram_jsd",
    "semantic_dedup_labels",
    "ivfpq_index_roundtrip",
    "term_graph_assortativity",
    "nation_revenue_rank_shift",
    "events_user_lifespan_histogram",
    "doc_length_moments_by_source",
    "corpus_dup_quality_lift",
    "events_hourly_seasonality_strength",
    "token_length_histogram",
    "customer_repeat_rate_by_segment",
    "event_value_topk_user_share",
    # (3) re-proof: the persisted PQ serve path re-proves after its ADC
    # lookup table moved into the shared _pq_query_dist_table (r10)
    "pq_index_roundtrip",
    # (4) canaries (loader / flagship)
    "events_sessionize",
    "q1_pricing_summary",
    # (5) the six stale-green refreshes deferred from r9 (all r3/r4
    # green, unchanged since; the remaining r4 cohort — asof join,
    # decontamination, semi/anti probes, redaction, repetition stats,
    # clustered time slice, rolling hour value, incremental rollups,
    # funnel, the three multimodal decodes, union-distinct, price-band
    # join, orders profile, fuzzy pairs, type words — stays first in
    # line for r11)
    "events_sliding_window_counts",
    "multimodal_meta",
    "q12_priority_by_month",
    "retention_cohorts",
    "srp_ann_topk_vec0",
    "top_user_per_hour",
)



def _ordered_names(merged: dict, oracles: dict) -> list[str]:
    unknown = set(_R10_WINDOW) - merged.keys()
    if unknown:
        # Fail fast: a stale/misspelled window entry would otherwise
        # silently lose its gate slot (this masked a missing query in r4).
        raise ValueError(f"window names not in registry: {sorted(unknown)}")
    order: list[str] = list(_R10_WINDOW)
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
