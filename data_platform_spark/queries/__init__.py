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
        multimodal,
        relational,
        rm_pipeline,
        similarity,
        text,
    )

    return (relational, events, text, dedup, similarity, multimodal, rm_pipeline)


# The driver's correctness gate checks the FIRST ~50 registered queries, in
# dict order. Cumulative accounting entering round 5: 130 registered, 123
# carry a driver-green row from r1-r4 (hash-green, or rows-only with rows
# for the 3 un-oracled ones); the 7 without are multimodal_features
# (r4 ERR, now scalar-projected AND oracled) and the 6 queries new this
# round. The round-5 window packs, in order:
# (1) the 7 queries with NO green row ever;
# (2) re-proof of every implementation changed this round: the three
#     two-phase global-order rewrites, the vectorized simhash64 signature
#     path, and the five ANN queries refactored onto the DataFrame-level
#     pipelines;
# (3) canaries proven in earlier rounds and unchanged, kept in-window so a
#     shared-loader/pipeline regression is caught by the driver (ADVICE r4):
#     one events query, one rm SCD2 pin, the flagship;
# (4) 31 of the 35 queries whose last green row is round 1 — the stalest
#     evidence in the registry, rotated back in to refresh it (4 r1-green
#     slots yielded to the new queries: first evidence beats refresh).
# Everything else (green in r1/r3/r4 and unchanged) follows, oracled first.
_R5_WINDOW = (
    # (1) never driver-green (all but multimodal_features are new this round)
    "multimodal_features",
    "fact_fk_orphans",
    "tpch_fk_orphans",
    "srp_banded_ann_vec0",
    "corpus_mix_by_source",
    "dedup_keep_best",
    "neardup_keep_best",
    "events_hourly_gapfill",
    "events_zorder_two_dim_slice",
    "kmeans_cell_profile",
    "kmeans_ivf_topk_vec0",
    "doc_chunking",
    "corpus_pack_sequences",
    "chunk_dedup_stats",
    # (2) changed implementations needing re-proof
    "term_zipf_ranks",
    "corpus_token_budget_sample",
    "customer_balance_quartiles",
    "simhash_signatures",
    "srp_ann_multiprobe_vec0",
    "ivf_topk_vec0",
    "ivf_assign_nearest_centroid",
    "ann_recall_at_k",
    "ivf_recall_at_k",
    # (3) canaries (loader / pipeline / flagship)
    "events_sessionize",
    "rm_dim_character_three_batches",
    "q1_pricing_summary",
    # (4) last green in round 1
    "rollup_order_totals",
    "unknown_member_events",
    "q4_priority_with_late_items",
    "q17_small_quantity_revenue",
    "nations_intersect",
    "nations_except",
    "cube_order_stats",
    "pivot_user_event_matrix",
    "skew_safe_event_type_counts",
    "nation_customer_supplier_counts",
    "sql_api_revenue_by_status",
    "q14_promo_revenue_ratio",
    "q2_min_price_per_brand",
    "q19_disjunctive_revenue",
    "customer_ids_parsed",
    "orders_by_year",
    "latest_event_per_user",
    "p5_guarded_date_roundtrip",
    "p6_empty_url_normalization",
    "order_price_stats",
    "value_correlation",
    "q6_forecast_revenue",
    "q10_returned_item_customers",
    "q18_large_volume_orders",
    # q22_idle_customers, rank_vs_dense_rank_orders, nationkeys_intersect_all,
    # nationkeys_except_all, order_price_histogram, grouping_sets_orders,
    # events_props_map, decimal_revenue_exact, q8_market_share,
    # monthly_order_calendar, q7_nation_trade_volume (all r1-green)
    # yielded their slots to the round-5 queries above
)


def _ordered_names(merged: dict, oracles: dict) -> list[str]:
    unknown = set(_R5_WINDOW) - merged.keys()
    if unknown:
        # Fail fast: a stale/misspelled window entry would otherwise
        # silently lose its gate slot (this masked a missing query in r4).
        raise ValueError(f"window names not in registry: {sorted(unknown)}")
    order: list[str] = list(_R5_WINDOW)
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
