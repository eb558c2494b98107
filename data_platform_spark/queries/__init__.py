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
# dict order. Cumulative accounting across rounds 1-3: 95 distinct queries
# have a driver-green CORRECTNESS row; 29 were registered after the round-2
# window froze and have never been driver-checked; 3 events queries regressed
# in round 3 when the testdata timestamps switched to TIMESTAMP_NTZ (fixed in
# sources/tables.py). The round-4 window therefore packs, in order:
# (1) the 3 round-3 regressions, fixed — their fresh green rows lead;
# (2) the 29 never-checked queries (oracled first, rows-only last);
# (3) new round-4 queries (FK-integrity, scale-safe window rewrites);
# (4) rm_pipeline SCD2 pins + flagship relational to fill the 50.
# Everything else (driver-proven in r1/r2 and unchanged) follows.
_R4_WINDOW = (
    # (1) round-3 regressions, fixed
    "events_sessionize",
    "funnel_click_to_purchase",
    "events_rolling_hour_value",
    # (2) never driver-checked, oracled
    "simhash32_signatures",
    "simhash_neardup_pairs",
    "purchase_prior_click_counts",
    "doc_redaction",
    "ivf_topk_vec0",
    "ivf_recall_at_k",
    "ngram_jaccard_pairs",
    "events_rollup_incremental",
    "price_quantity_regression",
    "part_name_fuzzy_pairs",
    "events_clustered_time_slice",
    "multimodal_audio_decode",
    "multimodal_video_decode",
    "multimodal_frame_sample",
    "doc_repetition_stats",
    "benchmark_decontamination",
    "q9_profit_by_nation_year",
    "q11_important_part_value",
    "q13_customer_order_distribution",
    "q15_top_supplier",
    "q16_part_supplier_counts",
    "q20_excess_red_shippers",
    "q21_waiting_suppliers",
    "orders_price_band_join",
    "orders_profile",
    # (3) round-4 additions + scale-safe rewrites needing re-proof
    "fact_fk_orphans",
    "corpus_token_budget_sample",
    "customer_balance_quartiles",
    "term_zipf_ranks",
    # (4) reference-parity SCD2 pins + flagships
    "rm_dim_character_first_load",
    "rm_fact_char_loc_first_load",
    "rm_dim_character_after_mutation",
    "rm_dim_character_three_batches",
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_region_revenue",
    "topk_orders_per_customer",
    "asof_purchase_last_click",
    "scd2_order_versions",
    "value_change_detection",
    # (2) never driver-checked, rows-only (weaker evidence → window tail)
    "events_user_ema",
    "approx_stats_sketches",
    "simhash_signatures",
    "multimodal_features",
)


def _ordered_names(merged: dict, oracles: dict) -> list[str]:
    order: list[str] = [n for n in _R4_WINDOW if n in merged]
    seen = set(order)
    # remainder: driver-proven r1/r2 rows, oracled before rows-only
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
