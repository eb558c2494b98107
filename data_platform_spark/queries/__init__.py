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
# dict order. Round-11 window: the DRAIN round (VERDICT r10 item 1 /
# "What's wrong" #3 — the window arithmetic stopped closing at 49
# never-driver-green queries). Registration this round is capped at TWO
# new queries (inside VERDICT's "cap at ~3"): semantic_dedup_cells
# (VERDICT item 2, windowed) and semantic_dedup_survivors (the
# true-greedy ADVICE follow-through — registered BELOW the window with
# local deep-compare evidence at both gate SFs, first in line for an
# r12 slot). The entire window goes to queries that have NEVER held a
# driver CORRECTNESS row:
# (1) the four r9 persisted-index serving roundtrips — the only gate
#     evidence for band/ivf/lexical/hybrid serving today is local.
#     hybrid_index_roundtrip doubles as the re-proof slot for this
#     round's hybrid-serving change (the ivfpq dense-leg option);
# (2) semantic_dedup_cells — the scale-safe (n_cells ∝ corpus)
#     semantic dedup registered this round;
# (3) approx_stats_sketches — rows-only until this round; its new
#     error-bound-boolean oracle makes the registry 279+1/280 oracled
#     and this its first hash-gated slot;
# (4) the remaining never-green cohort: r9 batch-1 relational/events
#     (26-query cohort), text batches E-H, and the r9 embedding-stats
#     family — everything from VERDICT r10's 49-query debt list EXCEPT
#     embedding_dim_correlation_top (deferred to lead r12: it is in the
#     bench headline, so it carries measured-execution evidence every
#     round — the strongest non-driver signal in the cohort).
# NOT in this window, first in line for r12: embedding_dim_correlation_top
# (above), and the two re-proofs for queries changed this round with
# value-identical/locally-deep-compared results (doc_length_moments_by_source
# — DECIMAL fold fix, bit-identical at gate scale; events_type_lag_correlation
# — both-orientations fix, deep-compare green), plus the stale r3/r4-green
# refresh cohort listed in the r10 rationale. No canaries this round:
# q1_pricing_summary/events_sessionize are r10-green and unchanged, and
# every slot they'd take is a query with NO driver row at all.
# --- round-10 window rationale (kept for history) ---
# (1) never driver-green — r9's batches 2-4 (25 queries registered below
#     the r9 window; their round-9 evidence is the local deep-compare
#     through the driver's comparison path + the parity sweep);
# (2) never driver-green — the queries new THIS round (15 analytic
#     queries + the IVF-PQ roundtrip putting the round's new composed
#     index family under the driver's oracle);
# (3) re-proof: pq_index_roundtrip — pq_search_index's ADC lookup table
#     was extracted into the shared _pq_query_dist_table (consistency-
#     by-construction with the IVF-PQ search);
# (4) canaries (loader / flagship); then
# (5) the six stale-green refreshes deferred from r9.
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
_R11_WINDOW = (
    # (1) the four persisted-index serving roundtrips — never
    # driver-checked (the r9 artifacts never landed); hybrid also
    # re-proves this round's dense-leg change
    "band_index_roundtrip",
    "ivf_index_roundtrip",
    "lexical_index_roundtrip",
    "hybrid_index_roundtrip",
    # (2) new this round: the scale-safe semantic dedup
    "semantic_dedup_cells",
    # (3) first hash-gated slot for the newly-oracled sketch query
    "approx_stats_sketches",
    # (4) the never-driver-green cohort (VERDICT r10's debt list minus
    # embedding_dim_correlation_top — see rationale above), in the
    # relational / events / text / dedup / similarity / graph order of
    # the NOTES_r9 registration listing
    "order_lineitem_count_percentiles",
    "order_brand_affinity",
    "nation_supplier_revenue_hhi",
    "orders_weekday_profile",
    "brand_return_rates",
    "part_supplier_redundancy",
    "ship_delay_percentiles",
    "customer_order_intervals",
    "orders_backlog_by_month",
    "supplier_price_premium",
    "lineitem_return_delay_profile",
    "discount_band_revenue",
    "orders_priority_value_anova",
    "events_user_gini",
    "event_type_user_affinity_pmi",
    "events_session_paths",
    "events_value_percentiles_by_type",
    "events_daily_new_vs_returning",
    "events_props_value_stats",
    "events_session_conversion_profile",
    "events_value_benford",
    "user_event_type_diversity",
    "events_gap_survival_curve",
    "hybrid_leg_agreement",
    "doc_char_entropy",
    "doc_bigram_logprob",
    "source_unigram_kl",
    "doc_lexical_diversity",
    "doc_oov_rate",
    "corpus_language_confusion",
    "doc_quality_by_split",
    "doc_char_class_profile",
    "corpus_doc_length_gini",
    "vocab_overlap_by_source_pair",
    "corpus_ngram_novelty",
    "crosssource_neardup_share",
    "corpus_prefix_dup_rate",
    "source_prefix_template_topk",
    "embedding_norm_audit",
    "embedding_dim_stats",
    "label_embedding_separation",
    "ivf_label_confusion",
    "doc_quality_vs_embedding_norm",
    "term_graph_degree_stats",
)



def _ordered_names(merged: dict, oracles: dict) -> list[str]:
    unknown = set(_R11_WINDOW) - merged.keys()
    if unknown:
        # Fail fast: a stale/misspelled window entry would otherwise
        # silently lose its gate slot (this masked a missing query in r4).
        raise ValueError(f"window names not in registry: {sorted(unknown)}")
    order: list[str] = list(_R11_WINDOW)
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
