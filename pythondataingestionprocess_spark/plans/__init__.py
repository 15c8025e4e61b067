"""Query plan catalog. Importing this package populates REGISTRY.

Registration order IS the driver's CORRECTNESS execution order: the
driver checks exactly the first 50 ``queries()`` entries per round
(both CORRECTNESS_r01 and _r02 have exactly 50 rows, cut at registry
position 49 — VERDICT r2 headline). Order is therefore an explicit
per-round rotation, rebuilt after all modules register:

1. first: the queries with the STALEST driver evidence (computed
   from the CORRECTNESS_r0N.json union each round);
2. next: queries newly added this round (never checked by definition)
   and queries whose oracle basis changed this round;
3. tail: everything else, with fresher evidence.

``tests/test_registry_rotation.py`` pins the first-50 set so a silent
reorder can't re-darken a family.
"""

from pythondataingestionprocess_spark.plans.registry import REGISTRY, QuerySpec, query

# Each module registers its queries on import.
from pythondataingestionprocess_spark.plans import source_queries  # noqa: E402,F401
from pythondataingestionprocess_spark.plans import streaming_queries  # noqa: E402,F401
from pythondataingestionprocess_spark.plans import asof_queries  # noqa: E402,F401
from pythondataingestionprocess_spark.plans import subqueries  # noqa: E402,F401
from pythondataingestionprocess_spark.plans import llm_ops  # noqa: E402,F401
from pythondataingestionprocess_spark.plans import core_relational  # noqa: E402,F401
from pythondataingestionprocess_spark.plans import windows  # noqa: E402,F401
from pythondataingestionprocess_spark.plans import cleaning_queries  # noqa: E402,F401
from pythondataingestionprocess_spark.plans import warehouse  # noqa: E402,F401
from pythondataingestionprocess_spark.plans import llm_heavy  # noqa: E402,F401
from pythondataingestionprocess_spark.plans import tpch_shapes  # noqa: E402,F401
from pythondataingestionprocess_spark.plans import timeseries_queries  # noqa: E402,F401
from pythondataingestionprocess_spark.plans import feature_queries  # noqa: E402,F401
from pythondataingestionprocess_spark.plans import graph_queries  # noqa: E402,F401
from pythondataingestionprocess_spark.plans import corpus_ops  # noqa: E402,F401

# --- round-5 rotation ------------------------------------------------
# Driver-check union after r4 is 136/136 (every registered query has a
# green CORRECTNESS row; latest evidence: 50 from r4, 48 from r3, 38
# from r2 — computed from CORRECTNESS_r0{1..4}.json). The window
# refreshes the STALEST evidence: the 38 last-checked-in-r2 queries go
# first, then this round's 10 new registrations, then the 2 queries
# whose oracle BASIS changed this round (determinism fixes) — exactly
# 50, so the r3/r4-checked queries sit in the tail.
STALE_R2 = [
    "argmax_customer_balance",
    "bilateral_trade_volume",
    "conditional_agg_priority",
    "corr_moments_stats",
    "disjunctive_predicate_revenue",
    "doc_packing_shards",
    "dq_price_outliers_mad",
    "embedding_knn_brute",
    "embedding_norms",
    "events_asof_last_click",
    "events_cohort_retention",
    "events_cumulative_unique_users",
    "exists_agg_discounted_orders",
    "exists_not_exists_orders",
    "funnel_three_step",
    "funnel_view_to_purchase",
    "having_large_orders",
    "idle_customers_segment",
    "monthly_revenue_trend",
    "multimodal_binary_meta",
    "multimodal_decode_stats",
    "percentile_cont_prices",
    "pit_scd2_price_join",
    "qualify_above_avg_suppliers",
    "range_join_quantity_bands",
    "revenue_share_top_customers",
    "scalar_subquery_small_qty",
    "skewed_join_salted",
    "string_agg_nations",
    "text_bpe_token_count",
    "text_contamination_check",
    "text_lang_id",
    "text_pii_redact",
    "text_quality_score",
    "text_repetition_stats",
    "text_tfidf_top_terms",
    "text_token_count",
    "unnest_top_words",
]

# Queries first registered in round 5 — never checked, so they ride
# inside the 50-row window. Append here when registering a new query.
NEW_R5: list[str] = [
    "q21_waiting_suppliers",
    "q13_order_count_distribution",
    "q4_priority_order_checks",
    "q5_local_supplier_volume",
    "q8_market_share",
    "q10_returned_items",
    "q14_promo_revenue",
    "q18_large_volume_customers",
    "dedup_containment",
    "events_funnel_watermark",
]

# Staged for ROUND 6 (registered late in r5, deliberately OUTSIDE the
# r5 window — the 50 slots were already committed). Round 6's rotation
# is fully determined: the 48 queries last checked in r3 become the
# stale front-load, and these 2 fill the window to exactly 50. The r6
# session should rename this to NEW_R6-applied by folding it into the
# priority list after rebuilding STALE from CORRECTNESS_r05.
NEW_R6_STAGED: list[str] = [
    "stream_static_revenue_rollup",
    "q9_profit_by_nation_year",
]

# Staged for ROUND 7 (registered late in r5; r6's two free slots are
# already spent by NEW_R6_STAGED, and r7's stale front-load — the 50
# r4-checked queries minus whatever r6 re-rides — leaves room: r7 =
# 39 stale-r4 + these 11; the r4 left-overs front-load r8). Every
# entry is oracle-checked by scripts/driver_sim.py at sf0.01 AND the
# vanilla-session recipe before commit; the two time-series entries
# additionally carry proven cross-engine tests
# (test_subsequence_match_matches_duckdb_oracle,
# test_decayed_feature_matches_python_recursion).
NEW_R7_STAGED: list[str] = [
    "events_pattern_match",
    "events_decayed_feature",
    "events_resample_interpolate",
    "corpus_curation_filter",
    "text_bpe_pair_counts",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "q12_lateness_priority",
    "events_next_event_training",
    "corpus_build_pipeline",
    "equidepth_price_bands",
]

# Staged for ROUND 8 (registered in the round-5 continuation session,
# outside the r5/r6 windows; r7's window is already full at 39
# stale-r4 + 11 NEW_R7_STAGED, so these ride r8 together with the 11
# r4-checked left-overs that front-load it: 11 + 12 = 23 of r8's 50,
# leaving the rest for r5-checked refresh). Each entry is
# oracle-verified by scripts/driver_sim.py at sf0.01 before commit.
NEW_R8_STAGED: list[str] = [
    "incremental_agg_maintenance",
    "trend_slope_per_nation",
    "feature_winsorize_robust",
    "zorder_layout_cells",
    "copurchase_triangles",
    "part_clustering_coefficient",
    "pii_pseudonymize_vault",
    "unpivot_charge_components",
    "hierarchical_revenue_share",
    "window_edge_values",
    "recursive_cte_subtree_rollup",
    "dq_order_reconciliation",
]

# Staged for ROUND 9 (registered in the third r5 continuation
# session; the r6/r7/r8 windows are already fully budgeted above).
# Each entry is oracle-verified by scripts/driver_sim.py at sf0.01
# AND the vanilla-session recipe before commit. r9 window math: r8
# runs 23 new/stale + 27 r5-refresh, so r9 = these 8 + the stalest
# evidence at that point.
NEW_R9_STAGED: list[str] = [
    "corpus_block_dedup",
    "doc_chunking_overlap",
    "inverted_index_postings",
    "train_val_test_split",
    "corpus_weighted_sample",
    "inverted_index_incremental",
    "bm25_retrieval_topk",
    "corpus_temperature_mix",
]

# Queries whose SEMANTICS/ORACLE changed basis this round (the r4
# ADVICE determinism fixes: merge_event_intervals now running-sums
# over the flag window's (s, event_id) total order on both sides;
# events_asof_next_purchase pre-dedupes purchases per (user_id, ts)):
# they were green in r4, but never against these definitions — ride
# inside the window so the change gets a driver row the round it
# lands.
PROMOTED_R5: list[str] = [
    "merge_event_intervals",
    "events_asof_next_purchase",
]


def _apply_rotation() -> None:
    priority = STALE_R2 + NEW_R5 + PROMOTED_R5
    missing = [n for n in priority if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"rotation names not in REGISTRY: {missing}")
    seen = set(priority)
    ordered = priority + [n for n in REGISTRY if n not in seen]
    snapshot = {n: REGISTRY[n] for n in ordered}
    REGISTRY.clear()
    REGISTRY.update(snapshot)


_apply_rotation()

__all__ = [
    "REGISTRY",
    "QuerySpec",
    "query",
    "STALE_R2",
    "NEW_R5",
    "PROMOTED_R5",
    "NEW_R6_STAGED",
    "NEW_R7_STAGED",
    "NEW_R8_STAGED",
    "NEW_R9_STAGED",
]
