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

# --- round-11 rotation -----------------------------------------------
# Driver-check union after r10 is all-green (CORRECTNESS_r10 50/50 —
# no failure in ten rounds). Evidence ages over the r01..r10 files for
# the 177 post-retirement registered queries: 29 last-checked-r7, 46
# r8, 48 r9, 48 r10; nothing unchecked. The window carries ALL 29
# r7-aged queries (they hit the MAX_EVIDENCE_AGE=4 boundary this
# round — the r10 VERDICT's standing item 1) plus the alphabetical
# first 15 of the 46 r8-aged (the 31 same-age left-overs front-load
# r12), then the six NEW_R11_STAGED queries take their first official
# driver rows. Derived by scripts/rotation_calc.py AFTER the r11
# retirements (margin_defaults, first_match_pick, json_extract_props
# — capacity lever, substance pins documented at their old
# registration sites); the era-pinned test replays the derivation
# from an explicit r01..r10 file list.
STALE_R8 = [
    "argmax_customer_balance",
    "bilateral_trade_volume",
    "conditional_agg_priority",
    "copurchase_triangles",
    "corr_moments_stats",
    "dedup_containment",
    "disjunctive_predicate_revenue",
    "doc_packing_shards",
    "dq_order_reconciliation",
    "dq_price_outliers_mad",
    "embedding_knn_brute",
    "events_asof_last_click",
    "events_asof_next_purchase",
    "events_cohort_retention",
    "events_cumulative_unique_users",
    "events_resample_interpolate",
    "events_session_window",
    "events_sessionize_manual",
    "events_sliding_window",
    "events_time_weighted_value",
    "events_tumbling_window",
    "except_keys",
    "fuzzy_name_distance",
    "grouping_sets_agg",
    "histogram_quantity",
    "intersect_keys",
    "islands_user_activity",
    "json_map_functions",
    "lateral_top_orders",
    "not_in_null_semantics",
    "percent_rank_ntile",
    "pivot_status_revenue",
    "q11_important_parts",
    "q12_lateness_priority",
    "q15_top_supplier",
    "q16_supplier_count",
    "q20_dominant_suppliers",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "quantile_disc_prices",
    "rolling_median_user_value",
    "scd2_build_user_state",
    "state_change_compression",
    "text_bpe_pair_counts",
]

# First registered for round 11's window: the round-10 staged block
# (NEW_R11_STAGED, driver_sim-green at sf0.01 at registration and
# re-validated at fold time) — span-granular dedup (Lee et al. ACL
# 2022), SemDeDup (arXiv:2303.09540), DSIR importance resampling
# (arXiv:2302.03169), the CCNet-style boilerplate screen, the
# incremental connected-components fold, and the PQ/ADC ANN path
# (rows-only by the ANN contract). These ride INSIDE the r11 window,
# immediately after the stale block.
NEW_R11 = [
    "text_strip_boilerplate",
    "dedup_incremental_components",
    "embedding_ann_pq",
    "text_repeated_span_dedup",
    "dedup_semantic_semdedup",
    "corpus_dsir_importance",
]

def _apply_rotation() -> None:
    priority = STALE_R8 + NEW_R11
    missing = [n for n in priority if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"rotation names not in REGISTRY: {missing}")
    seen = set(priority)
    ordered = priority + [n for n in REGISTRY if n not in seen]
    snapshot = {n: REGISTRY[n] for n in ordered}
    REGISTRY.clear()
    REGISTRY.update(snapshot)


_apply_rotation()

# Stable alias for tooling (scripts/rotation_calc.py): the applied
# current-round NEW block, whatever its era-specific name is. Queries
# here ride THIS round's driver window, so their lack of evidence
# mid-round is expected, not a hole.
NEW_CURRENT = NEW_R11

__all__ = [
    "REGISTRY",
    "QuerySpec",
    "query",
    "STALE_R8",
    "NEW_R11",
    "NEW_CURRENT",
]
