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

# --- round-14 rotation -----------------------------------------------
# Driver-check union after r13 is all-green (CORRECTNESS_r13 50/50 —
# 47 hash + 3 rows-only per contract; no failure in thirteen rounds).
# Evidence ages over the r01..r13 files for the 180 registered
# queries: 30 last-checked-r10, 49 r11, 50 r12, 50 r13 (the two r13
# NEW faces took their first rows r13); nothing unchecked, nothing
# past the MAX_EVIDENCE_AGE=4 bound. The window carries ALL 30
# r10-aged queries (the front-load left-overs pinned in
# tests/test_registry_rotation.py last round) plus the alphabetical
# first 19 of the 49 r11-aged (the 30 same-age left-overs front-load
# r15), then the staged r14 face — `multimodal_real_decode_roundtrip`,
# the first face where the format decoders THEMSELVES are
# oracle-checked (multimodal/synth.py closed-form blob synthesis vs a
# DuckDB restatement) — takes its first official driver row. Derived
# by scripts/rotation_calc.py (exit 0, no warnings); the era-pinned
# test replays the derivation from an explicit r01..r13 file list.
STALE_R11 = [
    "argmax_customer_balance",
    "bilateral_trade_volume",
    "conditional_agg_priority",
    "copurchase_triangles",
    "corpus_dsir_importance",
    "corr_moments_stats",
    "dedup_containment",
    "dedup_incremental_components",
    "dedup_semantic_semdedup",
    "disjunctive_predicate_revenue",
    "doc_packing_shards",
    "dq_order_reconciliation",
    "dq_price_outliers_mad",
    "embedding_ann_pq",
    "embedding_knn_brute",
    "events_asof_last_click",
    "events_asof_next_purchase",
    "events_cohort_retention",
    "events_cumulative_unique_users",
    "events_distinct_users_sketch",
    "events_interval_join",
    "events_next_event_training",
    "events_pattern_match",
    "filter_nonempty_text",
    "filter_not_contains",
    "flagship_revenue_by_nation",
    "forward_fill_locf",
    "full_outer_reconciliation",
    "fuzzy_join_symdelete",
    "hierarchy_depth_rollup",
    "json_variant_props_stats",
    "left_join_enrich",
    "left_join_reverse_agg",
    "multi_agg_stats",
    "multimodal_frame_sample",
    "pagerank_nations",
    "positional_attach",
    "pricing_summary",
    "projection_narrow",
    "q9_profit_by_nation_year",
    "rollup_agg",
    "semi_join_membership",
    "stream_static_revenue_rollup",
    "tiered_pricing",
    "top_orders_by_price",
    "topk_per_group_agg",
    "union_all_slices",
    "url_canonicalize",
    "url_store_name",
]

# Staged mid-r13 as NEW_R14_STAGED, folded into the applied rotation
# here: synthesized BMP/TIFF/WAV/MOV blobs whose decoded stats are
# closed-form integer arithmetic on doc_id, vs a DuckDB restatement.
# Hash-green at sf0.01 under a vanilla session at registration (r13)
# and re-verified at the r14 fold.
NEW_R14 = [
    "multimodal_real_decode_roundtrip",
]


# Staged mid-r14, riding the r15 window (outside the current 50 —
# tests/test_registry_rotation.py::test_no_staged_blocks_inside_the_window):
# the ANN family's oracle-checked recall certificate (r13 VERDICT
# item 5) — per-query recall@5 of the registered LSH configuration
# against the brute-force cosine top-5, with the seeded hyperplanes
# embedded as exact literals in the DuckDB replay. Slot freed by the
# same-session `text_token_count` retirement (llm_ops.py — substance
# migrated to tests/test_llm_operators.py), keeping the registry AT
# the 180 cap. Hash-green at sf0.01 under a vanilla session at
# registration.
NEW_R15_STAGED = [
    "embedding_ann_recall",
]


def _apply_rotation() -> None:
    priority = STALE_R11 + NEW_R14
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
NEW_CURRENT = NEW_R14

__all__ = [
    "REGISTRY",
    "QuerySpec",
    "query",
    "STALE_R11",
    "NEW_R14",
    "NEW_R15_STAGED",
    "NEW_CURRENT",
]
