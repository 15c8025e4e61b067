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

# --- round-10 rotation -----------------------------------------------
# Driver-check union after r9 is 177/177 green (evidence ages from
# CORRECTNESS_r0{1..9}.json: 32 last-checked-r6, 48 r7, 47 r8, 50 r9;
# nothing is unchecked). No staged block was pending at derivation
# time, so the window is a PURE stale refresh: the 32 r6-checked
# left-overs plus 18 of the 48 last-checked-in-r7 queries
# (alphabetical cut; the 30 same-age left-overs front-load r11) —
# exactly 50. Derived by scripts/rotation_calc.py over the committed
# CORRECTNESS files (the era-pinned test replays exactly that
# derivation from an explicit r01..r09 file list).
STALE_R7 = [
    "approx_distinct_customers",
    "cdc_snapshot_latest",
    "corpus_build_pipeline",
    "corpus_curation_filter",
    "cube_agg",
    "dedup_exact_docs",
    "dedup_fingerprint",
    "dedup_simhash",
    "doc_packing_greedy",
    "doc_packing_lookahead",
    "dq_orders_expectations",
    "dq_referential_integrity",
    "embedding_ann_ivf",
    "embedding_ann_lsh",
    "equidepth_price_bands",
    "events_bounce_rate",
    "events_concurrency_peak",
    "events_decayed_feature",
    "events_distinct_users_sketch",
    "events_interval_join",
    "events_next_event_training",
    "events_pattern_match",
    "filter_nonempty_text",
    "filter_not_contains",
    "first_match_pick",
    "flagship_revenue_by_nation",
    "forward_fill_locf",
    "full_outer_reconciliation",
    "fuzzy_join_symdelete",
    "hierarchy_depth_rollup",
    "json_variant_props_stats",
    "left_join_enrich",
    "left_join_reverse_agg",
    "margin_defaults",
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

# No queries were first registered for round 10's window: the r9 fold
# consumed the last staged block and NEW_R10 staging was empty at
# rotation time, so every slot refreshes stale evidence. Queries
# registered DURING round 10 go to NEW_R11_STAGED (outside this
# window, riding round 11's) per the capacity rule.
NEW_R10: list[str] = []

# Registered DURING round 10 against the r10 retirement headroom
# (VERDICT r9 items 2-3): driver_sim-green at sf0.01 at registration,
# outside the r10 window, riding round 11's. The r9 depth finally
# gets driver-facing oracle faces: the CCNet boilerplate screen and
# the incremental components fold (both full DuckDB oracles), plus
# the PQ/ADC search path (rows-only by the ANN contract, recall
# pinned in tests/test_pq.py). text_repeated_span_dedup (full oracle,
# pre-validated corpus-wide in tests/test_spandedup.py before
# registration) took the last free slot; dedup_semantic_semdedup
# (SemDeDup, full oracle) rides the slot freed by retiring the
# clean_excel_serial_date micro-face; corpus_dsir_importance (DSIR,
# full oracle) rides the slot freed by retiring embedding_norms
# (folds subsumed by embedding_knn_brute) — registry 180/180.
NEW_R11_STAGED = [
    "text_strip_boilerplate",
    "dedup_incremental_components",
    "embedding_ann_pq",
    "text_repeated_span_dedup",
    "dedup_semantic_semdedup",
    "corpus_dsir_importance",
]

def _apply_rotation() -> None:
    priority = STALE_R7 + NEW_R10
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
NEW_CURRENT = NEW_R10

__all__ = [
    "REGISTRY",
    "QuerySpec",
    "query",
    "STALE_R7",
    "NEW_R10",
    "NEW_CURRENT",
]
