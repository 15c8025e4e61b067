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

# --- round-16 rotation -----------------------------------------------
# Driver-check union after r15 is all-green (CORRECTNESS_r15 50/50;
# no failure in fifteen rounds). Evidence ages over the r01..r15
# files for the 180 registered queries: 31 last-checked-r12 (the
# front-load left-overs pinned in tests/test_registry_rotation.py
# last round), 49 r13, 49 r14, 50 r15; nothing past the
# MAX_EVIDENCE_AGE=4 bound. The window carries ALL 31 r12-aged
# queries plus the alphabetical first 18 of the 49 r13-aged (the 31
# same-age left-overs front-load r17), then the staged r16 face —
# `q2_min_cost_supplier`, the TPC-H Q2 shape staged mid-r15 — takes
# its first official driver row. Derived by scripts/rotation_calc.py
# (exit 0, no warnings); the era-pinned test replays the derivation
# from an explicit r01..r15 file list.
#
# Mid-r16 amendment: `doc_packing_lookahead` (r13-aged, in the
# derived window) RETIRED — the r15 VERDICT's named capacity lever;
# its DuckDB state-machine replay migrated to tests/test_llm_operators
# .py::test_lookahead_packing_matches_duckdb_state_machine_replay,
# and the freed slot carries the snapshot-store change-feed face
# (NEW_R17_STAGED below). The window's 49th stale slot refills with
# `equidepth_price_bands`, the alphabetical front of the r13-age
# left-overs — exactly what rotation_calc re-derives post-retirement
# (the era-pinned test asserts this).
STALE_R13 = [
    "approx_distinct_customers",
    "cdc_snapshot_latest",
    "corpus_build_pipeline",
    "corpus_curation_filter",
    "cube_agg",
    "dedup_exact_docs",
    "dedup_fingerprint",
    "dedup_simhash",
    "distinct_dims",
    "doc_chunking_overlap",
    "doc_packing_greedy",
    "dq_malformed_json_rate",
    "dq_orders_expectations",
    "dq_profile_orders",
    "dq_referential_integrity",
    "embedding_ann_ivf",
    "embedding_ann_lsh",
    "equidepth_price_bands",
    "events_bounce_rate",
    "exists_agg_discounted_orders",
    "exists_not_exists_orders",
    "feature_winsorize_robust",
    "funnel_three_step",
    "having_large_orders",
    "hierarchical_revenue_share",
    "idle_customers_segment",
    "incremental_agg_maintenance",
    "merge_event_intervals",
    "monthly_revenue_trend",
    "multimodal_binary_meta",
    "multimodal_decode_stats",
    "part_clustering_coefficient",
    "percentile_cont_prices",
    "pii_pseudonymize_vault",
    "pit_scd2_price_join",
    "q10_returned_items",
    "q13_order_count_distribution",
    "recursive_cte_subtree_rollup",
    "stmt_charge_line_grammar",
    "stratified_sample_events",
    "text_bigram_lm",
    "text_rolling_fingerprint",
    "topk_per_group",
    "trend_slope_per_nation",
    "unpivot_charge_components",
    "window_edge_values",
    "window_range_frame",
    "window_running_total",
    "zorder_layout_cells",
]

# Staged mid-r15 as NEW_R16_STAGED, folded into the applied rotation
# here: the TPC-H Q2 shape (r14 VERDICT item 4, the last uncovered
# Q-number) — correlated min-supplycost subquery over the
# lineitem-derived supply relation through the part/supplier/nation/
# region star, decorrelated to one fact shuffle + a partitioned-window
# min. Slot was freed by the r15 `topk_per_group_agg` retirement
# (substance migrated to tests/test_plans.py::
# test_topk_agg_formulation_matches_window_face), keeping the registry
# AT the 180 cap. Hash-green at sf0.01 AND sf1 at registration (r15)
# and judge-verified green at the r15 fold.
NEW_R16 = [
    "q2_min_cost_supplier",
]


# Staged mid-r16, riding the r17 window (outside the current 50 —
# tests/test_registry_rotation.py::test_no_staged_blocks_inside_the_window):
# (1) the SnapshotTableStore's first driver-facing correctness row
# (r15 VERDICT item 3) — three real commits through the snapshot log,
# an exactly-once (app_id, batch_id) replay that must be a no-op,
# then the append-grain change feed, hash-checked against a DuckDB
# reconstruction of the expected feed; slot freed by the
# `doc_packing_lookahead` retirement. (2) the TableGroup's first
# driver row — one transaction staging three tables must be exactly
# one group snapshot, a mid-staging failure must be invisible, plus
# group time travel; slot freed by the `text_bpe_merge_learn`
# retirement (its oracle was byte-identical to the batched face's —
# the driver ran one comparison twice; sequential-path evidence
# migrated to pytest). Registry stays AT the 180 cap; both faces
# hash-green at sf0.01, sf0.1 AND sf1 at registration. Because this
# block holds TWO staged names, the calculator's r17 stale budget is
# 48, one fewer than the committed window's 49 stale: the displaced
# name is `events_bounce_rate` (added mid-r16 to refill the second
# retirement; the r13-age alphabetical tail of the window). It IS
# driver-checked this round — the committed window stays full — it
# just re-enters the r17 derivation as the freshest r13-age evidence;
# the era-pinned reproduction test asserts the displacement exactly.
NEW_R17_STAGED = [
    "snapshot_change_feed",
    "txn_group_atomic_ingest",
]


def _apply_rotation() -> None:
    priority = STALE_R13 + NEW_R16
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
NEW_CURRENT = NEW_R16

__all__ = [
    "REGISTRY",
    "QuerySpec",
    "query",
    "STALE_R13",
    "NEW_R16",
    "NEW_R17_STAGED",
    "NEW_CURRENT",
]
