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

# --- round-15 rotation -----------------------------------------------
# Driver-check union after r14 is all-green (CORRECTNESS_r14 50/50 —
# 48 hash + 2 rows-only per contract; no failure in fourteen rounds).
# Evidence ages over the r01..r14 files for the 180 registered
# queries: 30 last-checked-r11, 50 r12, 49 r13, 50 r14 (embedding_
# ann_recall, staged mid-r14, has no driver evidence yet by design);
# nothing past the MAX_EVIDENCE_AGE=4 bound. The window carries ALL
# 30 r11-aged queries (the front-load left-overs pinned in
# tests/test_registry_rotation.py last round) plus the alphabetical
# first 19 of the 50 r12-aged (the 31 same-age left-overs front-load
# r16), then the staged r15 face — `embedding_ann_recall`, the ANN
# family's oracle-checked recall certificate (per-query recall@5 of
# the registered LSH configuration vs brute-force cosine top-5, with
# the seeded hyperplanes embedded as exact literals in the DuckDB
# replay) — takes its first official driver row. Derived by
# scripts/rotation_calc.py (exit 0, no warnings); the era-pinned test
# replays the derivation from an explicit r01..r14 file list.
STALE_R12 = [
    "anti_join_dedup",
    "bm25_retrieval_topk",
    "broadcast_dim_join",
    "clean_safe_float",
    "clean_signed_money",
    "clean_stmt_date_roundtrip",
    "corpus_block_dedup",
    "corpus_mix_resample",
    "corpus_temperature_mix",
    "corpus_weighted_sample",
    "dedup_cosine_incremental",
    "dedup_embedding_cosine",
    "dedup_groups_cc",
    "dedup_incremental_minhash",
    "dedup_keep_one",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "deterministic_sample_per_source",
    "events_funnel_watermark",
    "events_resample_interpolate",
    "events_session_window",
    "events_sessionize_manual",
    "events_sliding_window",
    "events_time_weighted_value",
    "events_tumbling_window",
    "except_keys",
    "fuzzy_name_distance",
    "grouping_sets_agg",
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
    "text_repeated_span_dedup",
    "text_strip_boilerplate",
]

# Staged mid-r14 as NEW_R15_STAGED, folded into the applied rotation
# here: the ANN recall certificate (r13 VERDICT item 5). Slot was
# freed by the r14 `text_token_count` retirement (substance migrated
# to tests/test_llm_operators.py), keeping the registry AT the 180
# cap. Hash-green at sf0.01 under a vanilla session at registration
# (r14) and re-verified at the r15 fold.
NEW_R15 = [
    "embedding_ann_recall",
]


# Staged mid-r15, riding the r16 window (outside the current 50 —
# tests/test_registry_rotation.py::test_no_staged_blocks_inside_the_window):
# the TPC-H Q2 shape (r14 VERDICT item 4, the last uncovered
# Q-number) — correlated min-supplycost subquery over the
# lineitem-derived supply relation through the part/supplier/nation/
# region star. Slot freed by the same-session `topk_per_group_agg`
# retirement (plans/windows.py — substance migrated to
# tests/test_plans.py::test_topk_agg_formulation_matches_window_face),
# keeping the registry AT the 180 cap. Hash-green at sf0.01 under a
# vanilla session at registration.
NEW_R16_STAGED = [
    "q2_min_cost_supplier",
]


def _apply_rotation() -> None:
    priority = STALE_R12 + NEW_R15
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
NEW_CURRENT = NEW_R15

__all__ = [
    "REGISTRY",
    "QuerySpec",
    "query",
    "STALE_R12",
    "NEW_R15",
    "NEW_R16_STAGED",
    "NEW_CURRENT",
]
