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

# --- round-12 rotation -----------------------------------------------
# Driver-check union after r11 is all-green (CORRECTNESS_r11 50/50 —
# no failure in eleven rounds). Evidence ages over the r01..r11 files
# for the 177 registered pre-r12 queries: 31 last-checked-r8, 48 r9,
# 48 r10, 50 r11; nothing unchecked. The window carries ALL 31
# r8-aged queries (they hit the MAX_EVIDENCE_AGE=4 boundary this
# round — the r11 VERDICT's standing item 4) plus the alphabetical
# first 18 of the 48 r9-aged (the 30 same-age left-overs front-load
# r13), then the one r12 registration — `text_bpe_merge_learn`, the
# BPE training-loop face (r10 VERDICT item 3 / r11 item 3) — takes
# its first official driver row. Derived by scripts/rotation_calc.py;
# the era-pinned test replays the derivation from an explicit
# r01..r11 file list.
STALE_R9 = [
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

# Registered this round, riding INSIDE the r12 window immediately
# after the stale block: the BPE merge-learning face — three full
# [pair-count → argmax → map-side fold] training iterations with a
# set-based recursive-replay DuckDB oracle (plans/llm_ops.py).
# driver_sim hash-green at sf0.01 at registration.
NEW_R12 = [
    "text_bpe_merge_learn",
]

def _apply_rotation() -> None:
    priority = STALE_R9 + NEW_R12
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
NEW_CURRENT = NEW_R12

# Staged for round 13's window (registered late-r12, driver_sim-green
# at sf0.01 at registration; sits OUTSIDE the r12 window): the batched
# BPE learner through the SAME sequential-replay oracle — a
# driver-checked proof of the parity-batch certificate on real corpus
# data (the r12 certificate fix's driver face).
NEW_R13_STAGED = [
    "text_bpe_merge_learn_batched",
    "text_bpe_tokenize_vectorized",
]

__all__ = [
    "REGISTRY",
    "QuerySpec",
    "query",
    "STALE_R9",
    "NEW_R12",
    "NEW_R13_STAGED",
    "NEW_CURRENT",
]
