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

# --- round-18 rotation -----------------------------------------------
# Driver-check union after r17 is all-green (CORRECTNESS_r17 50/50;
# seventeen failure-free rounds). Evidence ages over the r01..r17
# files for the 180 registered queries: 31 last-checked-r14, 49 r15,
# 50 r16, 50 r17; nothing past the MAX_EVIDENCE_AGE=4 bound.
# rotation_calc (exit 0, no warnings; stale budget 50 — no staged
# block this round) derives: ALL 31 r14-aged queries + the
# alphabetical first 19 of the 49 r15-aged.
#
# Committed amendment (r17 VERDICT items 1/4/5): the five faces whose
# IMPLEMENTATION changed after their last driver row are front-loaded
# in place of five untouched r15-aged names from the derived
# alphabetical front —
#   displaced (r15-aged, untouched this round or last; they
#   front-load r19 with the other 29 same-age left-overs):
#   `corpus_mix_resample`, `corpus_temperature_mix`,
#   `corpus_weighted_sample`, `deterministic_sample_per_source`,
#   `events_funnel_watermark`;
#   promoted: `events_resample_interpolate` (r15-aged anyway — the
#   r17 lead+explode rewrite plus the r18 lone-off-hour backfill fix
#   both postdate its r15 row), `part_clustering_coefficient` and
#   `copurchase_triangles` (r17 shared-chain + r18 one-job
#   rollup/shuffle-hash wedge), `feature_winsorize_robust` and
#   `percentile_cont_prices` (r17 stats-memo path; r16 rows predate
#   it).
# The r18-touched dedup family (`dedup_minhash_lsh`,
# `dedup_incremental_minhash`, `dedup_keep_one`, `dedup_ngram_jaccard`
# — the shared shingle-table/corpus-index memos) is r15-aged and
# already inside the derived alphabetical front, as is
# `embedding_ann_recall` (r18 UDF-dedup). The era-pinned test replays
# the pure-age derivation from an explicit r01..r17 file list and
# asserts exactly this five-for-five swap.

STALE_R15 = [
    "anti_join_dedup",
    "bm25_retrieval_topk",
    "broadcast_dim_join",
    "clean_safe_float",
    "clean_signed_money",
    "clean_stmt_date_roundtrip",
    "copurchase_triangles",
    "corpus_block_dedup",
    "dedup_cosine_incremental",
    "dedup_groups_cc",
    "dedup_incremental_minhash",
    "dedup_keep_one",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "embedding_ann_recall",
    "events_asof_next_purchase",
    "events_cohort_retention",
    "events_cumulative_unique_users",
    "events_interval_join",
    "events_next_event_training",
    "events_pattern_match",
    "events_resample_interpolate",
    "feature_winsorize_robust",
    "filter_nonempty_text",
    "filter_not_contains",
    "flagship_revenue_by_nation",
    "forward_fill_locf",
    "full_outer_reconciliation",
    "hierarchy_depth_rollup",
    "json_variant_props_stats",
    "left_join_enrich",
    "left_join_reverse_agg",
    "multi_agg_stats",
    "multimodal_frame_sample",
    "multimodal_real_decode_roundtrip",
    "pagerank_nations",
    "part_clustering_coefficient",
    "percentile_cont_prices",
    "positional_attach",
    "pricing_summary",
    "projection_narrow",
    "q9_profit_by_nation_year",
    "rollup_agg",
    "semi_join_membership",
    "stream_static_revenue_rollup",
    "tiered_pricing",
    "top_orders_by_price",
    "union_all_slices",
    "url_canonicalize",
    "url_store_name",
]

# No staged block this round (registry at the 180 cap, no new
# registrations in an optimization round).
NEW_R18: list[str] = []


def _apply_rotation() -> None:
    priority = STALE_R15 + NEW_R18
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
NEW_CURRENT = NEW_R18

__all__ = [
    "REGISTRY",
    "QuerySpec",
    "query",
    "STALE_R15",
    "NEW_R18",
    "NEW_CURRENT",
]
