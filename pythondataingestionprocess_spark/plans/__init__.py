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

# --- round-17 rotation -----------------------------------------------
# Driver-check union after r16 is all-green (CORRECTNESS_r16 50/50;
# sixteen failure-free rounds). Evidence ages over the r01..r16 files
# for the 180 registered queries: 29 last-checked-r13 (the front-load
# left-overs pinned in tests/test_registry_rotation.py last round),
# 49 r14, 50 r15, 50 r16; nothing past the MAX_EVIDENCE_AGE=4 bound.
# rotation_calc (exit 0, no warnings; stale budget 48 with the 2-name
# r16-staged block) derives: ALL 29 r13-aged queries + the
# alphabetical first 19 of the 49 r14-aged.
#
# Committed amendment (r16 VERDICT item 1 / NEXT.md): the three
# oracle-basis-changed faces whose contract changed AFTER their last
# driver row are front-loaded in place of the derived r14-age
# alphabetical tail —
#   displaced (r14-aged; they front-load r18 with the other 30
#   same-age left-overs): `events_asof_next_purchase`,
#   `events_cohort_retention`, `events_cumulative_unique_users`;
#   promoted: `fuzzy_join_symdelete` (capped-pipeline replay oracle,
#   r16), `events_distinct_users_sketch` (rows-only -> 5% error-bound
#   certificate, r16) — both r14-aged anyway — and
#   `dedup_embedding_cosine` (face bits_per_table 12->24 mid-r16;
#   last driver row r15 predates it).
# `embedding_ann_pq` (rows-only -> full ADC replay, r16) is already
# inside the derived window by age. The era-pinned test replays the
# pure-age derivation from an explicit r01..r16 file list and asserts
# exactly this three-for-three swap.
STALE_R14 = [
    "argmax_customer_balance",
    "bilateral_trade_volume",
    "conditional_agg_priority",
    "copurchase_triangles",
    "corpus_dsir_importance",
    "corr_moments_stats",
    "dedup_containment",
    "dedup_embedding_cosine",
    "dedup_incremental_components",
    "dedup_semantic_semdedup",
    "disjunctive_predicate_revenue",
    "doc_packing_shards",
    "dq_order_reconciliation",
    "dq_price_outliers_mad",
    "embedding_ann_pq",
    "embedding_knn_brute",
    "events_asof_last_click",
    "events_concurrency_peak",
    "events_decayed_feature",
    "events_distinct_users_sketch",
    "events_scd2_enrich",
    "fuzzy_join_symdelete",
    "inverted_index_incremental",
    "inverted_index_postings",
    "q14_promo_revenue",
    "q18_large_volume_customers",
    "q21_waiting_suppliers",
    "q4_priority_order_checks",
    "q5_local_supplier_volume",
    "q8_market_share",
    "qualify_above_avg_suppliers",
    "range_join_quantity_bands",
    "revenue_share_top_customers",
    "scalar_subquery_small_qty",
    "skewed_join_salted",
    "string_agg_nations",
    "text_bpe_merge_learn_batched",
    "text_bpe_token_count",
    "text_bpe_tokenize_vectorized",
    "text_contamination_check",
    "text_lang_id",
    "text_pii_redact",
    "text_quality_score",
    "text_repetition_stats",
    "text_tfidf_top_terms",
    "train_val_test_split",
    "unnest_top_words",
    "zorder_file_skipping",
]

# Staged mid-r16 (as NEW_R17_STAGED), folded into the applied rotation
# here: the two lakehouse faces take their first official driver rows.
# (1) `snapshot_change_feed` — three real commits through the
# SnapshotTableStore log, an exactly-once (app_id, batch_id) replay
# that must be a no-op, then the append-grain change feed vs a DuckDB
# reconstruction (slot freed by the r16 `doc_packing_lookahead`
# retirement). (2) `txn_group_atomic_ingest` — one TableGroup
# transaction staging three tables must be exactly one group
# snapshot, a mid-staging failure must be invisible, plus group time
# travel (slot freed by the r16 `text_bpe_merge_learn` retirement).
# Both hash-green at sf0.01/sf0.1/sf1 at registration (r16) and
# judge-verified green in the r16 session. Registry stays AT the 180
# cap.
NEW_R17 = [
    "snapshot_change_feed",
    "txn_group_atomic_ingest",
]


def _apply_rotation() -> None:
    priority = STALE_R14 + NEW_R17
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
NEW_CURRENT = NEW_R17

__all__ = [
    "REGISTRY",
    "QuerySpec",
    "query",
    "STALE_R14",
    "NEW_R17",
    "NEW_CURRENT",
]
