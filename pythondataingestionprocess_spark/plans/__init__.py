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

# --- round-9 rotation ------------------------------------------------
# Driver-check union after r8 is 171/182 green (evidence ages from
# CORRECTNESS_r0{1..8}.json: 21 last-checked-r5, 50 r6, 50 r7, 50 r8;
# the 8 NEW_R9_STAGED queries + the 3 registered late in r8 carry
# driver_sim evidence only). The window refreshes the STALEST
# evidence: the 21 r5-checked left-overs plus 18 of the 50
# last-checked-in-r6 queries (alphabetical cut; the 32 same-age
# left-overs front-load r10), then the 11 never-driver-checked
# queries (3 late-r8 registrations + the 8 staged since the round-5
# continuation) — exactly 50. Derived by scripts/rotation_calc.py
# over the committed CORRECTNESS files (the era-pinned test replays
# exactly that derivation from an explicit r01..r08 file list).
STALE_R6 = [
    "anti_join_dedup",
    "broadcast_dim_join",
    "clean_excel_serial_date",
    "clean_safe_float",
    "clean_signed_money",
    "clean_stmt_date_roundtrip",
    "corpus_mix_resample",
    "dedup_embedding_cosine",
    "dedup_groups_cc",
    "dedup_incremental_minhash",
    "dedup_keep_one",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "deterministic_sample_per_source",
    "distinct_dims",
    "doc_packing_shard_histogram",
    "dq_malformed_json_rate",
    "dq_profile_orders",
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

# Queries riding the r9 window's 11 free slots: the 3 registered at
# the very end of round 8 WITHOUT staging bookkeeping (the r8 judge's
# headline finding — dedup_cosine_incremental, events_scd2_enrich,
# zorder_file_skipping; each was driver_sim-green at registration and
# re-verified 11/11 by the r8 judge's independent sim) followed by
# the 8 long-staged NEW_R9_STAGED queries (registered in the third r5
# continuation session, oracle-verified at sf0.01 at registration and
# re-verified by the r8 judge's sim).
NEW_R9: list[str] = [
    "dedup_cosine_incremental",
    "events_scd2_enrich",
    "zorder_file_skipping",
    "corpus_block_dedup",
    "doc_chunking_overlap",
    "inverted_index_postings",
    "train_val_test_split",
    "corpus_weighted_sample",
    "inverted_index_incremental",
    "bm25_retrieval_topk",
    "corpus_temperature_mix",
]

def _apply_rotation() -> None:
    priority = STALE_R6 + NEW_R9
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
NEW_CURRENT = NEW_R9

__all__ = [
    "REGISTRY",
    "QuerySpec",
    "query",
    "STALE_R6",
    "NEW_R9",
    "NEW_CURRENT",
]
