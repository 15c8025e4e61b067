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

# --- round-13 rotation -----------------------------------------------
# Driver-check union after r12 is all-green (CORRECTNESS_r12 50/50 —
# no failure in twelve rounds). Evidence ages over the r01..r12 files
# for the 180 registered queries: 30 last-checked-r9, 48 r10, 50 r11,
# 50 r12; nothing unchecked, nothing past the MAX_EVIDENCE_AGE=4
# bound. The window carries ALL 30 r9-aged queries (the front-load
# left-overs pinned in tests/test_registry_rotation.py last round)
# plus the alphabetical first 18 of the 48 r10-aged (the 30 same-age
# left-overs front-load r14), then the two staged r13 faces —
# `text_bpe_merge_learn_batched` (the driver-checked proof of the r12
# parity-batch certificate against the SAME sequential-replay oracle)
# and `text_bpe_tokenize_vectorized` (the rank-dict mapInPandas
# tokenizer vs the positional replay's post-merge segmentation) —
# take their first official driver rows. Derived by
# scripts/rotation_calc.py (exit 0, no warnings); the era-pinned test
# replays the derivation from an explicit r01..r12 file list.
STALE_R10 = [
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
    "doc_packing_lookahead",
    "dq_malformed_json_rate",
    "dq_orders_expectations",
    "dq_profile_orders",
    "dq_referential_integrity",
    "embedding_ann_ivf",
    "embedding_ann_lsh",
    "equidepth_price_bands",
    "events_bounce_rate",
    "events_concurrency_peak",
    "events_decayed_feature",
    "events_scd2_enrich",
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
    "text_bpe_token_count",
    "text_contamination_check",
    "text_lang_id",
    "text_pii_redact",
    "text_quality_score",
    "text_repetition_stats",
    "text_tfidf_top_terms",
    "text_token_count",
    "train_val_test_split",
    "unnest_top_words",
    "zorder_file_skipping",
]

# Staged late-r12, riding INSIDE the r13 window immediately after the
# stale block: the batched BPE learner through the SAME
# sequential-replay DuckDB oracle as `text_bpe_merge_learn` (the
# driver-checked proof of the r12 parity-batch certificate) and the
# rank-dict vectorized tokenizer application (sanctioned MapInPandas;
# checked against the positional replay's post-merge segmentation).
# Both driver_sim hash-green at sf0.01 at registration (r12) and
# re-verified at the r12 HEAD tree.
NEW_R13 = [
    "text_bpe_merge_learn_batched",
    "text_bpe_tokenize_vectorized",
]

# Staged mid-r13, riding the r14 window (outside the current 50 —
# tests/test_registry_rotation.py::test_no_staged_blocks_inside_the_window):
# the fully oracle-checked REAL media decode face — synthesized
# BMP/TIFF/WAV/MOV blobs whose decoded stats are closed-form integer
# arithmetic on doc_id (multimodal/synth.py), vs a DuckDB restatement.
# Slot freed by the same-session `histogram_quantity` retirement
# (core_relational.py — substance migrated to tests/test_plans.py),
# keeping the registry AT the 180 cap. Hash-green at sf0.01 under a
# vanilla session at registration.
NEW_R14_STAGED = [
    "multimodal_real_decode_roundtrip",
]


def _apply_rotation() -> None:
    priority = STALE_R10 + NEW_R13
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
NEW_CURRENT = NEW_R13

__all__ = [
    "REGISTRY",
    "QuerySpec",
    "query",
    "STALE_R10",
    "NEW_R13",
    "NEW_R14_STAGED",
    "NEW_CURRENT",
]
