"""Pin the driver-facing registry rotation (VERDICT r2 item 2).

The driver records CORRECTNESS rows for exactly the first 50
``queries()`` entries per round, so registry order IS driver coverage.
The round-11 window = 44 stale + 6 new: ALL 29 last-checked-r7
queries (they reach the MAX_EVIDENCE_AGE=4 boundary this round — the
r10 VERDICT's standing item 1) plus the alphabetical first 15 of the
46 last-checked-r8 (the 31 same-age left-overs front-load r12), then
the six queries folded from NEW_R11_STAGED take their first official
driver rows. Derived AFTER the r11 retirements (capacity lever:
``margin_defaults``, ``first_match_pick``, ``json_extract_props`` —
substance pins documented at their old registration sites). These
tests make the rotation explicit and fail loudly if a later
registration or refactor silently reorders the window.

Era-awareness (VERDICT r5 item 2): the calculator-reproduction test
feeds scripts/rotation_calc.py an EXPLICIT CORRECTNESS_r01..r10 file
list, so the pin stays green after the driver writes later rounds'
files; a separate live run only asserts exit-status health (no failed
rows, no evidence-lag tripwire), never the window composition.

Capacity (r8 VERDICT item 3): rotation_calc hard-fails above
WINDOW * MAX_EVIDENCE_AGE - CAP_BUFFER = 180, so registering without
retiring is mechanically impossible, not just a written rule. The r11
retirements leave 3 free slots; queries registered DURING round 11
live in a NEW_R12_STAGED block — outside this window, riding round
12's — and the reproduction test tolerates that staged block
re-growing the calculator's stale budget (the committed derivation
ran with the six-name NEW_R11_STAGED block pending; once folded, the
calculator sees only whatever NEW block is staged next).
"""

import glob
import re
import subprocess
import sys

from pythondataingestionprocess_spark.plans import (
    NEW_R11,
    REGISTRY,
    STALE_R8,
)

DRIVER_WINDOW = 50

# The file set the committed rotation was derived from (rounds 1..10).
# Frozen: later rounds' files must NOT retroactively change what r11's
# window was.
R11_EVIDENCE_FILES = sorted(
    (
        f
        for f in glob.glob("/root/repo/CORRECTNESS_r*.json")
        if int(re.search(r"CORRECTNESS_r0*(\d+)\.json$", f).group(1)) <= 10
    ),
    key=lambda f: int(re.search(r"CORRECTNESS_r0*(\d+)\.json$", f).group(1)),
)


# The 31 r8-checked queries the alphabetical cut left out of STALE_R8
# (same evidence age); they front-load round 12's window. Recorded
# verbatim from scripts/rotation_calc.py's round-11 derivation.
R12_FRONT_LOAD_LEFT_OVERS = [
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

# The 15 last-checked-r8 queries INSIDE the committed window (the
# other 29 are r7-checked). If a NEW_R12_STAGED block smaller than six
# names is pending, the calculator's stale budget grows back toward 50
# and the derived stale set EXTENDS the committed window with the
# alphabetical front of the r8-age left-overs; if it ever grows past
# six names, the budget shrinks below 44 and the displaced names must
# come from this set's alphabetical tail.
R8_AGE_IN_WINDOW = [
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
]

# Retired across rounds: these names must never silently reappear in
# the registry.
RETIRED_R9 = [
    "funnel_view_to_purchase",
    "window_lag_lead",
    "window_rank_dense",
    "intersect_all_slices",
    "except_all_slices",
]
RETIRED_R10 = [
    "doc_packing_shard_histogram",
    "clean_excel_serial_date",
    "embedding_norms",
]
RETIRED_R11 = [
    "margin_defaults",
    "first_match_pick",
    "json_extract_props",
]


def _intended():
    return STALE_R8 + NEW_R11


def test_stalest_queries_front_loaded():
    """The 44 stale slots (all 29 r7-checked + 15 r8-checked, the
    stalest evidence eras after r10's window) sit first."""
    assert list(REGISTRY)[: len(STALE_R8)] == STALE_R8
    assert len(STALE_R8) == 44


def test_first_50_is_the_intended_rotation():
    assert list(REGISTRY)[:DRIVER_WINDOW] == _intended()[:DRIVER_WINDOW]


def test_new_queries_ride_inside_the_window():
    """Anything first registered for this round's window must be
    driver-checked this round: those names sit immediately after the
    stale block, inside the 50-row window (the folded NEW_R11_STAGED
    block — span dedup, SemDeDup, DSIR, boilerplate, incremental CC,
    PQ)."""
    names = list(REGISTRY)
    for i, n in enumerate(NEW_R11):
        assert names[len(STALE_R8) + i] == n
    assert len(STALE_R8) + len(NEW_R11) <= DRIVER_WINDOW, (
        "too many new queries for one driver window — rotate the "
        "overflow into the next round's stale set"
    )


def test_window_is_full():
    """Stale + new must fill all 50 driver slots (a slack window would
    waste driver evidence)."""
    assert len(_intended()) == DRIVER_WINDOW


def test_rotation_names_unique_and_registered():
    rotation = _intended()
    assert len(rotation) == len(set(rotation))
    missing = [n for n in rotation if n not in REGISTRY]
    assert not missing


def test_registry_intact_after_rotation():
    """Rotation reorders — it must not drop or duplicate any query."""
    names = list(REGISTRY)
    assert len(names) == len(set(names))
    assert len(names) >= 148


def test_retired_queries_stay_retired():
    for n in RETIRED_R9 + RETIRED_R10 + RETIRED_R11:
        assert n not in REGISTRY, f"{n} was retired"


def test_registry_within_capacity_cap():
    """ceil(N / 50) driver rounds to refresh everything must stay
    comfortably under MAX_EVIDENCE_AGE=4; rotation_calc enforces
    N <= 50*4 - 20 = 180 (exit 2 above it). Mirror the bound here so
    a plain pytest run catches a breach without invoking the script."""
    assert len(REGISTRY) <= 180, (
        f"registry at {len(REGISTRY)} exceeds the capacity cap — "
        "retire queries before registering more"
    )


def test_no_staged_blocks_inside_the_window():
    """Any NEW_R*_STAGED block on the package must sit entirely outside
    the current 50-row window and stay disjoint from it."""
    import pythondataingestionprocess_spark.plans as plans

    names = list(REGISTRY)
    window = set(_intended())
    for attr in dir(plans):
        if not re.fullmatch(r"NEW_R(\d+)_STAGED", attr):
            continue
        for n in getattr(plans, attr):
            assert n in REGISTRY
            assert names.index(n) >= DRIVER_WINDOW, (
                f"{n} is staged ({attr}) but sits inside the current "
                f"driver window"
            )
            assert n not in window


def test_rotation_calculator_reproduces_r11_window_from_frozen_files():
    """scripts/rotation_calc.py must reconstruct THIS round's committed
    window composition from the r01..r10 CORRECTNESS files alone.
    Pinned to an explicit --files list so the driver writing
    CORRECTNESS_r11+ later cannot flip this assertion (the r5 pin
    broke exactly that way — VERDICT r5 item 2).

    Era note: the committed window was derived with the SIX-name
    NEW_R11_STAGED block pending (stale budget 44). After the fold,
    the calculator's stale budget is 50 minus whatever NEW_R12_STAGED
    holds at runtime (k names, k likely < 6), so the derived stale set
    EXTENDS the committed 44 with the (6 - k)-name alphabetical prefix
    of the r8-age front-load left-overs; were a staged block ever to
    exceed six names, the budget would shrink below 44 and the
    displaced names must come from the committed window's r8-age
    alphabetical tail. Both directions are asserted exactly."""
    assert len(R11_EVIDENCE_FILES) == 10, R11_EVIDENCE_FILES
    proc = subprocess.run(
        [sys.executable, "/root/repo/scripts/rotation_calc.py",
         "--files", *R11_EVIDENCE_FILES],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    assert "ALERT" not in proc.stderr
    assert "WARNING" not in proc.stderr
    stale = re.search(r"STALE = \[(.*?)\]", proc.stdout, re.S).group(1)
    names = re.findall(r'"([^"]+)"', stale)
    new = re.search(r"NEW = \[(.*?)\]", proc.stdout, re.S).group(1)
    staged_names = re.findall(r'"([^"]+)"', new)
    # the staged block and the stale budget trade one-for-one
    assert len(names) == DRIVER_WINDOW - len(staged_names)
    committed = set(STALE_R8)
    derived = set(names)
    if len(names) >= len(STALE_R8):
        # smaller-than-six staged block: committed window plus the
        # alphabetical front of the r8-age left-overs
        assert committed <= derived, committed - derived
        extra = derived - committed
        front = R12_FRONT_LOAD_LEFT_OVERS[: len(extra)]
        assert extra == set(front), (extra, front)
    else:
        # larger-than-six staged block: displaced names come only
        # from the committed window's r8-age alphabetical tail
        assert derived <= committed, derived - committed
        displaced = committed - derived
        tail = sorted(R8_AGE_IN_WINDOW)[len(R8_AGE_IN_WINDOW) - len(displaced):]
        assert displaced == set(tail), (displaced, tail)


def test_rotation_calculator_live_run_is_healthy():
    """Era-agnostic health check over whatever CORRECTNESS files exist:
    no failed latest rows (exit 1), no evidence-lag tripwire or
    capacity breach (exit 2), no unstaged evidence holes. Deliberately
    does NOT pin the window composition — that's the frozen-files
    test's job."""
    proc = subprocess.run(
        [sys.executable, "/root/repo/scripts/rotation_calc.py"],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    assert "ALERT" not in proc.stderr
