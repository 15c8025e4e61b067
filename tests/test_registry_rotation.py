"""Pin the driver-facing registry rotation (VERDICT r2 item 2).

The driver records CORRECTNESS rows for exactly the first 50
``queries()`` entries per round, so registry order IS driver coverage.
The round-10 window is a PURE stale refresh — the first of the series
(177/177 driver union green after r9, no staged block pending at
derivation): the 32 r6-checked left-overs plus 18 of the 48
last-checked-r7 queries (alphabetical cut; the 30 same-age left-overs
front-load r11) — exactly 50, zero NEW slots. These tests make the
rotation explicit and fail loudly if a later registration or refactor
silently reorders the window.

Era-awareness (VERDICT r5 item 2): the calculator-reproduction test
feeds scripts/rotation_calc.py an EXPLICIT CORRECTNESS_r01..r09 file
list, so the pin stays green after the driver writes later rounds'
files; a separate live run only asserts exit-status health (no failed
rows, no evidence-lag tripwire), never the window composition.

Capacity (r8 VERDICT item 3): rotation_calc hard-fails above
WINDOW * MAX_EVIDENCE_AGE - CAP_BUFFER = 180, so registering without
retiring is mechanically impossible, not just a written rule. Queries
registered DURING round 10 live in NEW_R11_STAGED — outside this
window, riding round 11's — and the reproduction test tolerates
exactly that staged block displacing the same-age tail of the stale
budget.
"""

import glob
import re
import subprocess
import sys

from pythondataingestionprocess_spark.plans import (
    NEW_R10,
    REGISTRY,
    STALE_R7,
)

DRIVER_WINDOW = 50

# The file set the committed rotation was derived from. Frozen: later
# rounds' files must NOT retroactively change what r10's window was.
R10_EVIDENCE_FILES = sorted(
    f for f in glob.glob("/root/repo/CORRECTNESS_r0*.json")
    if re.search(r"r0*([1-9])\.json$", f)
)


# The 30 r7-checked queries the alphabetical cut left out of STALE_R7
# (same evidence age); they front-load round 11's window. Recorded
# verbatim from scripts/rotation_calc.py's round-10 derivation.
R11_FRONT_LOAD_LEFT_OVERS = [
    "events_resample_interpolate",
    "events_session_window",
    "events_sessionize_manual",
    "events_sliding_window",
    "events_time_weighted_value",
    "events_tumbling_window",
    "except_keys",
    "fuzzy_name_distance",
    "grouping_sets_agg",
    "histogram_quantity",
    "intersect_keys",
    "islands_user_activity",
    "json_extract_props",
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
]

# The 18 last-checked-r7 queries INSIDE the committed window (the
# other 32 are r6-checked). A staged block registered mid-round
# shrinks the calculator's stale budget one-for-one; the displaced
# names must come from this set's alphabetical tail, nowhere else.
R7_AGE_IN_WINDOW = [
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
    "equidepth_price_bands",
    "events_bounce_rate",
    "events_concurrency_peak",
    "events_decayed_feature",
    "events_interval_join",
    "events_next_event_training",
    "events_pattern_match",
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
RETIRED_R10: list[str] = [
    "doc_packing_shard_histogram",
]


def _intended():
    return STALE_R7 + NEW_R10


def test_stalest_queries_front_loaded():
    """The 50 front-loaded queries (32 r6-checked + 18 r7-checked, the
    stalest evidence eras after r9's window) sit first."""
    assert list(REGISTRY)[: len(STALE_R7)] == STALE_R7
    assert len(STALE_R7) == 50


def test_first_50_is_the_intended_rotation():
    assert list(REGISTRY)[:DRIVER_WINDOW] == _intended()[:DRIVER_WINDOW]


def test_new_queries_ride_inside_the_window():
    """Anything first registered for this round's window must be
    driver-checked this round: those names sit immediately after the
    stale block, inside the 50-row window. (Empty in r10 — a pure
    refresh; mid-round registrations stage for r11 instead.)"""
    names = list(REGISTRY)
    for i, n in enumerate(NEW_R10):
        assert names[len(STALE_R7) + i] == n
    assert len(STALE_R7) + len(NEW_R10) <= DRIVER_WINDOW, (
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
    for n in RETIRED_R9 + RETIRED_R10:
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


def test_rotation_calculator_reproduces_r10_window_from_frozen_files():
    """scripts/rotation_calc.py must reconstruct THIS round's committed
    window composition from the r01..r09 CORRECTNESS files alone.
    Pinned to an explicit --files list so the driver writing
    CORRECTNESS_r10+ later cannot flip this assertion (the r5 pin
    broke exactly that way — VERDICT r5 item 2).

    Era note: the committed window was derived with NO staged block
    (a 50-query stale budget). A NEW_R*_STAGED block registered
    mid-round shrinks the calculator's stale budget one-for-one, so
    the derived stale set may be a strict SUBSET of the committed
    window — with the displaced names drawn exclusively from the
    alphabetical tail of the window's r7-age block (the by-(age,name)
    cut), and the staged names printed under NEW."""
    assert len(R10_EVIDENCE_FILES) == 9, R10_EVIDENCE_FILES
    proc = subprocess.run(
        [sys.executable, "/root/repo/scripts/rotation_calc.py",
         "--files", *R10_EVIDENCE_FILES],
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
    # the derived stale set never reaches outside the committed window
    assert set(names) <= set(STALE_R7), set(names) - set(STALE_R7)
    # staged registrations displace stale slots one-for-one ...
    assert len(names) == DRIVER_WINDOW - len(staged_names)
    # ... and only from the r7-age alphabetical tail of the window
    displaced = set(STALE_R7) - set(names)
    tail = sorted(R7_AGE_IN_WINDOW)[len(R7_AGE_IN_WINDOW) - len(displaced):]
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
    assert "WARNING" not in proc.stderr


def test_rotation_calculator_capacity_cap_trips():
    """r8 VERDICT item 3: shrinking the window shrinks the cap
    (window * 4 - 20); at --window 40 the cap is 140 < the live
    registry, so the calculator must exit 2 with the capacity ALERT."""
    proc = subprocess.run(
        [sys.executable, "/root/repo/scripts/rotation_calc.py",
         "--window", "40"],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 2, (proc.returncode, proc.stderr)
    assert "capacity cap" in proc.stderr
    assert "retire queries" in proc.stderr


def test_rotation_calculator_evidence_lag_tripwire(tmp_path):
    """VERDICT r5 item 8: the calculator must exit non-zero on a
    synthetic evidence hole — a query last checked more than
    MAX_EVIDENCE_AGE rounds before the newest file."""
    import json

    victim = STALE_R7[0]
    # newest round = 9, victim last green in r1 → age 8 > 4
    old = tmp_path / "CORRECTNESS_r01.json"
    new = tmp_path / "CORRECTNESS_r09.json"
    ok_row = {"rows_match": True, "schema_match": True,
              "hash_match": True, "err": None}
    old.write_text(json.dumps({victim: ok_row}))
    new.write_text(json.dumps({STALE_R7[1]: ok_row}))
    proc = subprocess.run(
        [sys.executable, "/root/repo/scripts/rotation_calc.py",
         "--files", str(old), str(new)],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 2, (proc.returncode, proc.stderr)
    assert "evidence older than" in proc.stderr
    assert victim in proc.stderr


def test_rotation_calculator_failed_row_alert(tmp_path):
    """A FAILED latest driver row must alert and exit 1 — failed rows
    are not evidence and must ride the next window again."""
    import json

    victim = STALE_R7[0]
    f = tmp_path / "CORRECTNESS_r09.json"
    f.write_text(json.dumps({
        victim: {"rows_match": True, "schema_match": True,
                 "hash_match": False, "err": None},
    }))
    proc = subprocess.run(
        [sys.executable, "/root/repo/scripts/rotation_calc.py",
         "--files", str(f)],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 1, (proc.returncode, proc.stderr)
    assert "FAILED" in proc.stderr
    assert victim in proc.stderr


def test_rotation_calculator_round_ten_ordering(tmp_path):
    """ADVICE r6: round >= 10 files must be globbed and processed in
    PARSED-round order, not lexicographic (CORRECTNESS_r010 sorts
    before r02 as a string). A green r10 row must clear an r2 failure
    for the same query — and the unpadded r10 spelling must parse."""
    import json

    victim = STALE_R7[0]
    ok_row = {"rows_match": True, "schema_match": True,
              "hash_match": True, "err": None}
    bad_row = {"rows_match": True, "schema_match": True,
               "hash_match": False, "err": None}
    f2 = tmp_path / "CORRECTNESS_r02.json"
    f10 = tmp_path / "CORRECTNESS_r10.json"
    f2.write_text(json.dumps({victim: bad_row}))
    f10.write_text(json.dumps({victim: ok_row}))
    # pass files in the WRONG (lexicographic-looking) order on purpose
    proc = subprocess.run(
        [sys.executable, "/root/repo/scripts/rotation_calc.py",
         "--files", str(f10), str(f2)],
        capture_output=True,
        text=True,
        timeout=120,
    )
    # r10 green supersedes the r2 failure → no FAILED alert (exit 0
    # would need fresh evidence for everything; only assert the
    # failure-clearing and that exit is not 1)
    assert "FAILED" not in proc.stderr, proc.stderr
    assert proc.returncode != 1, (proc.returncode, proc.stderr)


def test_rotation_calculator_rejects_bad_filename(tmp_path):
    """ADVICE r6: a --files entry that is not a CORRECTNESS_r<N>.json
    file must fail with a clear message, not an AttributeError."""
    bogus = tmp_path / "notes.json"
    bogus.write_text("{}")
    proc = subprocess.run(
        [sys.executable, "/root/repo/scripts/rotation_calc.py",
         "--files", str(bogus)],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode != 0
    assert "not a CORRECTNESS" in proc.stderr


def test_rotation_calculator_oversubscribed_window(tmp_path):
    """ADVICE r6: when staged + never exceed the window, the stale
    budget must clamp to zero (an empty STALE list), not silently
    select items from the end of the age list."""
    import json

    ok_row = {"rows_match": True, "schema_match": True,
              "hash_match": True, "err": None}
    f = tmp_path / "CORRECTNESS_r01.json"
    f.write_text(json.dumps({n: ok_row for n in STALE_R7}))
    proc = subprocess.run(
        [sys.executable, "/root/repo/scripts/rotation_calc.py",
         "--files", str(f), "--window", "5"],
        capture_output=True,
        text=True,
        timeout=120,
    )
    stale = re.search(r"STALE = \[(.*?)\]", proc.stdout, re.S).group(1)
    names = re.findall(r'"([^"]+)"', stale)
    assert names == [], names
    assert "over-subscribed" in proc.stderr
