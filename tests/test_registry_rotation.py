"""Pin the driver-facing registry rotation (VERDICT r2 item 2).

The driver records CORRECTNESS rows for exactly the first 50
``queries()`` entries per round, so registry order IS driver coverage.
The round-8 window refreshes the stalest evidence (the 9 r4-checked
left-overs plus 29 of the 50 last-checked-r5 queries — alphabetical
cut, the 21 same-age left-overs front-load r9 — then the 12 queries
staged since the round-5 continuation for this round) — exactly 50.
These tests make the rotation explicit and fail loudly if a later
registration or refactor silently reorders the window.

Era-awareness (VERDICT r5 item 2): the calculator-reproduction test
feeds scripts/rotation_calc.py an EXPLICIT CORRECTNESS_r01..r07 file
list, so the pin stays green after the driver writes later rounds'
files; a separate live run only asserts exit-status health (no failed
rows, no evidence-lag tripwire), never the window composition.
"""

import glob
import re
import subprocess
import sys

import pytest

from pythondataingestionprocess_spark.plans import (
    NEW_R8,
    NEW_R9_STAGED,
    REGISTRY,
    STALE_R5,
)

DRIVER_WINDOW = 50

# The file set the committed rotation was derived from. Frozen: later
# rounds' files must NOT retroactively change what r8's window was.
R8_EVIDENCE_FILES = sorted(
    f for f in glob.glob("/root/repo/CORRECTNESS_r0*.json")
    if re.search(r"r0*([1-7])\.json$", f)
)


# The 21 r5-checked queries the alphabetical cut left out of STALE_R5
# (same evidence age); they front-load round 9's window. Recorded
# verbatim from scripts/rotation_calc.py's round-8 derivation.
R9_FRONT_LOAD_LEFT_OVERS = [
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


def _intended():
    return STALE_R5 + NEW_R8


def test_stalest_queries_front_loaded():
    """The 38 front-loaded queries (9 r4-checked + 29 r5-checked, the
    stalest evidence eras after r7's window) sit first."""
    assert list(REGISTRY)[: len(STALE_R5)] == STALE_R5
    assert len(STALE_R5) == 38


def test_first_50_is_the_intended_rotation():
    assert list(REGISTRY)[:DRIVER_WINDOW] == _intended()[:DRIVER_WINDOW]


def test_new_queries_ride_inside_the_window():
    """Anything first registered for this round must be driver-checked
    this round: those names sit immediately after the stale block,
    inside the 50-row window."""
    names = list(REGISTRY)
    for i, n in enumerate(NEW_R8):
        assert names[len(STALE_R5) + i] == n
    assert len(STALE_R5) + len(NEW_R8) <= DRIVER_WINDOW, (
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


def test_rotation_calculator_reproduces_r8_window_from_frozen_files():
    """scripts/rotation_calc.py must reconstruct THIS round's committed
    window composition from the r01..r07 CORRECTNESS files alone.
    Pinned to an explicit --files list so the driver writing
    CORRECTNESS_r08+ later cannot flip this assertion (the r5 pin
    broke exactly that way — VERDICT r5 item 2).

    Era note: NEW_R8 is already folded into the applied rotation, so
    the calculator's next staged block is NEW_R9_STAGED (8 entries →
    a 42-query stale budget, larger than the 38-budget the committed
    window was derived under with NEW_R8 still staged at 12). The
    derived stale set must therefore be a strict SUPERSET of the
    committed STALE_R5 front-load, with the extras drawn from the
    documented 21 same-age r5-checked left-overs that front-load r9;
    and the 12 NEW_R8 queries must be recognized as riding the
    current window (pending driver row), not flagged as evidence
    holes.
    """
    assert len(R8_EVIDENCE_FILES) == 7, R8_EVIDENCE_FILES
    proc = subprocess.run(
        [sys.executable, "/root/repo/scripts/rotation_calc.py",
         "--files", *R8_EVIDENCE_FILES],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    assert "ALERT" not in proc.stderr
    stale = re.search(r"STALE = \[(.*?)\]", proc.stdout, re.S).group(1)
    names = re.findall(r'"([^"]+)"', stale)
    # everything the committed window front-loads, the calculator
    # also wants checked
    assert set(STALE_R5) <= set(names)
    # and the budget-difference extras are exactly next-round
    # front-load material (the r9 left-overs), nothing else
    extras = set(names) - set(STALE_R5)
    assert extras <= set(R9_FRONT_LOAD_LEFT_OVERS), extras
    # the 12 NEW_R8 queries are recognized as riding the current
    # window, not flagged as evidence holes
    assert "WARNING" not in proc.stderr
    assert "riding the CURRENT round's window" in proc.stdout
    for n in NEW_R8:
        assert n in proc.stdout


def test_rotation_calculator_live_run_is_healthy():
    """Era-agnostic health check over whatever CORRECTNESS files exist:
    no failed latest rows (exit 1), no evidence-lag tripwire (exit 2),
    no unstaged evidence holes. Deliberately does NOT pin the window
    composition — that's the frozen-files test's job."""
    proc = subprocess.run(
        [sys.executable, "/root/repo/scripts/rotation_calc.py"],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    assert "ALERT" not in proc.stderr
    assert "WARNING" not in proc.stderr


def test_rotation_calculator_evidence_lag_tripwire(tmp_path):
    """VERDICT r5 item 8: the calculator must exit non-zero on a
    synthetic evidence hole — a query last checked more than
    MAX_EVIDENCE_AGE rounds before the newest file."""
    import json

    victim = STALE_R5[0]
    # newest round = 9, victim last green in r1 → age 8 > 4
    old = tmp_path / "CORRECTNESS_r01.json"
    new = tmp_path / "CORRECTNESS_r09.json"
    ok_row = {"rows_match": True, "schema_match": True,
              "hash_match": True, "err": None}
    old.write_text(json.dumps({victim: ok_row}))
    new.write_text(json.dumps({STALE_R5[1]: ok_row}))
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

    victim = STALE_R5[0]
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

    victim = STALE_R5[0]
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
    f.write_text(json.dumps({n: ok_row for n in STALE_R5}))
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


@pytest.mark.parametrize(
    "block_name,block,budget",
    [
        ("NEW_R9_STAGED", NEW_R9_STAGED, 8),
    ],
)
def test_staged_blocks_sit_outside_the_window(block_name, block, budget):
    """Registrations staged for future rounds must NOT displace
    anything in the current 50-row window; each block stays within its
    planned window budget and is disjoint from every other block."""
    names = list(REGISTRY)
    for n in block:
        assert n in REGISTRY
        assert names.index(n) >= DRIVER_WINDOW, (
            f"{n} is staged ({block_name}) but sits inside the current "
            f"driver window"
        )
    assert len(block) <= budget
    others = set(_intended())
    assert not (set(block) & others)
