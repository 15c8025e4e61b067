"""Pin the driver-facing registry rotation (VERDICT r2 item 2).

The driver records CORRECTNESS rows for exactly the first 50
``queries()`` entries per round, so registry order IS driver coverage.
Union coverage after r4 is 136/136; the round-5 window refreshes the
stalest evidence (the 38 last-checked-r2 queries first, then the 10
new-r5 registrations, then the 2 determinism-fix oracle re-basings) —
exactly 50. These tests make the rotation explicit and fail loudly if
a later registration or refactor silently reorders the window.
"""

from pythondataingestionprocess_spark.plans import (
    NEW_R5,
    NEW_R6_STAGED,
    NEW_R7_STAGED,
    NEW_R8_STAGED,
    NEW_R9_STAGED,
    PROMOTED_R5,
    REGISTRY,
    STALE_R2,
)

DRIVER_WINDOW = 50


def _intended():
    return STALE_R2 + NEW_R5 + PROMOTED_R5


def test_stalest_queries_front_loaded():
    """The 38 queries whose latest driver row is from round 2 sit
    first — no query's evidence may age past two rounds."""
    assert list(REGISTRY)[: len(STALE_R2)] == STALE_R2
    assert len(STALE_R2) == 38


def test_first_50_is_the_intended_rotation():
    assert list(REGISTRY)[:DRIVER_WINDOW] == _intended()[:DRIVER_WINDOW]


def test_new_and_promoted_ride_inside_the_window():
    """Anything registered or oracle-re-based this round must be
    driver-checked this round: those names sit immediately after the
    stale block, inside the 50-row window."""
    names = list(REGISTRY)
    block = NEW_R5 + PROMOTED_R5
    for i, n in enumerate(block):
        assert names[len(STALE_R2) + i] == n
    assert len(STALE_R2) + len(block) <= DRIVER_WINDOW, (
        "too many new/promoted queries for one driver window — rotate "
        "the overflow into the next round's stale set"
    )


def test_window_is_full():
    """Stale + new + promoted must fill all 50 driver slots (a slack
    window would waste driver evidence)."""
    assert len(_intended()) == DRIVER_WINDOW


def test_rotation_names_unique_and_registered():
    rotation = _intended()
    assert len(rotation) == len(set(rotation))
    missing = [n for n in rotation if n not in REGISTRY]
    assert not missing


def test_r6_staged_queries_sit_outside_the_window():
    """Queries registered late in r5 for NEXT round's two free slots
    must NOT displace anything in the current 50-row window — they
    get their driver evidence in r6 (window = 48 r3-stale + these 2)."""
    names = list(REGISTRY)
    for n in NEW_R6_STAGED:
        assert n in REGISTRY
        assert names.index(n) >= DRIVER_WINDOW, (
            f"{n} is staged for r6 but sits inside the r5 driver window"
        )
    assert len(NEW_R6_STAGED) <= 2, (
        "r6 has exactly two free window slots (48 r3-checked stale "
        "queries re-ride); extra registrations must wait for r7"
    )


def test_registry_intact_after_rotation():
    """Rotation reorders — it must not drop or duplicate any query."""
    names = list(REGISTRY)
    assert len(names) == len(set(names))
    assert len(names) >= 148


def test_rotation_calculator_reproduces_current_window():
    """scripts/rotation_calc.py is round 6's first tool — it must
    reconstruct the CURRENT round's window composition from the
    committed CORRECTNESS files alone (38 r2-stale + the 10 new-r5
    registrations it sees as evidence-less + the 2 staged), with no
    failed-row alerts (all committed evidence is green; rows-only
    "no_oracle" rows must not be misread as failures)."""
    import subprocess
    import sys as _sys

    proc = subprocess.run(
        [_sys.executable, "/root/repo/scripts/rotation_calc.py"],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    assert "ALERT" not in proc.stderr
    assert "# window 50 = 38 stale + 10 unstaged-never + 2 staged" in proc.stdout
    # the stale block it derives must equal the committed r5 front-load
    import re as _re

    stale = _re.search(r"STALE = \[(.*?)\]", proc.stdout, _re.S).group(1)
    names = _re.findall(r'"([^"]+)"', stale)
    assert sorted(names) == sorted(STALE_R2)


def test_r7_staged_queries_sit_outside_the_window():
    """Late-r5 registrations beyond r6's two spent slots are staged
    for r7: outside the current window, excluded from the rotation
    calculator's evidence-hole warning, and each backed by a passing
    driver_sim oracle check (or proven cross-engine test) at
    registration time."""
    names = list(REGISTRY)
    for n in NEW_R7_STAGED:
        assert n in REGISTRY
        assert names.index(n) >= DRIVER_WINDOW, (
            f"{n} is staged for r7 but sits inside the r5 driver window"
        )
    overlap = set(NEW_R7_STAGED) & (set(NEW_R6_STAGED) | set(_intended()))
    assert not overlap


def test_r8_staged_queries_sit_outside_the_window():
    """Continuation-session registrations beyond r7's full window are
    staged for r8: outside the current window, known to the rotation
    calculator as deferred (not evidence holes), disjoint from every
    earlier block, and each oracle-verified by driver_sim at
    registration time."""
    names = list(REGISTRY)
    for n in NEW_R8_STAGED:
        assert n in REGISTRY
        assert names.index(n) >= DRIVER_WINDOW, (
            f"{n} is staged for r8 but sits inside the r5 driver window"
        )
    overlap = set(NEW_R8_STAGED) & (
        set(NEW_R7_STAGED) | set(NEW_R6_STAGED) | set(_intended())
    )
    assert not overlap
    # r8 window math: 11 r4-checked left-overs + these must leave room
    # for refreshing r5-checked evidence.
    assert len(NEW_R8_STAGED) <= 12


def test_r9_staged_queries_sit_outside_the_window():
    """Second-continuation registrations beyond r8's budget are staged
    for r9: outside the current window, known to the rotation
    calculator as deferred, disjoint from every earlier block, and
    each oracle-verified by driver_sim at registration time."""
    names = list(REGISTRY)
    for n in NEW_R9_STAGED:
        assert n in REGISTRY
        assert names.index(n) >= DRIVER_WINDOW, (
            f"{n} is staged for r9 but sits inside the r5 driver window"
        )
    overlap = set(NEW_R9_STAGED) & (
        set(NEW_R8_STAGED)
        | set(NEW_R7_STAGED)
        | set(NEW_R6_STAGED)
        | set(_intended())
    )
    assert not overlap
