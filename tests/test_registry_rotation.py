"""Pin the driver-facing registry rotation (VERDICT r2 item 2).

The driver records CORRECTNESS rows for exactly the first 50
``queries()`` entries per round, so registry order IS driver coverage.
These tests make the intended round-3 rotation explicit and fail loudly
if a later registration or refactor silently reorders the window.
"""

from pythondataingestionprocess_spark.plans import (
    HOLDOVERS_R1,
    NEVER_CHECKED_R12,
    NEW_R3,
    REGISTRY,
)

DRIVER_WINDOW = 50


def test_never_checked_queries_front_loaded():
    """The 23 queries with no driver row in r1/r2 sit at positions 0-22."""
    assert list(REGISTRY)[: len(NEVER_CHECKED_R12)] == NEVER_CHECKED_R12
    assert len(NEVER_CHECKED_R12) == 23


def test_first_50_is_the_intended_rotation():
    intended = (NEVER_CHECKED_R12 + NEW_R3 + HOLDOVERS_R1)[:DRIVER_WINDOW]
    assert list(REGISTRY)[:DRIVER_WINDOW] == intended


def test_window_is_full():
    """New-query additions must keep the window at least full: dark
    queries + new queries + holdovers must fill all 50 driver slots."""
    assert len(NEVER_CHECKED_R12) + len(NEW_R3) + len(HOLDOVERS_R1) >= DRIVER_WINDOW


def test_rotation_names_unique_and_registered():
    rotation = NEVER_CHECKED_R12 + NEW_R3 + HOLDOVERS_R1
    assert len(rotation) == len(set(rotation))
    missing = [n for n in rotation if n not in REGISTRY]
    assert not missing


def test_registry_intact_after_rotation():
    """Rotation reorders — it must not drop or duplicate any query."""
    names = list(REGISTRY)
    assert len(names) == len(set(names))
    assert len(names) >= 121
