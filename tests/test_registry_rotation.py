"""Pin the driver-facing registry rotation (VERDICT r2 item 2).

The driver records CORRECTNESS rows for exactly the first 50
``queries()`` entries per round, so registry order IS driver coverage.
Union coverage after r3 is 121/121; the round-4 window refreshes the
stalest evidence (last-checked-r1 first, then new-this-round, then
last-checked-r2). These tests make the rotation explicit and fail
loudly if a later registration or refactor silently reorders the
window.
"""

from pythondataingestionprocess_spark.plans import (
    NEW_R4,
    REGISTRY,
    STALE_R1,
    STALE_R2,
)

DRIVER_WINDOW = 50


def test_stalest_queries_front_loaded():
    """The 21 queries whose only driver row is from round 1 sit first."""
    assert list(REGISTRY)[: len(STALE_R1)] == STALE_R1
    assert len(STALE_R1) == 21


def test_first_50_is_the_intended_rotation():
    intended = (STALE_R1 + NEW_R4 + STALE_R2)[:DRIVER_WINDOW]
    assert list(REGISTRY)[:DRIVER_WINDOW] == intended


def test_new_queries_ride_inside_the_window():
    """Anything registered this round must be driver-checked this
    round: new names sit immediately after the stale-r1 block, well
    inside the 50-row window."""
    names = list(REGISTRY)
    for i, n in enumerate(NEW_R4):
        assert names[len(STALE_R1) + i] == n
    assert len(STALE_R1) + len(NEW_R4) <= DRIVER_WINDOW, (
        "too many new queries for one driver window — rotate the "
        "overflow into the next round's stale set"
    )


def test_window_is_full():
    """Stale + new + fillers must fill all 50 driver slots."""
    assert len(STALE_R1) + len(NEW_R4) + len(STALE_R2) >= DRIVER_WINDOW


def test_rotation_names_unique_and_registered():
    rotation = STALE_R1 + NEW_R4 + STALE_R2
    assert len(rotation) == len(set(rotation))
    missing = [n for n in rotation if n not in REGISTRY]
    assert not missing


def test_registry_intact_after_rotation():
    """Rotation reorders — it must not drop or duplicate any query."""
    names = list(REGISTRY)
    assert len(names) == len(set(names))
    assert len(names) >= 121
