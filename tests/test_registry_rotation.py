"""Pin the driver-facing registry rotation (VERDICT r2 item 2).

The driver records CORRECTNESS rows for exactly the first 50
``queries()`` entries per round, so registry order IS driver coverage.
Union coverage after r3 is 121/121; the round-4 window refreshes the
stalest evidence (last-checked-r1 first, then new-this-round, then
newly-PROMOTED oracles, then last-checked-r2 fillers). These tests
make the rotation explicit and fail loudly if a later registration or
refactor silently reorders the window.
"""

from pythondataingestionprocess_spark.plans import (
    NEW_R4,
    PROMOTED_R4,
    REGISTRY,
    STALE_R1,
    STALE_R2,
)

DRIVER_WINDOW = 50


def _intended():
    return (
        STALE_R1
        + NEW_R4
        + PROMOTED_R4
        + [n for n in STALE_R2 if n not in PROMOTED_R4]
    )


def test_stalest_queries_front_loaded():
    """The 21 queries whose only driver row is from round 1 sit first."""
    assert list(REGISTRY)[: len(STALE_R1)] == STALE_R1
    assert len(STALE_R1) == 21


def test_first_50_is_the_intended_rotation():
    assert list(REGISTRY)[:DRIVER_WINDOW] == _intended()[:DRIVER_WINDOW]


def test_new_and_promoted_ride_inside_the_window():
    """Anything registered or oracle-promoted this round must be
    driver-checked this round: those names sit immediately after the
    stale-r1 block, inside the 50-row window."""
    names = list(REGISTRY)
    block = NEW_R4 + PROMOTED_R4
    for i, n in enumerate(block):
        assert names[len(STALE_R1) + i] == n
    assert len(STALE_R1) + len(block) <= DRIVER_WINDOW, (
        "too many new/promoted queries for one driver window — rotate "
        "the overflow into the next round's stale set"
    )


def test_window_is_full():
    """Stale + new + promoted + fillers must fill all 50 driver slots."""
    assert len(_intended()) >= DRIVER_WINDOW


def test_rotation_names_unique_and_registered():
    rotation = _intended()
    assert len(rotation) == len(set(rotation))
    missing = [n for n in rotation if n not in REGISTRY]
    assert not missing


def test_registry_intact_after_rotation():
    """Rotation reorders — it must not drop or duplicate any query."""
    names = list(REGISTRY)
    assert len(names) == len(set(names))
    assert len(names) >= 136
