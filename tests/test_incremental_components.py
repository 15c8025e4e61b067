"""incremental_components (operators/components.py, r9): label-table
maintenance under batch edge feeds must be BIT-EQUAL to re-solving
connected components over the full edge history — merges, new-min
adoption, new vertices, and no-op edges all covered, plus a seeded
multi-batch random graph folded batch by batch."""

from __future__ import annotations

import pytest

import random

from pythondataingestionprocess_spark.operators.components import (
    connected_components_star,
    incremental_components,
)

PAIRS_SCHEMA = "id_a long, id_b long"


def _labels(df):
    return {(r["id"], r["group_id"]) for r in df.collect()}


def _full(spark, pairs):
    return _labels(
        connected_components_star(spark.createDataFrame(pairs, PAIRS_SCHEMA))
    )


def test_merge_two_existing_groups(spark):
    base = [(1, 2), (5, 6)]
    labels = connected_components_star(
        spark.createDataFrame(base, PAIRS_SCHEMA)
    )
    got = incremental_components(
        labels, spark.createDataFrame([(2, 5)], PAIRS_SCHEMA)
    )
    assert _labels(got) == _full(spark, base + [(2, 5)])
    assert _labels(got) == {(1, 1), (2, 1), (5, 1), (6, 1)}


def test_new_id_becomes_the_group_min(spark):
    base = [(5, 9)]
    labels = connected_components_star(
        spark.createDataFrame(base, PAIRS_SCHEMA)
    )
    got = incremental_components(
        labels, spark.createDataFrame([(3, 9)], PAIRS_SCHEMA)
    )
    assert _labels(got) == {(3, 3), (5, 3), (9, 3)}


def test_edge_inside_existing_group_is_noop(spark):
    base = [(1, 2), (2, 3)]
    labels = connected_components_star(
        spark.createDataFrame(base, PAIRS_SCHEMA)
    )
    got = incremental_components(
        labels, spark.createDataFrame([(1, 3)], PAIRS_SCHEMA)
    )
    assert _labels(got) == _labels(labels)


def test_disjoint_new_group_and_bridging_vertex(spark):
    base = [(1, 2), (10, 11)]
    labels = connected_components_star(
        spark.createDataFrame(base, PAIRS_SCHEMA)
    )
    batch = [(20, 21), (30, 2), (30, 10)]  # new pair + a vertex
    # bridging BOTH existing groups through a new id
    got = incremental_components(
        labels, spark.createDataFrame(batch, PAIRS_SCHEMA)
    )
    assert _labels(got) == _full(spark, base + batch)
    by_id = dict(_labels(got))
    assert by_id[20] == 20 and by_id[21] == 20
    assert by_id[30] == by_id[1] == by_id[10] == 1


@pytest.mark.slow
def test_multi_batch_fold_equals_full_recompute(spark):
    """Seeded random graph fed in 4 batches; folding
    incremental_components over them must equal one full solve —
    including chains that only connect across batches."""
    rng = random.Random(97)
    ids = list(range(60))
    all_pairs = [
        (rng.choice(ids), rng.choice(ids)) for _ in range(80)
    ]
    all_pairs = [(a, b) for a, b in all_pairs if a != b]
    batches = [all_pairs[i::4] for i in range(4)]

    labels = connected_components_star(
        spark.createDataFrame(batches[0], PAIRS_SCHEMA)
    )
    for batch in batches[1:]:
        labels = incremental_components(
            labels, spark.createDataFrame(batch, PAIRS_SCHEMA)
        )
        # fold through a materialized copy — a store round-trip is the
        # production shape and keeps the plan from accreting lineage
        labels = spark.createDataFrame(
            labels.collect(), "id long, group_id long"
        )
    assert _labels(labels) == _full(spark, all_pairs)


def test_labels_stay_one_row_per_id(spark):
    base = [(1, 2), (5, 6), (8, 9)]
    labels = connected_components_star(
        spark.createDataFrame(base, PAIRS_SCHEMA)
    )
    got = incremental_components(
        labels, spark.createDataFrame([(2, 6), (6, 9), (50, 51)], PAIRS_SCHEMA)
    )
    rows = got.collect()
    assert len(rows) == len({r["id"] for r in rows})
    assert _labels(got) == _full(spark, base + [(2, 6), (6, 9), (50, 51)])