"""Hierarchy traversal (the recursive-CTE workload) on Spark.

Spark has no recursive CTE; the scalable substitute for
root-finding/level computation over a parent-pointer table is PATH
DOUBLING: every node carries (ancestor-pointer, distance, resolved);
each round, unresolved nodes splice their ancestor's pointer onto their
own, doubling the covered hop distance — O(log depth) self-joins
instead of O(depth) one-hop rounds. The same doubling idea underlies
parallel list ranking and the star rounds in
operators/components.py.

Each round is one shuffle-join on the ancestor key; localCheckpoint
truncates lineage so round N does not replay rounds 1..N-1. The only
driver-side value per round is the are-we-done scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_roots(
    nodes: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent_id",
    max_rounds: int = 20,
) -> DataFrame:
    """(id, root_id, depth, dangling) for a parent-pointer forest.

    ``nodes``: one row per node; roots have NULL ``parent_col`` or
    parent == id. Roots get depth 0. ``max_rounds`` bounds depth at
    2^max_rounds (20 → ~1M levels).

    A DANGLING parent pointer (an ancestor id absent from the node
    table) resolves with ``root_id`` = the dangling id and
    ``dangling`` = true, so consumers joining ``root_id`` back to the
    node table can distinguish real roots from broken chains instead of
    silently dropping or nulling those rows.

    Invariant maintained every round: ``anc`` is an ancestor of ``id``
    at exactly ``dist`` hops; once ``resolved``, ``anc`` IS the root.
    Splicing an unresolved node's pointer with its ancestor's entry
    preserves the invariant and inherits the ancestor's resolution
    (and its dangling flag).
    """
    is_root = F.col(parent_col).isNull() | (F.col(parent_col) == F.col(id_col))
    t = nodes.select(
        F.col(id_col).cast("long").alias("id"),
        F.when(is_root, F.col(id_col).cast("long"))
        .otherwise(F.col(parent_col).cast("long"))
        .alias("anc"),
        F.when(is_root, F.lit(0)).otherwise(F.lit(1)).cast("long").alias("dist"),
        is_root.alias("resolved"),
        F.lit(False).alias("dangling"),
    ).localCheckpoint(eager=True)
    for _ in range(max_rounds):
        if t.filter(~F.col("resolved")).limit(1).count() == 0:
            return t.select(
                "id",
                F.col("anc").alias("root_id"),
                F.col("dist").alias("depth"),
                "dangling",
            )
        anc_side = t.select(
            F.col("id").alias("a_id"),
            F.col("anc").alias("a_anc"),
            F.col("dist").alias("a_dist"),
            F.col("resolved").alias("a_resolved"),
            F.col("dangling").alias("a_dangling"),
        )
        # LEFT join: a dangling parent pointer (anc id absent from the
        # node table) must not silently drop the node — it resolves to
        # the dangling id itself with dangling=true, so the output
        # always carries one row per input node.
        spliced = (
            t.filter(~F.col("resolved"))
            .join(anc_side, F.col("anc") == F.col("a_id"), "left")
            .select(
                "id",
                F.coalesce(F.col("a_anc"), F.col("anc")).alias("anc"),
                (F.col("dist") + F.coalesce(F.col("a_dist"), F.lit(0))).alias("dist"),
                F.coalesce(F.col("a_resolved"), F.lit(True)).alias("resolved"),
                F.when(F.col("a_id").isNull(), F.lit(True))
                .otherwise(F.col("a_dangling"))
                .alias("dangling"),
            )
        )
        t = (
            t.filter(F.col("resolved")).unionByName(spliced).localCheckpoint(eager=True)
        )
    raise RuntimeError(f"resolve_roots: depth exceeds 2^{max_rounds}")
