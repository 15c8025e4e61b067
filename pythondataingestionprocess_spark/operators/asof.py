"""As-of (point-in-time) join — engine-added custom operator
(SURVEY.md §2.3 notes the reference has no theta/range/as-of joins;
this is the canonical missing one for event/time-series work).

Spark has no native ASOF JOIN (DuckDB/Pandas do), but it composes from
built-ins with the union-window trick, which is also the SCALABLE
formulation:

1. tag left (probe) and right (reference) rows, union them,
2. one window per key ordered by (ts, tag): ``last(ref_struct,
   ignorenulls=True)`` over unbounded-preceding rows,
3. keep probe rows — each carries the most recent reference row at or
   before its timestamp.

Cost: ONE shuffle on the key (the window), no range-explosion join, no
per-key driver loops — at 100 TB this beats an inequality join (which
Spark would plan as a broadcast-nested-loop) by orders of magnitude.
All reference columns ride in a single struct so a NULL inside a
matched row never falls through to an older row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the latest right
    row with ``right.ts <= left.ts`` (direction='backward'; 'forward'
    gives the earliest right row at-or-after; ties at equal ts match —
    the tag ordering puts reference rows first). No match → NULLs
    (left-outer semantics). Output = left columns + value_cols.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    probe = left.select(
        F.col(on),
        F.col(ts),
        F.lit(1).alias("_is_probe"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_row"),
        F.lit(None)
        .cast(f"struct<{','.join(f'{c}:{right.schema[c].dataType.simpleString()}' for c in value_cols)}>")
        .alias("_ref"),
    )
    ref = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("_is_probe"),
        F.lit(None).cast(probe.schema["_row"].dataType).alias("_row"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_ref"),
    )
    order = F.col(ts).asc() if direction == "backward" else F.col(ts).desc()
    w = (
        W.partitionBy(on)
        .orderBy(order, F.col("_is_probe").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = F.last("_ref", ignorenulls=True).over(w).alias("_hit")
    return (
        probe.unionByName(ref)
        .select("*", carried)
        .filter(F.col("_is_probe") == 1)
        .select(F.col("_row.*"), *[F.col(f"_hit.{c}").alias(c) for c in value_cols])
    )
