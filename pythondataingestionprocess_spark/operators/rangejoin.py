"""Range (point-in-interval) join — engine-added custom operator
(SURVEY.md §2.3: the reference has equi-joins only).

A naive ``point BETWEEN lo AND hi`` join has no equi-key, so Spark
plans BroadcastNestedLoopJoin — O(n·m) and a driver-memory hazard.
The scalable decomposition buckets the domain:

1. pick a bucket width; each interval explodes into the buckets it
   overlaps (``sequence(floor(lo/w), floor(hi/w))``),
2. points map to exactly one bucket → EQUI-join on bucket id,
3. refine with the exact BETWEEN predicate.

Cost: one shuffle on bucket id; work scales with points + interval
coverage (intervals/width), not points × intervals. Width tunes the
trade: narrower → more interval duplication, fatter → bigger refine
fan-in. Same trick underlies interval joins in Flink and the
bin-based range joins in Databricks' runtime (public docs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point <= hi`` (inclusive). ``how`` is 'inner' or 'left'
    (left keeps point rows that hit no interval, with NULL interval
    columns — assumes point rows are distinct). Column sets must be
    disjoint.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    w = float(bucket_width)
    p = points.withColumn("_b", F.floor(F.col(point_col) / w))
    i = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor(F.col(hi_col) / w).cast("long"),
            )
        ),
    )
    refined = p.join(i, "_b", "inner").filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col))
    )
    out_cols = [*points.columns, *intervals.columns]
    matched = refined.select(*out_cols)
    if how == "inner":
        return matched
    misses = points.join(
        matched.select(*points.columns).distinct(), points.columns, "left_anti"
    )
    for c in intervals.columns:
        misses = misses.withColumn(c, F.lit(None).cast(intervals.schema[c].dataType))
    return matched.unionByName(misses)
