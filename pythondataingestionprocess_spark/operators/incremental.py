"""Incremental aggregate maintenance: keep a materialized rollup
fresh by merging PARTIAL aggregate state, never by re-scanning the
full fact history.

The engine stores a rollup as mergeable partial state per group —
a row count and an exact ``DECIMAL(25,6)`` sum per measure — rather
than as finished numbers. Refresh is then algebraic::

    merge(partial(base), partial(delta)) == partial(base UNION delta)

which holds exactly because counts add and decimal sums add with no
rounding (the repo-wide determinism discipline: one cast to double at
the very end, see ``plans/registry.py``). Derived statistics that are
NOT mergeable on their own (avg, and likewise stddev via a sum-of-
squares partial) are computed at read time from the state columns.

Scale: this is the 100 TB refresh shape. The stored state is
|groups|-sized, the nightly delta is the only fact data scanned, and
the merge shuffles |groups| rows — a daily refresh costs O(delta),
not O(history). The reference re-derives its summary sheets from the
full workbook on every run (pdf_to_xlsx.py builds both sheets from
the whole statement each time); this operator is the set-oriented
replacement that survives a history too big to re-scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STATE_COUNT = "row_cnt"


def _sum_col(measure: str) -> str:
    return f"{measure}_sum_dec"


def partial_rollup(df: DataFrame, keys: list[str] | list[Column], measures: list[str]) -> DataFrame:
    """Aggregate ``df`` to mergeable per-group state: a row count plus
    an exact decimal sum per measure column."""
    aggs = [F.count(F.lit(1)).alias(STATE_COUNT)] + [
        F.sum(F.col(m).cast("decimal(25,6)"))
        .cast("decimal(25,6)")
        .alias(_sum_col(m))
        for m in measures
    ]
    return df.groupBy(*keys).agg(*aggs)


def merge_rollups(states: list[DataFrame], keys: list[str], measures: list[str]) -> DataFrame:
    """Merge any number of partial states over the same grain.

    Pure union-and-resum: counts add, decimal sums add exactly. The
    shuffle moves state rows (|groups|), never fact rows.
    """
    if not states:
        raise ValueError("need at least one partial state")
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    aggs = [F.sum(STATE_COUNT).alias(STATE_COUNT)] + [
        F.sum(_sum_col(m)).cast("decimal(25,6)").alias(_sum_col(m)) for m in measures
    ]
    return merged.groupBy(*keys).agg(*aggs)


def finish_rollup(state: DataFrame, measures: list[str]) -> DataFrame:
    """Derive the read-time statistics from mergeable state: the
    double total and the average (exact decimal sum / count — the
    deterministic-average discipline)."""
    out = state
    for m in measures:
        sum_dec = F.col(_sum_col(m))
        out = out.withColumn(f"{m}_total", sum_dec.cast("double")).withColumn(
            f"{m}_avg", sum_dec.cast("double") / F.col(STATE_COUNT)
        )
    return out.drop(*[_sum_col(m) for m in measures])
