"""Scan-parallelism guard for CPU-heavy map stages.

A Spark scan's task count equals its input SPLIT count, and a parquet
file is splittable only at row-group boundaries. A single-row-group
file (or a gzip/json blob) therefore scans as ONE task — and any
CPU-dense map stage built on it (shingling + 64 minhashes, n-gram
explode, embedding arithmetic, media decode) runs single-core no
matter how many executor cores exist, because Spark never rebalances
between a scan and its first shuffle.

``rebalance_scan`` fixes exactly that case and nothing else: when the
input has fewer partitions than the session's default parallelism, it
hash-repartitions on the supplied keys to the core count. Keyed, the
shuffle ALIGNS with the downstream ``groupBy(key)`` — hash
partitioning on the key satisfies the aggregation's required
ClusteredDistribution, so the exchange MOVES from after the partial
aggregate to before the explode and the plan's total exchange count
is unchanged; what changes is that the expensive explode+hash work
now runs on every core. When the scan is already parallel (the 100 TB
case — thousands of splits), the helper is an exact no-op: no
shuffle, no plan change.

The partition count is passed EXPLICITLY (``repartition(n, key)``) —
an N-less ``repartition(key)`` is AQE-coalescible, and at these input
sizes (bytes-small, CPU-large) AQE's advisory size would coalesce
straight back to one partition, silently undoing the fix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rebalance_scan(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism on
    ``key_cols`` iff its scan parallelism falls below it — the
    unsplittable-input guard for CPU-heavy map stages. No-op (and no
    added plan nodes) whenever the source is already parallel.

    The parallelism probe reads ``df.inputFiles()`` — driver-side
    metadata off the logical plan's file index — instead of
    ``df.rdd.getNumPartitions()``, which forces a full physical
    plan → RDD conversion per invocation (~0.1 s of driver time on
    every signature/shingle build, and it bypasses AQE planning for
    that subtree — r7 ADVICE). File count can UNDERcount splits when
    a file holds several row groups; the cost of that miss is one
    keyed exchange that ALIGNS with the downstream ``groupBy(key)``
    (the exchange moves, it is never added — see module docstring),
    accepted for a probe that never plans physically. Non-file
    sources (local relations, in-memory frames) return no input
    files; only they fall back to the RDD probe."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    files = df.inputFiles()
    n = len(files) if files else df.rdd.getNumPartitions()
    if n >= target:
        return df
    return df.repartition(target, *[F.col(c) for c in key_cols])
