"""Time-series subsequence similarity search (beyond-reference depth;
pattern follows the distributed streaming-similarity literature, e.g.
"Time Series Similarity Search for Streaming Data in Distributed
Systems", EDBT 2019 — see PAPERS.md).

``subsequence_match`` finds where a query pattern occurs inside each
key's ordered value series, under Z-NORMALIZED euclidean distance —
the standard similarity measure for shape matching, because
z-normalization makes the match invariant to each window's offset and
scale (a doubled-amplitude or shifted-baseline copy of the pattern
still scores ~0).

Spark-first shape (one shuffle, no UDF):

- the sliding window of the last ``m`` values per key is an ARRAY
  column from ``collect_list`` over a row-frame window — Spark's
  native windowed-subsequence form, ordered by the total (ts, seq)
  order so ties can't reshuffle a window between runs;
- per-window mean/std ride the same frame as plain aggregates (no
  second pass over the array);
- the distance is a fold over ``zip_with(window, pattern)`` — the
  pattern is a LITERAL array, z-normalized once on the driver. For
  the usual pattern lengths (m ≤ a few dozen) the interpreted HOF
  cost is ~m ops/row, far below the 64-aggregate regime where the
  map-side-minhash negative result kicked in; for m in the hundreds,
  move the fold into an Arrow kernel like operators/similarity.py.

At 100 TB: everything before the final top-k is map-side after the
single per-key shuffle (window functions); the candidate frame never
materializes pairs — it is |rows|, not |rows|×|patterns|. Flat
(constant) windows have std 0 and are excluded rather than scored
(z-norm undefined; matching "any flat line" to any pattern is noise).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _znorm(pattern: list[float]) -> list[float]:
    m = len(pattern)
    mu = sum(pattern) / m
    var = sum((x - mu) ** 2 for x in pattern) / m
    sd = math.sqrt(var)
    if sd == 0:
        raise ValueError("pattern is constant — z-normalization undefined")
    return [(x - mu) / sd for x in pattern]


def subsequence_match(
    df: DataFrame,
    pattern: list[float],
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    value_col: str = "value",
    k: int = 10,
) -> DataFrame:
    """Top-``k`` closest z-normalized windows to ``pattern`` across
    all keys: (key, end_ts, end_seq, dist), dist ascending, ties
    broken by (key, end_seq) — a total order, so the top-k is
    deterministic."""
    m = len(pattern)
    p = F.array(*[F.lit(float(x)) for x in _znorm(pattern)])
    w = (
        W.partitionBy(key_col)
        .orderBy(ts_col, seq_col)
        .rowsBetween(-(m - 1), 0)
    )
    v = F.col(value_col).cast("double")
    framed = df.select(
        F.col(key_col),
        F.col(ts_col).alias("end_ts"),
        F.col(seq_col).alias("end_seq"),
        F.collect_list(v).over(w).alias("win"),
        F.avg(v).over(w).alias("mu"),
        F.stddev_pop(v).over(w).alias("sd"),
    ).filter((F.size("win") == m) & (F.col("sd") > 0))
    zwin = F.transform(
        "win", lambda x: (x - F.col("mu")) / F.col("sd")
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(zwin, p, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return (
        framed.withColumn("dist", dist)
        .select(key_col, "end_ts", "end_seq", "dist")
        .orderBy("dist", key_col, "end_seq")
        .limit(k)
    )
