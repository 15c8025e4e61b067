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
    round_dist: int | None = None,
) -> DataFrame:
    """Top-``k`` closest z-normalized windows to ``pattern`` across
    all keys: (key, end_ts, end_seq, dist), dist ascending, ties
    broken by (key, end_seq) — a total order, so the top-k is
    deterministic WITHIN one engine. ``round_dist`` rounds the
    distance BEFORE the ordering cut (r13 review): the sqrt-of-fold
    is not bit-promised across engines, so a cross-engine-checked
    caller must select on the rounded value — otherwise a k-th/k+1-th
    pair closer than the engines' fold divergence flips the result
    set at exactly the knife-edge the output rounding was meant to
    hide. Selecting on the rounded value keeps the cut stable (ties
    at equal rounded distance fall to the key tiebreak).

    NULL semantics (r13 review, documented rather than guessed):
    collect_list SKIPS NULL values, so the ``size(win) == m`` filter
    silently EXCLUDES every window touching a NULL-valued row — a
    series with scattered NULLs contributes fewer candidate windows,
    with no per-window signal to the caller. Impute upstream if those
    windows must participate."""
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
    if round_dist is not None:
        dist = F.round(dist, round_dist)
    return (
        framed.withColumn("dist", dist)
        .select(key_col, "end_ts", "end_seq", "dist")
        .orderBy("dist", key_col, "end_seq")
        .limit(k)
    )


def decayed_feature(
    df: DataFrame,
    half_life_rows: float = 8.0,
    window_rows: int = 32,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-row exponentially-decayed activity score — the standard
    recency-weighted feature (EWMA with a row half-life) training
    pipelines attach to every event: newer history counts more,
    weight halving every ``half_life_rows`` rows back.

    The textbook recursion ``s_t = v_t + a·s_{t-1}`` is inexpressible
    as a Spark window (self-referential); the usual closed forms
    (a^t · Σ v_i a^{-i}) overflow doubles within a few hundred rows.
    This takes the TRUNCATED form instead: fold the last
    ``window_rows`` values with explicit weights a^0..a^{m-1} — exact
    for the window it sees, and the truncation error is bounded by
    a^m (< 0.07 with the defaults, 32 rows at half-life 8) which at
    100 TB is far below feature noise. Same single-shuffle
    collect_list frame as subsequence_match; weights are a LITERAL
    array, zip_with'd against the reversed window so index 0 is the
    current row.

    Output: (key, seq, ts, decayed) — one row per input event, the
    score as of that event inclusive.

    NULL semantics (r13 review, documented rather than guessed):
    collect_list SKIPS NULL values, so a NULL-valued row inside the
    window is treated as NONEXISTENT — later rows pair with weights as
    if it never happened (older contributions shift one weight
    younger), not as zero activity. Coalesce upstream if zero is the
    intended reading.
    """
    a = 0.5 ** (1.0 / half_life_rows)
    m = window_rows
    weights = F.array(*[F.lit(a ** i) for i in range(m)])
    w = (
        W.partitionBy(key_col)
        .orderBy(ts_col, seq_col)
        .rowsBetween(-(m - 1), 0)
    )
    win = F.reverse(
        F.collect_list(F.col(value_col).cast("double")).over(w)
    )  # newest first, aligned with weights a^0, a^1, ...
    decayed = F.aggregate(
        F.zip_with(win, F.slice(weights, 1, F.size(win)), lambda v, wt: v * wt),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return df.select(
        F.col(key_col),
        F.col(seq_col).alias("seq"),
        F.col(ts_col).alias("ts"),
        decayed.alias("decayed"),
    )


def resample_interpolate_hourly(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key resample onto a regular hourly grid with LINEAR
    interpolation between the surrounding observations — the
    irregular-events → fixed-step-features transform a training
    pipeline runs before windowed models. Grid spans each key's
    [date_trunc(hour, min ts), date_trunc(hour, max ts)]; edge grid
    points outside the observed range take the nearest observation
    (back/forward fill); a grid point landing exactly on an
    observation reproduces it exactly (its interpolation fraction is
    0 by construction, not a special case).

    Spark-first (no joins at all): observations and generated grid
    rows are UNIONED into one frame, then ONE per-key sort order
    (ts, is_grid — observations first on ties, so an exact-hit grid
    row sees its observation as "previous") carries all four
    surrounding-neighbor fields via last/first-IGNORE-NULLS window
    frames. That is the standard interleave trick: two as-of joins
    (prev + next) collapse into window functions on a single per-key
    exchange. The two small upstream aggregations (per-(key,ts) dedup
    so ties can't make the neighbor fields nondeterministic, and
    per-key bounds for the grid) are key-bounded map-side-combine
    shuffles. Interpolation fractions use MICROSECOND diffs
    (timestampdiff is NTZ-polymorphic; second-granularity diffs have
    engine-specific truncation semantics on sub-second data).

    At 100 TB: grid size is bounded by key-count × span-hours, never
    by event count; every stage is key-partitioned; nothing pairs up.
    """
    k, t = F.col(key_col), F.col(ts_col)
    obs = df.groupBy(key_col, ts_col).agg(
        F.min(F.col(value_col).cast("double")).alias("_v")
    )
    bounds = obs.groupBy(key_col).agg(
        F.date_trunc("hour", F.min(ts_col)).alias("_lo"),
        F.date_trunc("hour", F.max(ts_col)).alias("_hi"),
    )
    grid = bounds.select(
        k,
        F.explode(
            F.sequence("_lo", "_hi", F.expr("INTERVAL 1 HOUR"))
        ).alias(ts_col),
    )
    unioned = obs.select(k, t, "_v", F.lit(0).alias("_is_grid")).unionByName(
        grid.select(
            k, t, F.lit(None).cast("double").alias("_v"), F.lit(1).alias("_is_grid")
        )
    )
    # Both neighbor lookups are RUNNING frames (unbounded-preceding →
    # current), which Spark evaluates incrementally in O(1) per row.
    # The naive forward frame (currentRow → unboundedFollowing) is NOT
    # incremental — UnboundedFollowingWindowFunctionFrame rescans to
    # the partition end for every row, O(rows²) per key: measured 82 s
    # vs 5 s at 8M vs 2M rows (scripts/timeseries_scaling.py) before
    # this was rewritten as a running frame over the EXACT inverse
    # sort order (ts DESC, is_grid DESC), which yields the same "first
    # observation at-or-after" semantics.
    w_prev = (
        W.partitionBy(key_col)
        .orderBy(ts_col, "_is_grid")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_next = (
        W.partitionBy(key_col)
        .orderBy(F.col(ts_col).desc(), F.col("_is_grid").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    obs_ts = F.when(F.col("_v").isNotNull(), t)
    framed = unioned.select(
        k,
        t,
        F.col("_is_grid"),
        F.last("_v", ignorenulls=True).over(w_prev).alias("prev_v"),
        F.last(obs_ts, ignorenulls=True).over(w_prev).alias("prev_ts"),
        F.last("_v", ignorenulls=True).over(w_next).alias("next_v"),
        F.last(obs_ts, ignorenulls=True).over(w_next).alias("next_ts"),
    ).filter(F.col("_is_grid") == 1)
    num = F.expr(f"timestampdiff(MICROSECOND, prev_ts, {ts_col})").cast("double")
    den = F.expr("timestampdiff(MICROSECOND, prev_ts, next_ts)").cast("double")
    interp = (
        F.when(F.col("prev_v").isNull(), F.col("next_v"))
        .when(F.col("next_v").isNull(), F.col("prev_v"))
        .otherwise(
            F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * (num / den)
        )
    )
    return framed.select(
        k, t.alias("grid_ts"), interp.alias("value")
    )
