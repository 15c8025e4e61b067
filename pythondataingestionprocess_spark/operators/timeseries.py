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
    +0.0 by construction, not a special case).

    ONE exchange, ONE sort (r17 optimization, guide §2.4): every grid
    point lies in exactly one inter-observation interval, so instead
    of UNIONING generated grid rows with the observations and carrying
    the combined frame through TWO opposite-order window sorts (the
    r7–r16 interleave design: 3 exchanges, both sorting |obs|+|grid|
    rows), each observation row looks up its successor with one
    lag-free ``lead`` window and EXPLODES the hourly points of its own
    half-open interval map-side:

    - row semantics: observation (ts, v) with successor (n_ts, n_v)
      owns hourly points ts ≤ g < n_ts (its own timestamp when
      on-hour — interpolation fraction +0.0 — plus the strict
      interior); the last row owns only its own on-hour point; the
      first row additionally owns the backfill point hour-floor(ts)
      (a single-observation key is both, so its one row owns exactly
      the backfill point hour-floor(ts) whether or not ts is on-hour).
    - the intervals partition the oracle's grid exactly (consecutive,
      disjoint, jointly covering hour-floor(min) .. hour-floor(max)),
      and the value expression keeps the interleave's exact IEEE
      shape — ``prev_v + (next_v - prev_v) * (μs-diff ratio)`` with
      the same null-edge branches — so results are bit-identical to
      the prior form and to the DuckDB oracle (which still replays
      the portable union+window formulation).

    The single shuffle carries the RAW (key, ts, value) rows once
    (hash(key) satisfies the downstream (key, ts) dedup's clustering
    requirement, so the dedup aggregate runs in-partition); the old
    shape shuffled the observations once to dedup, the per-key bounds
    a second time, and the union a third. Interpolation fractions use
    MICROSECOND diffs (timestampdiff is NTZ-polymorphic;
    second-granularity diffs have engine-specific truncation semantics
    on sub-second data).

    At 100 TB: grid size is bounded by key-count × span-hours, never
    by event count; the explode is map-side after the one exchange;
    per-task memory is row-bounded (no collected arrays); nothing
    pairs up.
    """
    k, t = F.col(key_col), F.col(ts_col)
    ev = df.select(
        k, t, F.col(value_col).cast("double").alias("_v")
    ).repartition(k)
    # in-partition dedup: hash(key) co-locates every (key, ts) group
    obs = ev.groupBy(key_col, ts_col).agg(F.min("_v").alias("_v"))
    w = W.partitionBy(key_col).orderBy(ts_col)
    cur = obs.select(
        k,
        t,
        "_v",
        F.lead(t).over(w).alias("_n_ts"),
        F.lead("_v").over(w).alias("_n_v"),
        F.row_number().over(w).alias("_rn"),
    )
    # Staged projections keep each derived quantity a PLAIN ATTRIBUTE
    # by the time the explode references it: building h0/h1 inline in
    # the generator made the DataFrame API serialize their full
    # date_trunc CASE trees ~7x into one Generate expression (measured
    # 2x the whole query's runtime); CollapseProject's multi-reference
    # guard preserves this staging because every alias below is
    # non-cheap and consumed more than once.
    hour = F.expr("INTERVAL 1 HOUR")
    pre = cur.select(
        k,
        t,
        "_v",
        "_n_ts",
        "_n_v",
        "_rn",
        F.date_trunc("hour", t).alias("_tr"),
        F.date_trunc("hour", F.col("_n_ts")).alias("_tr_n"),
    )
    tr, tr_n, n_ts = F.col("_tr"), F.col("_tr_n"), F.col("_n_ts")
    # first hourly point this row owns: the first row anchors the grid
    # at its hour-floor (backfill point); later rows start at their own
    # timestamp when on-hour, else the next hour boundary
    h0 = F.when(F.col("_rn") == 1, tr).otherwise(
        F.when(tr == t, t).otherwise(tr + hour)
    )
    # last hourly point this row owns: the greatest hour < n_ts (an
    # on-hour successor belongs to ITS row as the fraction-0 point);
    # the final row owns only its own on-hour point — EXCEPT when it
    # is also the FIRST row (a single-observation key): then it owns
    # its backfill point hour-floor(ts) even off-hour, matching the
    # oracle's grid span hour-floor(min)..hour-floor(max) (r18 fix:
    # the r17 form emitted zero rows for a lone off-hour observation)
    h1 = F.when(
        n_ts.isNotNull(),
        F.when(tr_n == n_ts, n_ts - hour).otherwise(tr_n),
    ).otherwise(F.when(tr == t, t).when(F.col("_rn") == 1, tr))
    anchored = pre.select(
        k,
        "_v",
        "_n_v",
        h0.alias("_h0"),
        h1.alias("_h1"),
        F.timestamp_diff("MICROSECOND", t, n_ts).alias("_den_us"),
        F.timestamp_diff("MICROSECOND", h0, t).alias("_c0_us"),
    )
    n_steps = F.timestamp_diff("HOUR", F.col("_h0"), F.col("_h1"))
    # Grid points are generated as INTEGER step indices, not timestamp
    # sequences: Spark's temporal Sequence expression costs ~20 us per
    # CALL (interpreted, per-call allocation — measured 2.2 s for 100k
    # row-level calls vs 0.7 s for the integer form at sf0.1); the grid
    # timestamp is reconstructed once per OUTPUT row in the final
    # projection. No otherwise branch: a NULL array explodes to zero
    # rows, which is exactly what an empty interval should contribute.
    stepped = anchored.select(
        k,
        "_v",
        "_n_v",
        "_h0",
        "_den_us",
        "_c0_us",
        F.explode(
            F.when(
                F.col("_h1").isNotNull() & (n_steps >= 0),
                F.sequence(F.lit(0).cast("long"), n_steps),
            )
        ).alias("_n"),
    )
    # us(ts -> g) = n*3_600_000_000 - _c0_us exactly (both longs far
    # below 2^53), so the long->double cast reproduces the
    # timestampdiff-based numerator of the union+window formulation
    # bit-for-bit, and the branch tests stay integer comparisons.
    num_us = F.col("_n") * F.lit(3600000000).cast("long") - F.col("_c0_us")
    num = num_us.cast("double")
    den = F.col("_den_us").cast("double")
    interp = (
        # num_us < 0 <=> g < ts: the first row's backfill point (no
        # preceding observation -> nearest fill)
        F.when(num_us < 0, F.col("_v"))
        # no successor <=> the last row's own on-hour point
        .when(F.col("_den_us").isNull(), F.col("_v"))
        .otherwise(F.col("_v") + (F.col("_n_v") - F.col("_v")) * (num / den))
    )
    return stepped.select(
        k,
        F.timestamp_add("HOUR", F.col("_n"), F.col("_h0")).alias("grid_ts"),
        interp.alias("value"),
    )
