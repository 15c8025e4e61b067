"""Time-series feature queries over the events table (beyond-reference
depth; the operators live in ``operators/timeseries.py`` with their
scale notes — single per-key shuffle, array-window frames, no Python).

The oracles are the DuckDB list-window replay pattern proven
cross-engine by ``tests/test_llm_operators.py::
test_subsequence_match_matches_duckdb_oracle`` before registration
(NEXT r5 item 6): the sliding window is a ``list(...) OVER`` frame,
the fold is ``list_sum(list_transform(list_zip(...)))``, distances/
scores are ROUND(·, 6) on BOTH sides (a 5- or 32-term double fold is
order-deterministic within each engine but not bit-promised across
them), and timestamps leave as formatted strings per the repo's
cross-engine convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pythondataingestionprocess_spark.catalog import load_table
from pythondataingestionprocess_spark.operators.timeseries import (
    _znorm,
    decayed_feature,
    subsequence_match,
)
from pythondataingestionprocess_spark.plans.registry import query

_PATTERN = [1.0, 3.0, 2.0, 5.0, 4.0]
_ZP = _znorm(_PATTERN)  # mean 3, stddev_pop sqrt(2)

_PATTERN_ORACLE = f"""
WITH f AS (
  SELECT user_id, event_id AS end_seq, ts AS end_ts,
         list(value) OVER w AS win,
         avg(value) OVER w AS mu,
         stddev_pop(value) OVER w AS sd
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
),
scored AS (
  SELECT user_id, end_seq, end_ts,
         sqrt(list_sum(list_transform(
              list_zip(win, {list(_ZP)!r}),
              z -> pow((z[1]-mu)/sd - z[2], 2)))) AS dist
  FROM f WHERE len(win) = 5 AND sd > 0
)
SELECT user_id, end_seq,
       strftime(end_ts, '%Y-%m-%d %H:%M:%S') AS end_ts,
       ROUND(dist, 6) AS dist
FROM scored
-- select on the ROUNDED distance (r13 review): the raw double fold
-- diverges across engines in the last ulps, and a knife-edge at the
-- k-th/k+1-th boundary would flip the result set
ORDER BY ROUND(dist, 6), user_id, end_seq
LIMIT 10
"""


@query("events_pattern_match", oracle=_PATTERN_ORACLE, tags=("timeseries", "window", "topk"))
def events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-normalized subsequence search: the 10 closest per-user
    5-event value windows to a fixed shape pattern, under
    scale/shift-invariant euclidean distance. One per-key shuffle,
    ONE Window node carrying the array + both moments,
    TakeOrderedAndProject top-k, zero Python — the plan contract is
    pinned by tests/test_llm_operators.py::
    test_subsequence_match_single_shuffle_no_python."""
    ev = load_table(spark, sf_dir, "events")
    out = subsequence_match(ev, _PATTERN, k=10, round_dist=6)
    return out.select(
        "user_id",
        "end_seq",
        F.date_format("end_ts", "yyyy-MM-dd HH:mm:ss").alias("end_ts"),
        "dist",
    )


_HALF_LIFE, _M = 8.0, 32
_A = 0.5 ** (1.0 / _HALF_LIFE)
_WEIGHTS = [_A**i for i in range(_M)]

_DECAYED_ORACLE = f"""
WITH f AS (
  SELECT user_id, event_id AS seq, ts,
         list_reverse(list(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN {_M - 1} PRECEDING AND CURRENT ROW)) AS win
  FROM events
)
SELECT user_id, seq,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       ROUND(list_sum(list_transform(
            list_zip(win, ({list(_WEIGHTS)!r})[1:len(win)]),
            z -> z[1] * z[2])), 6) AS decayed
FROM f
"""


@query("events_decayed_feature", oracle=_DECAYED_ORACLE, tags=("timeseries", "window"))
def events_decayed_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event exponentially-decayed activity score (EWMA with an
    8-row half-life, truncated at 32 rows — error bound a^32 ≈ 0.06,
    checked by tests/test_llm_operators.py::
    test_decayed_feature_matches_python_recursion). The recency
    feature a training pipeline attaches to every event; same
    single-shuffle collect_list frame as the pattern search. Weights
    are the SAME Python-computed doubles serialized into both plans,
    so only the 32-term fold order differs across engines — hence
    ROUND(·, 6) on both sides."""
    ev = load_table(spark, sf_dir, "events")
    out = decayed_feature(ev, half_life_rows=_HALF_LIFE, window_rows=_M)
    return out.select(
        "user_id",
        "seq",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.round("decayed", 6).alias("decayed"),
    )


_RESAMPLE_ORACLE = """
WITH obs AS (
  SELECT user_id, ts, min(value) AS v FROM events GROUP BY 1, 2
), bounds AS (
  SELECT user_id, date_trunc('hour', min(ts)) AS lo,
         date_trunc('hour', max(ts)) AS hi
  FROM obs GROUP BY 1
), grid AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS ts
  FROM bounds
), u AS (
  SELECT user_id, ts, v, 0 AS is_grid FROM obs
  UNION ALL
  SELECT user_id, ts, NULL AS v, 1 AS is_grid FROM grid
), f AS (
  SELECT user_id, ts, is_grid,
         last_value(v IGNORE NULLS) OVER wp AS prev_v,
         last_value(CASE WHEN v IS NOT NULL THEN ts END IGNORE NULLS)
           OVER wp AS prev_ts,
         first_value(v IGNORE NULLS) OVER wn AS next_v,
         first_value(CASE WHEN v IS NOT NULL THEN ts END IGNORE NULLS)
           OVER wn AS next_ts
  FROM u
  WINDOW wp AS (PARTITION BY user_id ORDER BY ts, is_grid
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY user_id ORDER BY ts, is_grid
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS grid_ts,
       ROUND(CASE WHEN prev_v IS NULL THEN next_v
                  WHEN next_v IS NULL THEN prev_v
                  ELSE prev_v + (next_v - prev_v) *
                       (CAST(epoch_us(ts) - epoch_us(prev_ts) AS DOUBLE)
                        / CAST(epoch_us(next_ts) - epoch_us(prev_ts) AS DOUBLE))
             END, 6) AS value
FROM f WHERE is_grid = 1
"""


@query("events_resample_interpolate", oracle=_RESAMPLE_ORACLE, tags=("timeseries", "window"))
def events_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Irregular per-user event values resampled onto a regular hourly
    grid with linear interpolation (edge points nearest-filled, exact
    hits reproduced) — see operators/timeseries.py::
    resample_interpolate_hourly for the no-join interleave design and
    its scale notes. Interpolated values ROUND(·, 6) on both engines
    (identical IEEE expression shape, but the fraction divides two
    engine-computed microsecond diffs)."""
    from pythondataingestionprocess_spark.operators.timeseries import (
        resample_interpolate_hourly,
    )

    ev = load_table(spark, sf_dir, "events")
    out = resample_interpolate_hourly(ev)
    # CAST, not date_format (r18, VERDICT r17 item 7 — the resample
    # codegen cliff): grid_ts is hour-aligned by construction (zero
    # sub-second part), where Spark's timestamp→string cast emits
    # exactly `yyyy-MM-dd HH:mm:ss` — bit-identical output
    # (exceptAll == 0 both ways at sf0.1) without date_format's
    # DateTimeFormatter machinery in the fused Generate stage. The
    # formatter was super-additive with round(·,6) in that one
    # codegen span (raw 0.9 s / +fmt 1.0 / +round 1.1 / +both 1.65 at
    # sf0.1 warm) and its generated code paid a ~3.6 s cold compile
    # the bench sees every sweep (5.6 → 1.9 s first-run).
    return out.select(
        "user_id",
        F.col("grid_ts").cast("string").alias("grid_ts"),
        F.round("value", 6).alias("value"),
    )


_NEXT_EVENT_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         list(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS ctx
  FROM events
)
SELECT array_to_string(ctx, '>') AS context,
       event_type AS label,
       CAST(COUNT(*) AS BIGINT) AS n
FROM seq WHERE len(ctx) = 3
GROUP BY 1, 2
"""


@query("events_next_event_training", oracle=_NEXT_EVENT_ORACLE, tags=("timeseries", "window", "training"))
def events_next_event_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised training-pair carving for next-event prediction:
    each event becomes (context = previous 3 event types, label =
    this event's type), aggregated into the (context, label)
    transition table a sequence model's data loader samples from.
    Same single per-key window shuffle as the other time-series
    features (the context rides a 3-row collect_list frame — no
    self-joins, no explode); the final exchange is
    |event_types|⁴-bounded, independent of event count. First 3
    events per user are dropped (incomplete context), matching the
    oracle's len(ctx)=3 filter."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, -1)
    )
    ctx = F.collect_list("event_type").over(w)
    return (
        ev.select(
            F.col("event_type").alias("label"), ctx.alias("_ctx")
        )
        .filter(F.size("_ctx") == 3)
        .groupBy(
            F.array_join("_ctx", ">").alias("context"), "label"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select("context", "label", "n")
    )
