"""Window-function queries (SURVEY.md §2.5-2.6: W1 forward-fill, W2
first-match, O2 order preservation, plus engine-added ranking/frame
breadth).

Determinism: every ORDER BY inside a window either includes a unique
tiebreaker (row_number/ntile/lag/lead — order-sensitive) or produces
values that depend only on the value multiset (rank/dense_rank/
percent_rank — tie-stable). Running double sums go through exact
decimal prefix sums.

Scale: windows shuffle once on their partition key; partition keys
here (user_id, custkey, nation) are high-cardinality so state per key
stays small — the 100 TB failure mode to avoid is a window over a
single global partition, which only `positional_attach` uses (and
only over a 25-row dimension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pythondataingestionprocess_spark.catalog import load_table
from pythondataingestionprocess_spark.plans.registry import query


# RETIRED r11 (capacity lever, r10 VERDICT item 2): `first_match_pick`
# — the W2 first-match-per-key face (the reference's ``.iloc[0]`` on a
# filtered price list, import_files_to_postgre.py:215), last driver
# row r10 hash-green. It was the k=1 special case of the row_number
# pick that `topk_per_group` (k=3, same partition/order discipline,
# driver-checked) keeps oracle-faced; the
# rn=1 shape also stays driver-checked inside `events_asof_last_click`
# and scd2 builds, and pipeline-side by test_dims_and_facts. Same
# documented-substance discipline as the F18 retirement (r10).


@query(
    "forward_fill_locf",
    oracle="""
SELECT event_id, user_id, event_type,
       last_value(v IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS filled_value
FROM (
  SELECT event_id, user_id, event_type,
         CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
  FROM events
) e
WHERE user_id < 20
""",
    tags=("window", "ffill"),
)
def forward_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill / LOCF — the reference's row-order-dependent URL
    carry-forward (W1, import_files_to_postgre.py:143-153) expressed
    as last(ignorenulls) over an explicit order key. The one genuinely
    non-relational semantic in the reference; the order key (event_id
    here, row_idx in the ingest pipeline) must come from the source.
    """
    events = load_table(spark, sf_dir, "events")
    v = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("value"))
    w = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        events.filter(F.col("user_id") < 20)
        .withColumn("v", v)
        .withColumn("filled_value", F.last("v", ignorenulls=True).over(w))
        .select("event_id", "user_id", "event_type", "filled_value")
    )


@query(
    "window_running_total",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS running_total
FROM orders
WHERE o_custkey < 100
""",
    tags=("window",),
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer — cumulative frame with exact decimal
    prefix sums (engine-added §2.5)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        orders.filter(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
            .over(w)
            .cast("double")
            .alias("running_total"),
        )
    )


@query(
    "window_range_frame",
    oracle="""
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS sum_10min
FROM events
WHERE user_id < 20
""",
    tags=("window",),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range window frame (trailing 10-minute sum per user) —
    value-determined frame, so tie-stable (engine-added §2.5)."""
    events = load_table(spark, sf_dir, "events")
    events.filter(F.col("user_id") < 20).createOrReplaceTempView("events_u20")
    return spark.sql(
        """
        SELECT event_id, user_id,
               CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER (
                 PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS sum_10min
        FROM events_u20
        """
    )


@query(
    "topk_per_group",
    oracle="""
SELECT o_orderpriority, o_orderkey, o_totalprice
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) t WHERE rn <= 3
""",
    tags=("window", "topk"),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ranked window + filter (engine-added §2.6).

    Scale: Spark pushes a per-partition partial top-k under the window
    shuffle only via WindowGroupLimit (rank-based filter) — keep the
    rn<=k filter directly above the window so the optimization fires.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
    )


@query(
    "positional_attach",
    oracle="""
WITH l AS (
  SELECT n_name, row_number() OVER (ORDER BY n_nationkey) AS rn FROM nation
), r AS (
  SELECT n_name AS alpha_name, row_number() OVER (ORDER BY n_name) AS rn FROM nation
)
SELECT l.n_name, r.alpha_name FROM l JOIN r ON l.rn = r.rn
""",
    tags=("window", "positional"),
)
def positional_attach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-by-row-position — the reference's hyperlink column attach
    (S4, import_files_to_postgre.py:261 ``df[col] = urls[:len(df)]``):
    row_number over an explicit order on both sides, then equi-join.

    Scale: global row_number is a single-partition sort — acceptable
    only for small sides (here a 25-row dim); the ingest pipeline
    scopes position by file instead (partitioned window on filename).
    """
    nation = load_table(spark, sf_dir, "nation")
    # constant partition key: declares the single-partition sort
    # intentional (25-row dim) — identical row numbers, no WindowExec
    # no-partition-defined warning in bench stderr.
    left = nation.withColumn(
        "rn", F.row_number().over(W.partitionBy(F.lit(0)).orderBy("n_nationkey"))
    ).select("n_name", "rn")
    right = nation.select(F.col("n_name").alias("alpha_name")).withColumn(
        "rn", F.row_number().over(W.partitionBy(F.lit(0)).orderBy("alpha_name"))
    )
    return left.join(right, "rn").select("n_name", "alpha_name")


@query(
    "percent_rank_ntile",
    oracle="""
SELECT s_suppkey, s_nationkey,
       percent_rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal) AS pr,
       ntile(4) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey) AS quartile
FROM supplier
""",
    tags=("window",),
)
def percent_rank_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank (tie-stable) + ntile with a unique tiebreaker
    (engine-added §2.5)."""
    supplier = load_table(spark, sf_dir, "supplier")
    wp = W.partitionBy("s_nationkey").orderBy("s_acctbal")
    wn = W.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    return supplier.select(
        "s_suppkey",
        "s_nationkey",
        F.percent_rank().over(wp).alias("pr"),
        F.ntile(4).over(wn).alias("quartile"),
    )


# RETIRED r15 (capacity lever for the Q2 registration, r14 VERDICT
# item 4): `topk_per_group_agg` — the top-k-per-group face expressed
# as an AGGREGATION (sorted-slice over collected structs), last
# driver row r14 hash-green. It pinned the SAME oracle as
# `topk_per_group` (k=3, identical output, still driver-faced); the
# agg formulation and its scale trade (collect_list buffers a full
# group; window + WindowGroupLimit is strictly better for huge
# groups) migrate to tests/test_plans.py::
# test_topk_agg_formulation_matches_window_face. Same documented-
# substance discipline as the F18 / first_match_pick retirements.


@query(
    "rolling_median_user_value",
    oracle="""
SELECT event_id, user_id, value,
       quantile_cont(value, 0.5) OVER (PARTITION BY user_id ORDER BY event_id
                                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
         AS roll_median
FROM events WHERE user_id < 30
""",
    tags=("window", "quantile"),
)
def rolling_median_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-event median of value per user — an EXACT percentile
    as a moving-frame window aggregate (the robust-smoothing primitive
    for sensor/metric streams; medians shrug off the spikes a moving
    mean chases). Spark's exact `percentile` and DuckDB's
    `quantile_cont` both linearly interpolate, and the interpolation
    arithmetic ((a+b)/2 on doubles) is identical IEEE on both engines.
    One shuffle on user_id; the frame re-sort is per-key."""
    events = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(-6, W.currentRow)
    )
    return events.filter(F.col("user_id") < 30).select(
        "event_id",
        "user_id",
        "value",
        F.percentile("value", 0.5).over(w).alias("roll_median"),
    )


@query(
    "events_time_weighted_value",
    oracle="""
WITH seq AS (
  SELECT user_id, CAST(ts AS DATE) AS day, ts, value,
         lead(ts) OVER (PARTITION BY user_id, CAST(ts AS DATE)
                        ORDER BY ts, event_id) AS next_ts
  FROM events WHERE user_id < 50
), dur AS (
  SELECT user_id, day, value,
         date_diff('microsecond', ts,
                   COALESCE(next_ts, CAST(day + 1 AS TIMESTAMP))) AS us
  FROM seq
)
SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(us AS DECIMAL(19,0))) AS DOUBLE)
             / CAST(SUM(us) AS DOUBLE), 9) AS twav
FROM dur GROUP BY user_id, day
""",
    tags=("window", "agg", "time"),
)
def events_time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per (user, day) — each event's value
    holds until the user's next event that day (the last one holds to
    midnight), so sparse bursts don't dominate the way a plain mean
    lets them: the TWAP shape every pricing/telemetry rollup needs.
    Durations are integer MICROSECONDS (timestamp_diff — NTZ-safe; no
    float time math). The value×duration product is computed IN exact
    decimal (decimal(18,6) × decimal(19,0) → decimal(38,6)), NOT as a
    double that is then rounded to decimal: at 1e10+ magnitudes the 6th
    fractional digit sits past double precision, where Spark's
    shortest-repr rounding and DuckDB's exact-binary-expansion rounding
    disagree in the last ulp. The ~1e13-magnitude decimal sum ALSO
    converts to double differently across engines (single vs two-step
    rounding), so the final quotient is rounded to 9 decimals on both
    sides — the revenue_share_top_customers precedent. One shuffle on
    (user, day)."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "day").orderBy("ts", "event_id")
    seq = (
        events.filter(F.col("user_id") < 50)
        .withColumn("day", F.to_date("ts"))
        .withColumn("next_ts", F.lead("ts").over(w))
    )
    day_end = F.date_add(F.col("day"), 1).cast("timestamp_ntz")
    dur = seq.withColumn(
        "us",
        F.timestamp_diff("MICROSECOND", F.col("ts"), F.coalesce("next_ts", day_end)),
    )
    return dur.groupBy(
        "user_id", F.date_format("day", "yyyy-MM-dd").alias("day")
    ).agg(
        F.round(
            F.sum(
                F.col("value").cast("decimal(18,6)")
                * F.col("us").cast("decimal(19,0)")
            ).cast("double")
            / F.sum("us").cast("double"),
            9,
        ).alias("twav")
    )


# ---------------------------------------------------------------------------
# Hierarchical ratio-to-parent: share at two grains from ONE aggregate.
# ---------------------------------------------------------------------------

_HIER_SHARE_ORACLE = """
WITH nat AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2
)
SELECT region, nation,
       CAST(rev AS DOUBLE) AS revenue,
       ROUND(CAST(rev AS DOUBLE) / CAST(SUM(rev) OVER (PARTITION BY region) AS DOUBLE), 9)
         AS share_of_region,
       ROUND(CAST(rev AS DOUBLE) / CAST(SUM(rev) OVER () AS DOUBLE), 9)
         AS share_of_total
FROM nat
"""


@query("hierarchical_revenue_share", oracle=_HIER_SHARE_ORACLE, tags=("window", "ratio", "olap"))
def hierarchical_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-parent at two hierarchy levels from a single
    aggregate: each nation's revenue as a share of its region and of
    the world. The windows run over the 25-row AGGREGATE (metrics-
    sized — the partition-by-region and global frames cost nothing),
    never over fact rows; revenue stays DECIMAL through both window
    sums so the numerator/denominator pairs are engine-identical, and
    each share is one IEEE division ROUND(·, 9).

    This is the drill-down OLAP report shape (percent-of-parent in a
    dimension hierarchy) that generalizes `revenue_share_top_customers`
    (single-level ratio-to-report) to nested grains.
    """
    orders, customer, nation, region = (
        load_table(spark, sf_dir, t) for t in ("orders", "customer", "nation", "region")
    )
    nat = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
            .cast("decimal(25,6)")
            .alias("rev")
        )
    )
    w_region = W.partitionBy("region")
    w_all = W.partitionBy()
    return nat.select(
        "region",
        "nation",
        F.col("rev").cast("double").alias("revenue"),
        F.round(
            F.col("rev").cast("double") / F.sum("rev").over(w_region).cast("double"), 9
        ).alias("share_of_region"),
        F.round(
            F.col("rev").cast("double") / F.sum("rev").over(w_all).cast("double"), 9
        ).alias("share_of_total"),
    )


# ---------------------------------------------------------------------------
# Frame-edge value picks: first/last/nth over an explicit running frame.
# ---------------------------------------------------------------------------

_EDGE_ORACLE = """
SELECT user_id,
       event_id,
       first_value(value) OVER w AS first_val,
       last_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND UNBOUNDED FOLLOWING) AS last_val,
       nth_value(value, 3) OVER w AS third_val
FROM events
WHERE user_id % 97 = 0
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@query("window_edge_values", oracle=_EDGE_ORACLE, tags=("window", "frame"))
def window_edge_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value with explicit frames — the
    frame-edge picks that complete the window family (lag/lead, ranks,
    running and range frames already registered). The trap this query
    pins: last_value over the DEFAULT frame (unbounded preceding →
    current row) is just the current row, so the full-partition frame
    must be explicit — both engines agree once the frame is spelled
    out, and the (ts, event_id) order is total so ties can't pick
    different rows. nth_value(3) is NULL for the first two rows of
    each key (no padding). Static whole-partition frames are
    O(1)/row; the user_id filter keeps driver output bounded."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 97 == 0)
    order = [F.col("ts"), F.col("event_id")]
    w_run = (
        W.partitionBy("user_id").orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_full = (
        W.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.first("value").over(w_run).alias("first_val"),
        F.last("value").over(w_full).alias("last_val"),
        F.nth_value("value", 3).over(w_run).alias("third_val"),
    )
