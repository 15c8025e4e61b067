"""Non-equi join queries (as-of, range) — the engine's scalable
compositions checked against DuckDB's native operators / inequality
joins."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from pythondataingestionprocess_spark.catalog import load_table
from pythondataingestionprocess_spark.operators.asof import asof_join
from pythondataingestionprocess_spark.operators.rangejoin import range_join
from pythondataingestionprocess_spark.plans.registry import query

_ASOF_ORACLE = """
WITH errors AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
), clicks AS (
  SELECT user_id, ts, event_id AS click_event_id, value AS click_value
  FROM events WHERE event_type = 'click'
  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id) = 1
)
SELECT e.event_id, e.user_id, e.ts, c.click_event_id, c.click_value
FROM errors e
ASOF LEFT JOIN clicks c ON e.user_id = c.user_id AND c.ts <= e.ts
"""


@query("events_asof_last_click", oracle=_ASOF_ORACLE, tags=("asof", "window"))
def events_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every 'error' event, the user's most recent 'click' at or
    before it (point-in-time attribution). Engine side is the
    union-window as-of composition (one shuffle on user_id); the
    oracle is DuckDB's built-in ASOF JOIN — two unrelated
    implementations, one answer.

    Tie discipline (r13 review — the forward twin had this, the
    backward face didn't): ASOF over a non-unique ts series picks an
    arbitrary winner per engine, and the union-window's F.last over
    same-(user, ts) clicks is shuffle-order dependent even WITHIN
    Spark. Today's testdata happens to carry zero same-(user, ts)
    duplicates, but microsecond timestamps at 100TB event counts
    expect collisions (birthday math) — so both sides pre-dedupe
    clicks to one row per (user_id, ts), min event_id wins, making
    the join deterministic by construction rather than by luck."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    w_tie = W.partitionBy("user_id", "ts").orderBy("event_id")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .withColumn("rn", F.row_number().over(w_tie))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "ts",
            F.col("event_id").alias("click_event_id"),
            F.col("value").alias("click_value"),
        )
    )
    return asof_join(
        errors, clicks, on="user_id", ts="ts",
        value_cols=["click_event_id", "click_value"],
    )


_RANGE_ORACLE = """
WITH bands AS (
  SELECT r_regionkey * 10 AS band_id,
         r_regionkey * 10.0 AS lo,
         r_regionkey * 10.0 + 14.0 AS hi,
         r_name AS band_name
  FROM region
), pts AS (
  SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
  WHERE l_orderkey % 101 = 0
)
SELECT p.l_orderkey, p.l_linenumber, p.l_quantity, b.band_id, b.band_name
FROM pts p JOIN bands b ON p.l_quantity BETWEEN b.lo AND b.hi
"""


@query("range_join_quantity_bands", oracle=_RANGE_ORACLE, tags=("rangejoin",))
def range_join_quantity_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join: lineitem quantities against overlapping
    bands derived from region (5 intervals of width 14, step 10 — so
    some points hit two bands). Engine side is the bucket-decomposed
    equi-join (no BroadcastNestedLoopJoin — asserted in
    tests/test_plans.py); oracle is a plain inequality join."""
    region = load_table(spark, sf_dir, "region")
    li = load_table(spark, sf_dir, "lineitem")
    bands = region.select(
        (F.col("r_regionkey") * 10).alias("band_id"),
        (F.col("r_regionkey") * 10.0).alias("lo"),
        (F.col("r_regionkey") * 10.0 + 14.0).alias("hi"),
        F.col("r_name").alias("band_name"),
    )
    pts = li.filter(F.col("l_orderkey") % 101 == 0).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    joined = range_join(pts, bands, "l_quantity", "lo", "hi", bucket_width=8.0)
    return joined.select(
        "l_orderkey", "l_linenumber", "l_quantity", "band_id", "band_name"
    )


# ---------------------------------------------------------------------------
# Point-in-time (SCD2 validity-window) join: each fact row picks the
# dimension version whose [valid_from, valid_to) window contains the
# fact's date — the read path of every slowly-changing dimension.
# ---------------------------------------------------------------------------

_PIT_ORACLE = """
WITH versions AS (
  SELECT p_partkey,
         v AS version,
         DATE '1992-01-01' + CAST((p_partkey % 700) + v * 800 AS INTEGER) AS valid_from,
         CASE WHEN v < 2
              THEN DATE '1992-01-01' + CAST((p_partkey % 700) + (v + 1) * 800 AS INTEGER)
              ELSE DATE '2099-01-01' END AS valid_to,
         round(p_retailprice * (1.0 + v * 0.1), 2) AS versioned_price
  FROM part, (SELECT unnest(range(3)) AS v)
),
joined AS (
  SELECT l_orderkey, l_linenumber, l_shipdate, p.version, p.versioned_price
  FROM lineitem l
  JOIN versions p
    ON l.l_partkey = p.p_partkey
   AND l.l_shipdate >= p.valid_from AND l.l_shipdate < p.valid_to
)
SELECT version,
       COUNT(*) AS n_lines,
       CAST(CAST(SUM(CAST(versioned_price AS DECIMAL(25,6))) AS STRING) AS DOUBLE) AS sum_price
FROM joined
GROUP BY version
"""


@query("pit_scd2_price_join", oracle=_PIT_ORACLE, tags=("asof", "scd", "join"))
def pit_scd2_price_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join against a synthesized 3-version SCD2 price
    history (contiguous validity windows derived from the part key):
    each lineitem matches exactly the version covering its ship date,
    then counts/sums per version.

    Scale shape: the join is an EQUI join on the natural key
    (l_partkey = p_partkey) with the validity window as a residual
    range predicate — Catalyst plans the hash join on the key and
    evaluates the interval filter as a post-join condition, so there is
    no range-explosion and the dimension side (3 rows/key) broadcasts.
    This is the SCD2 read idiom at 100 TB: never join on BETWEEN alone
    (that's an interval join needing binning — see
    range_join_quantity_bands); always carry the natural key."""
    part, lineitem = (
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "lineitem"),
    )
    v = F.col("v")
    base = F.to_date(F.lit("1992-01-01"))
    versions = (
        part.select("p_partkey", "p_retailprice")
        .withColumn("v", F.explode(F.sequence(F.lit(0), F.lit(2))))
        .select(
            "p_partkey",
            v.alias("version"),
            F.date_add(base, ((F.col("p_partkey") % 700) + v * 800).cast("int")).alias(
                "valid_from"
            ),
            F.when(
                v < 2,
                F.date_add(
                    base, ((F.col("p_partkey") % 700) + (v + 1) * 800).cast("int")
                ),
            )
            .otherwise(F.to_date(F.lit("2099-01-01")))
            .alias("valid_to"),
            F.round(F.col("p_retailprice") * (1.0 + v * 0.1), 2).alias(
                "versioned_price"
            ),
        )
    )
    joined = lineitem.join(
        versions,
        (lineitem["l_partkey"] == versions["p_partkey"])
        & (lineitem["l_shipdate"] >= versions["valid_from"])
        & (lineitem["l_shipdate"] < versions["valid_to"]),
    )
    return joined.groupBy("version").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("versioned_price").cast("decimal(25,6)"))
        .cast("double")
        .alias("sum_price"),
    )


_ASOF_FWD_ORACLE = """
WITH errors AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
), purchases AS (
  SELECT user_id, ts, purchase_event_id, purchase_value FROM (
    SELECT user_id, ts, event_id AS purchase_event_id, value AS purchase_value,
           row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id) AS rn
    FROM events WHERE event_type = 'purchase'
  ) WHERE rn = 1
)
SELECT e.event_id, e.user_id, e.ts, p.purchase_event_id, p.purchase_value
FROM errors e
ASOF LEFT JOIN purchases p ON e.user_id = p.user_id AND p.ts >= e.ts
"""


@query("events_asof_next_purchase", oracle=_ASOF_FWD_ORACLE, tags=("asof", "window"))
def events_asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every 'error' event, the user's EARLIEST 'purchase' at or
    after it — the FORWARD direction of the as-of operator ("did the
    user still convert after hitting the error?"), which the
    last_click query leaves unexercised. Same union-window
    composition, one shuffle on user_id, traversal order reversed;
    oracle is DuckDB's native forward ASOF JOIN — two unrelated
    implementations, one answer.

    Tie discipline: ASOF over a non-unique ts series picks an
    arbitrary winner per engine, so both sides pre-dedupe purchases
    to one row per (user_id, ts) — min event_id wins — making the
    as-of target unique on ts and the join deterministic by
    construction. (r13 review correction: today's testdata carries NO
    same-(user, ts) duplicates — the guard is for the collisions
    microsecond timestamps at 100TB event counts make expected, not
    for a property of the fixtures.)"""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    w_tie = W.partitionBy("user_id", "ts").orderBy("event_id")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(w_tie))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "ts",
            F.col("event_id").alias("purchase_event_id"),
            F.col("value").alias("purchase_value"),
        )
    )
    return asof_join(
        errors, purchases, on="user_id", ts="ts",
        value_cols=["purchase_event_id", "purchase_value"],
        direction="forward",
    )
