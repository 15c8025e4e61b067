"""Non-equi join queries (as-of, range) — the engine's scalable
compositions checked against DuckDB's native operators / inequality
joins."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
    implementations, one answer."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_event_id"),
        F.col("value").alias("click_value"),
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
