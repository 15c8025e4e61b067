"""As-of join queries over the events stream — two independent
formulations checked against each other: the engine's union-window
composition vs DuckDB's NATIVE ``ASOF JOIN`` operator."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pythondataingestionprocess_spark.catalog import load_table
from pythondataingestionprocess_spark.operators.asof import asof_join
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
