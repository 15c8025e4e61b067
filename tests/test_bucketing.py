"""Bucketed co-located join: the write-time pre-shuffle must elide
run-time exchanges on the bucketed key — the physical-layout half of
the 100 TB join story (SURVEY.md §4.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pythondataingestionprocess_spark.catalog import load_table
from pythondataingestionprocess_spark.storage import bucketed_join, write_bucketed

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_fact_fact_join_has_no_exchange(spark):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_quantity"
    )
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    write_bucketed(li, "li_bkt", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "ord_bkt",
        ["l_orderkey"],
        8,
        sort_cols=["l_orderkey"],
    )
    joined = bucketed_join(spark, "li_bkt", "ord_bkt", ["l_orderkey"]).filter(
        F.col("o_totalprice") > 0
    )
    # force a sort-merge join so broadcast doesn't mask the bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan, "bucketed join still shuffles"
    # correctness: same result as the plain join
    plain = li.join(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey"
    ).count()
    assert joined.count() == li.join(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey"
    ).filter(F.col("o_totalprice") > 0).count()
    assert plain >= joined.count()


def test_bucketed_groupby_has_no_exchange(spark):
    # aggregation on the bucket key also rides the layout
    agg = (
        spark.table("li_bkt")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    assert "Exchange hashpartitioning" not in _plan(agg)
