"""Run-manifest lineage: content checksums are partition-order-free,
re-runs reproduce them exactly, retries don't duplicate rows, and the
drift report catches a one-row change."""

from __future__ import annotations

from pyspark.sql import functions as F

from pythondataingestionprocess_spark.catalog import load_table
from pythondataingestionprocess_spark.pipeline.manifest import (
    MANIFEST_TABLE,
    diff_runs,
    frame_summary,
    record_run,
)
from pythondataingestionprocess_spark.pipeline.store import ParquetTableStore

SF_DIR = "/root/testdata/sf0.001"


def test_checksum_is_partition_order_free(spark):
    orders = load_table(spark, SF_DIR, "orders")
    a = frame_summary(orders)
    b = frame_summary(orders.repartition(7, "o_orderstatus"))
    c = frame_summary(orders.orderBy(F.col("o_totalprice").desc()))
    assert a == b == c
    assert a[0] > 0 and a[1] != 0


def test_checksum_sees_value_changes_not_just_counts(spark):
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    base = frame_summary(orders)
    bumped = frame_summary(
        orders.withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") == 1, F.col("o_totalprice") + 1).otherwise(
                F.col("o_totalprice")
            ),
        )
    )
    assert base[0] == bumped[0]          # same row count
    assert base[1] != bumped[1]          # different content


def test_record_rerun_reproduces_and_retry_is_idempotent(spark, tmp_path):
    store = ParquetTableStore(spark, str(tmp_path / "wh"))
    orders = load_table(spark, SF_DIR, "orders")
    out = orders.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))

    record_run(store, "run-1", {"orders": orders}, {"status_rollup": out})
    record_run(store, "run-1", {"orders": orders}, {"status_rollup": out})  # retry
    m = store.read(MANIFEST_TABLE)
    assert m.count() == 2  # one input + one output row, not four

    # an identical second run carries identical checksums → no drift
    record_run(store, "run-2", {"orders": orders}, {"status_rollup": out})
    assert diff_runs(store, "run-1", "run-2").count() == 0

    # drop one input row → the input line drifts, the (unchanged)
    # output line doesn't
    record_run(
        store,
        "run-3",
        {"orders": orders.filter(F.col("o_orderkey") != 1)},
        {"status_rollup": out},
    )
    drifted = diff_runs(store, "run-1", "run-3").collect()
    assert {(r["role"], r["table_name"]) for r in drifted} == {("input", "orders")}
