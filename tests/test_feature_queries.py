"""Unit tests for the round-8-staged maintenance/feature queries:
Morton interleave correctness + layout locality, incremental rollup
merge identity, and the OLS closed form against numpy."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pythondataingestionprocess_spark.catalog import load_table
from pythondataingestionprocess_spark.functions.layout import (
    morton16,
    morton16_py,
    morton16_sql,
)
from pythondataingestionprocess_spark.operators.incremental import (
    finish_rollup,
    merge_rollups,
    partial_rollup,
)


def test_morton_spark_matches_python_reference(spark):
    pairs = [(x, y) for x in (0, 1, 5, 37, 128, 200, 255) for y in (0, 3, 17, 99, 255)]
    df = spark.createDataFrame([Row(px=x, py=y) for x, y in pairs])
    got = {
        (r["px"], r["py"]): r["m"]
        for r in df.withColumn("m", morton16("px", "py")).collect()
    }
    for x, y in pairs:
        assert got[(x, y)] == morton16_py(x, y), (x, y)


def test_morton_duckdb_dialect_matches_python_reference():
    con = duckdb.connect()
    expr = morton16_sql("px", "py", "duckdb")
    rows = con.execute(
        f"SELECT px, py, {expr} AS m FROM (SELECT unnest(range(0, 256, 13)) AS px, "
        "unnest(range(0, 256, 13)) AS py)"
    ).fetchall()
    assert rows
    for x, y, m in rows:
        assert m == morton16_py(x, y)


def test_morton_is_bijective_on_the_full_grid():
    codes = {morton16_py(x, y) for x in range(256) for y in range(256)}
    assert len(codes) == 256 * 256
    assert min(codes) == 0 and max(codes) == 65535


def test_zorder_layout_improves_2d_locality(spark, sf_dir):
    """The layout claim itself: chunk the table into 16 equal 'files'
    either by Morton order or by primary-key order; a price-band ×
    date-band box predicate must touch strictly fewer Morton chunks
    (both dimensions stay tight per chunk) than key-order chunks
    (dates correlate with keys, prices don't — one axis is always
    scattered)."""
    orders = load_table(spark, sf_dir, "orders")
    b = orders.select(
        "o_orderkey",
        "o_totalprice",
        "o_orderdate",
        F.least(F.floor(F.col("o_totalprice") / 2000).cast("long"), F.lit(255)).alias("px"),
        F.least(
            (F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).cast("long") / 10)
            .cast("long"),
            F.lit(255),
        ).alias("py"),
    ).withColumn("morton", morton16("px", "py"))

    def chunks_touched(order_col: str) -> int:
        from pyspark.sql import Window

        w = Window.orderBy(F.col(order_col), F.col("o_orderkey"))
        chunked = b.withColumn("chunk", F.ntile(16).over(w))
        hit = chunked.filter(
            (F.col("o_totalprice") >= 100_000)
            & (F.col("o_totalprice") < 150_000)
            & (F.col("o_orderdate") >= "1997-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        )
        return hit.select("chunk").distinct().count()

    morton_chunks = chunks_touched("morton")
    key_chunks = chunks_touched("o_orderkey")
    assert morton_chunks < key_chunks, (morton_chunks, key_chunks)


def test_incremental_merge_equals_full_recompute(spark, sf_dir):
    """merge(partial(b1), partial(b2), partial(b3)) == partial(all),
    exactly — counts and DECIMAL(25,6) sums are mergeable state."""
    orders = load_table(spark, sf_dir, "orders")
    keys = [F.col("o_orderstatus")]
    thirds = [
        orders.filter(F.pmod(F.col("o_orderkey"), F.lit(3)) == i) for i in range(3)
    ]
    merged = merge_rollups(
        [partial_rollup(t, keys, ["o_totalprice"]) for t in thirds],
        ["o_orderstatus"],
        ["o_totalprice"],
    )
    full = partial_rollup(orders, keys, ["o_totalprice"])
    got = {
        r["o_orderstatus"]: (r["row_cnt"], r["o_totalprice_sum_dec"])
        for r in merged.collect()
    }
    want = {
        r["o_orderstatus"]: (r["row_cnt"], r["o_totalprice_sum_dec"])
        for r in full.collect()
    }
    assert got == want
    done = finish_rollup(merged, ["o_totalprice"]).collect()
    for r in done:
        cnt, total = want[r["o_orderstatus"]]
        assert r["o_totalprice_avg"] == pytest.approx(float(total) / cnt, rel=1e-12)


def test_trend_slope_matches_numpy_polyfit(spark, sf_dir):
    """The closed-form moments slope equals numpy's least-squares fit
    on the same per-nation daily series (to float tolerance)."""
    from pythondataingestionprocess_spark.plans.feature_queries import (
        trend_slope_per_nation,
    )

    out = {r["nation"]: r for r in trend_slope_per_nation(spark, sf_dir).collect()}
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    daily = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
            .cast("long")
            .alias("x"),
        )
        .agg(F.sum("o_totalprice").alias("rev"))
        .collect()
    )
    series: dict[str, list[tuple[int, float]]] = {}
    for r in daily:
        series.setdefault(r["nation"], []).append((r["x"], r["rev"]))
    checked = 0
    for nat, pts in series.items():
        if len(pts) < 3:
            continue
        xs = np.array([p[0] for p in pts], dtype=float)
        ys = np.array([p[1] for p in pts], dtype=float)
        slope, intercept = np.polyfit(xs, ys, 1)
        assert out[nat]["slope"] == pytest.approx(slope, rel=1e-4, abs=1e-4)
        assert out[nat]["intercept"] == pytest.approx(intercept, rel=1e-4, abs=1e-2)
        checked += 1
    assert checked >= 5


def test_daily_refresh_composes_store_and_partial_state(spark, sf_dir, tmp_path):
    """The production shape of incremental maintenance, end-to-end:
    partial state persisted in a ParquetTableStore, each 'day' of new
    facts aggregated alone and MERGED into the stored state (upsert at
    group grain), final read-time stats equal to a from-scratch
    rollup over everything ingested so far. The per-refresh fact scan
    is the delta only — history is never re-read."""
    from pythondataingestionprocess_spark.pipeline.store import ParquetTableStore
    from pythondataingestionprocess_spark.operators.incremental import (
        STATE_COUNT,
        finish_rollup,
        merge_rollups,
        partial_rollup,
    )

    store = ParquetTableStore(spark, str(tmp_path / "state"))
    orders = load_table(spark, sf_dir, "orders")
    keys = [F.col("o_orderstatus")]
    batches = [
        orders.filter(F.year("o_orderdate") <= 1997),
        orders.filter(F.year("o_orderdate").isin(1998, 1999)),
        orders.filter(F.year("o_orderdate") >= 2000),
    ]
    store.overwrite("rollup", partial_rollup(batches[0], keys, ["o_totalprice"]))
    for delta in batches[1:]:
        merged = merge_rollups(
            [store.read("rollup"), partial_rollup(delta, keys, ["o_totalprice"])],
            ["o_orderstatus"],
            ["o_totalprice"],
        ).localCheckpoint()  # materialize BEFORE overwriting the file we read from
        store.overwrite("rollup", merged)

    got = {
        r["o_orderstatus"]: (r[STATE_COUNT], r["o_totalprice_total"])
        for r in finish_rollup(store.read("rollup"), ["o_totalprice"]).collect()
    }
    want = {
        r["o_orderstatus"]: (r[STATE_COUNT], r["o_totalprice_total"])
        for r in finish_rollup(
            partial_rollup(orders, keys, ["o_totalprice"]), ["o_totalprice"]
        ).collect()
    }
    assert got == want
