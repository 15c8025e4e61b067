"""Core relational operator queries (SURVEY.md §2.1-2.4, §2.6-2.7).

Each query is the Spark-first expression of an operator class found in
the reference system, verified against a DuckDB oracle on the driver
corpus. Reference citations in each docstring point into
/root/reference (file:line) for parity checking.

Scale notes are inline: every join states its intended physical
strategy at 100 TB (broadcast vs shuffle), every aggregate is
partial-aggregation-friendly (plain sum/count/min/max), and filters/
projections are expressed declaratively so Catalyst pushes them into
the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pythondataingestionprocess_spark.catalog import load_table
from pythondataingestionprocess_spark.plans.registry import (
    dec_avg,
    dec_sum,
    query,
    sql_dec_avg,
    sql_dec_sum,
)


def _t(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)


# ---------------------------------------------------------------------------
# Flagship: scan → filter → 4-way join → agg → (driver sorts) — TPC-H Q5 shape.
# ---------------------------------------------------------------------------

_FLAGSHIP_ORACLE = f"""
SELECT r_name, n_name,
       {sql_dec_sum("l_extendedprice * (1 - l_discount)", "revenue")},
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY r_name, n_name
"""


@query("flagship_revenue_by_nation", oracle=_FLAGSHIP_ORACLE, tags=("join", "agg", "flagship"))
def flagship_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by region/nation over a 2-year order window.

    Exercises scan+pushdown, inner equi-joins, broadcast dims, and
    partial aggregation in one plan (the reference's J1/J3/A4 shapes,
    import_files_to_postgre.py:93-97, database_utils.py:33-41).

    Scale: lineitem⨝orders is the big shuffle (co-partition on
    orderkey); customer is shuffled on custkey; nation/region are
    broadcast — at 100 TB only the two fact shuffles remain, both on
    their natural join keys.
    """
    lineitem, orders, customer, nation, region = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "nation", "region"
    )
    orders_win = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        lineitem.join(orders_win, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q1 shape — wide partial-aggregation summary (reference A4 totals).
# ---------------------------------------------------------------------------

_PRICING_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dec_sum("l_quantity", "sum_qty")},
       {sql_dec_sum("l_extendedprice", "sum_base_price")},
       {sql_dec_sum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
       {sql_dec_sum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
       {sql_dec_avg("l_quantity", "avg_qty")},
       {sql_dec_avg("l_extendedprice", "avg_price")},
       {sql_dec_avg("l_discount", "avg_disc")},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@query("pricing_summary", oracle=_PRICING_ORACLE, tags=("agg",))
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped pricing summary (TPC-H Q1 shape) — the engine's version
    of the reference's sheet-level totals (SURVEY §2.4 A4;
    import_files_to_postgre.py:254 TOTAL CMPRS / TOTAL DESC columns).

    Scale: pure map-side partial agg into a tiny 2-key shuffle; the
    shipdate filter pushes into the parquet scan.
    """
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity", "sum_qty"),
            dec_sum("l_extendedprice", "sum_base_price"),
            dec_sum(disc_price, "sum_disc_price"),
            dec_sum(charge, "sum_charge"),
            dec_avg("l_quantity", "avg_qty"),
            dec_avg("l_extendedprice", "avg_price"),
            dec_avg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Sort / limit / top-k (SURVEY §2.6; no explicit ORDER BY in reference —
# engine-added per build plan).
# ---------------------------------------------------------------------------


@query(
    "top_orders_by_price",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
    tags=("sort", "limit"),
)
def top_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k with a unique tiebreaker (o_orderkey) so the result
    is total-ordered and deterministic.

    Scale: Spark executes ORDER BY+LIMIT as TakeOrderedAndProject —
    per-partition top-k then a tiny driver merge; no full sort.
    """
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Filters / predicates (SURVEY §2.2 P1, P3, P4).
# ---------------------------------------------------------------------------


@query(
    "filter_not_contains",
    oracle=f"""
SELECT event_type, COUNT(*) AS n_events, {sql_dec_sum("value", "sum_value")}
FROM events
WHERE NOT contains(upper(CAST(event_type AS VARCHAR)), 'ERROR')
GROUP BY event_type
""",
    tags=("filter",),
)
def filter_not_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative substring-containment filter on a cast-to-string column
    — the reference's CANCELED-row skip (P3,
    import_files_to_postgre.py:162-165 does ``"CANCELED" in str(x)``).
    """
    (events,) = _t(spark, sf_dir, "events")
    return (
        events.filter(~F.upper(F.col("event_type").cast("string")).contains("ERROR"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dec_sum("value", "sum_value"))
    )


@query(
    "filter_nonempty_text",
    oracle="""
SELECT source, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
FROM documents
WHERE text IS NOT NULL AND text <> ''
GROUP BY source
""",
    tags=("filter",),
)
def filter_nonempty_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empty/NULL-name row skip (P4, import_files_to_postgre.py:171-172)."""
    (documents,) = _t(spark, sf_dir, "documents")
    return (
        documents.filter(F.col("text").isNotNull() & (F.col("text") != ""))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


@query(
    "projection_narrow",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
WHERE l_orderkey % 997 = 0
""",
    tags=("projection",),
)
def projection_narrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-subset projection with a selective filter (P1,
    import_files_to_postgre.py:94). The plan must show ReadSchema with
    only 3 columns and the modulo predicate evaluated post-scan.
    """
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return lineitem.filter(F.col("l_orderkey") % 997 == 0).select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.3 J1-J5).
# ---------------------------------------------------------------------------


@query(
    "left_join_enrich",
    oracle="""
SELECT l_orderkey, l_linenumber, l_partkey, p_brand, p_type, p_retailprice
FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
WHERE l_orderkey % 499 = 0
""",
    tags=("join",),
)
def left_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left equi-join enriching facts with dimension attributes — the
    reference's purchases⟕prices merge (J1,
    import_files_to_postgre.py:93-97).

    Scale: part is the small side → broadcast; the filter on the fact
    side keeps the probe cheap and pushes into the scan.
    """
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    return (
        lineitem.filter(F.col("l_orderkey") % 499 == 0)
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "left")
        .select("l_orderkey", "l_linenumber", "l_partkey", "p_brand", "p_type", "p_retailprice")
    )


@query(
    "left_join_reverse_agg",
    oracle=f"""
SELECT p_brand,
       {sql_dec_sum("l_quantity", "sum_qty")},
       COUNT(l_orderkey) AS n_items
FROM part LEFT JOIN lineitem ON p_partkey = l_partkey
GROUP BY p_brand
""",
    tags=("join", "agg"),
)
def left_join_reverse_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-side left join + aggregate — the reference's reversed
    prices⟕purchases merge (J2, import_files_to_postgre.py:112-116).
    COUNT(l_orderkey) (not COUNT(*)) so unmatched parts count 0.
    """
    part, lineitem = _t(spark, sf_dir, "part", "lineitem")
    return (
        part.join(lineitem, F.col("p_partkey") == F.col("l_partkey"), "left")
        .groupBy("p_brand")
        .agg(dec_sum("l_quantity", "sum_qty"), F.count("l_orderkey").alias("n_items"))
    )


@query(
    "broadcast_dim_join",
    oracle=f"""
SELECT n_name, c_mktsegment,
       COUNT(*) AS n_orders,
       {sql_dec_sum("o_totalprice", "sum_total")}
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name, c_mktsegment
""",
    tags=("join", "agg"),
)
def broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cached-dimension lookup join (J3/S10, database_utils.py:33-41's
    in-memory catalog dicts) → broadcast-hash join in Spark.
    """
    orders, customer, nation = _t(spark, sf_dir, "orders", "customer", "nation")
    return (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"), dec_sum("o_totalprice", "sum_total"))
    )


@query(
    "semi_join_membership",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
""",
    tags=("join",),
)
def semi_join_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence membership check (J4,
    import_files_to_postgre.py:214-215 ``desc in df.values``) →
    left-semi join; never materializes the probe side's columns.
    """
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "anti_join_dedup",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
""",
    tags=("join",),
)
def anti_join_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT-EXISTS / dedup-vs-existing anti-join (J5,
    database_utils.py:128-145's duplicate-operation probe).

    Scale: left-anti against the (smaller) existing-keys side;
    in the ingest pipeline this is the skip-already-ingested check.
    """
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.4) incl. beyond-reference grouping sets.
# ---------------------------------------------------------------------------


@query(
    "multi_agg_stats",
    oracle=f"""
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price,
       {sql_dec_sum("l_extendedprice", "sum_price")},
       {sql_dec_avg("l_extendedprice", "avg_price")}
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg",),
)
def multi_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-aggregate scan: count / distinct-count / min / max / sum /
    avg in one pass (engine-added breadth over reference A1-A5).
    """
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        dec_sum("l_extendedprice", "sum_price"),
        dec_avg("l_extendedprice", "avg_price"),
    )


@query(
    "distinct_dims",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    tags=("agg",),
)
def distinct_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct catalog-key extraction (A5, database_utils.py:37,41's
    last-wins dict construction → order-free DISTINCT here).
    """
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.select("o_orderstatus", "o_orderpriority").distinct()


@query(
    "rollup_agg",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_rows, {sql_dec_sum("l_quantity", "sum_qty")}
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    tags=("agg", "rollup"),
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (engine-added; SURVEY §2.4 notes the
    reference lacks grouping sets — Spark provides them natively)."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return lineitem.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"), dec_sum("l_quantity", "sum_qty")
    )


@query(
    "cube_agg",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders, {sql_dec_sum("o_totalprice", "sum_total")}
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    tags=("agg", "cube"),
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (engine-added)."""
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"), dec_sum("o_totalprice", "sum_total")
    )


@query(
    "grouping_sets_agg",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders, {sql_dec_sum("o_totalprice", "sum_total")}
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
""",
    tags=("agg",),
)
def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL surface (engine-added)."""
    (orders,) = _t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS STRING) AS DOUBLE) AS sum_total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.7 — absent in reference; engine-added; the
# multi-file ingest loop is morally UNION ALL).
# ---------------------------------------------------------------------------


@query(
    "union_all_slices",
    oracle=f"""
SELECT o_orderstatus, COUNT(*) AS n_rows, {sql_dec_sum("o_totalprice", "sum_total")}
FROM (
  SELECT * FROM orders WHERE o_totalprice > 100000
  UNION ALL
  SELECT * FROM orders WHERE o_orderpriority = '1-URGENT'
) u
GROUP BY o_orderstatus
""",
    tags=("setop",),
)
def union_all_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two overlapping slices (duplicates preserved) —
    the per-file ingest loop (import_files_to_postgre.py:287-293)
    re-expressed as a single unioned scan.
    """
    (orders,) = _t(spark, sf_dir, "orders")
    u = orders.filter(F.col("o_totalprice") > 100000).unionAll(
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
    )
    return u.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"), dec_sum("o_totalprice", "sum_total")
    )


@query(
    "intersect_keys",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
""",
    tags=("setop",),
)
def intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) of two key sets (engine-added §2.7)."""
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderstatus") == "O")
        .select("o_custkey")
        .intersect(orders.filter(F.col("o_orderstatus") == "F").select("o_custkey"))
    )


@query(
    "except_keys",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
""",
    tags=("setop",),
)
def except_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — customers with open orders but no finished
    ones (engine-added §2.7; equivalent to the J5 anti-join on key
    sets)."""
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderstatus") == "O")
        .select("o_custkey")
        .subtract(orders.filter(F.col("o_orderstatus") == "F").select("o_custkey"))
    )


_APPROX_DISTINCT_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
       TRUE AS est_rel_err_le_0_05
FROM orders GROUP BY 1
"""


@query("approx_distinct_customers", oracle=_APPROX_DISTINCT_ORACLE,
       tags=("aggregation", "approx"))
def approx_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct (SURVEY §2.4 tail: free from Spark,
    absent in the reference). Promoted from rows-only to an
    ERROR-BOUND CERTIFICATE in r16 (r15 VERDICT item 5): the sketch
    estimate itself is engine-specific and can never hash-match, but
    the CLAIM "estimate within 5% of exact" is decidable — Spark
    computes both the HLL++ estimate (rsd=0.02) and the exact count
    per group and emits the comparison as a boolean; the oracle
    asserts the exact counts AND that every bound holds, so a sketch
    regression (wrong hashing, lost registers, merge bug) flips the
    boolean and the driver row goes red. HLL++ is deterministic for a
    given input set (register maxima commute), so the boolean is
    stable across sessions and partitionings. Measured margin:
    max per-priority relative error 1.33% across sf0.01/0.1/1."""
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("_approx"),
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("exact_customers"),
    )
    return agg.select(
        "o_orderpriority",
        "n_orders",
        "exact_customers",
        (
            F.abs(F.col("_approx") - F.col("exact_customers"))
            <= 0.05 * F.col("exact_customers")
        ).alias("est_rel_err_le_0_05"),
    )


_PIVOT_ORACLE = """
SELECT o_orderpriority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
            FILTER (o_orderstatus = 'F') AS DOUBLE) AS F,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
            FILTER (o_orderstatus = 'O') AS DOUBLE) AS O,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
            FILTER (o_orderstatus = 'P') AS DOUBLE) AS P
FROM orders GROUP BY o_orderpriority
"""


@query("pivot_status_revenue", oracle=_PIVOT_ORACLE, tags=("agg", "pivot"))
def pivot_status_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order revenue by priority × status. Explicit pivot
    values → no extra distinct-values job (at scale, ALWAYS pass the
    value list; the two-pass inference is a full extra scan). Oracle
    is the FILTER-ed aggregate desugaring."""
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum(F.col("o_totalprice").cast("decimal(25,6)")).cast("double"))
    )


_QUANTILE_ORACLE = """
SELECT l_returnflag,
       quantile_disc(l_extendedprice, 0.25) AS p25,
       quantile_disc(l_extendedprice, 0.50) AS p50,
       quantile_disc(l_extendedprice, 0.95) AS p95
FROM lineitem GROUP BY l_returnflag
"""


@query("quantile_disc_prices", oracle=_QUANTILE_ORACLE, tags=("agg", "quantile"))
def quantile_disc_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles (exact, no interpolation — the variant
    whose result is an actual data element, so cross-engine float
    identity is trivial; interpolated quantiles differ in last-ulp
    arithmetic between engines). approx_percentile is the sketch
    sibling at 100 TB."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice)").alias("p25"),
        F.expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY l_extendedprice)").alias("p50"),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY l_extendedprice)").alias("p95"),
    )


# RETIRED r13 (capacity lever, r12 VERDICT item 5 shortlist #3):
# `histogram_quantity` — fixed-width binning is a two-expression
# width_bucket over a plain one-shuffle aggregation; the genuinely
# hard histogram substance (distributed quantiles) stays oracle-faced
# in `equidepth_price_bands`, and the width_bucket-vs-desugared-CASE
# equivalence the retired oracle pinned now lives in
# tests/test_plans.py::test_width_bucket_binning_equals_desugared_case.
# Last driver row r11 hash-green. Slot reused by
# `multimodal_real_decode_roundtrip` (llm_ops.py) — the first fully
# oracle-checked REAL media decode face. Same documented-substance
# discipline as the first_match_pick (r11) and F18 (r10) retirements.


_FUZZY_ORACLE = """
WITH p AS (SELECT p_partkey, p_name FROM part WHERE p_partkey % 97 = 0)
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
FROM p a JOIN p b ON b.p_partkey = a.p_partkey + 97
WHERE levenshtein(a.p_name, b.p_name) <= 25
"""


@query("fuzzy_name_distance", oracle=_FUZZY_ORACLE, tags=("text", "fuzzy"))
def fuzzy_name_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching over product names — the robust
    form of the reference's exact name-keyed joins (J1/J4 break on
    typos; levenshtein-with-threshold is the standard fix). Pairing is
    key-adjacent to keep the check O(n); a full fuzzy self-join at
    scale would block on length + token prefixes first."""
    part = load_table(spark, sf_dir, "part")
    p = part.filter(F.col("p_partkey") % 97 == 0).select("p_partkey", "p_name")
    a = p.select(F.col("p_partkey").alias("key_a"), F.col("p_name").alias("_na"))
    b = p.select(F.col("p_partkey").alias("key_b"), F.col("p_name").alias("_nb"))
    return (
        a.join(b, F.col("key_b") == F.col("key_a") + 97)
        .withColumn("edit_dist", F.levenshtein("_na", "_nb"))
        .filter(F.col("edit_dist") <= 25)
        .select("key_a", "key_b", "edit_dist")
    )


# Hash-threshold stratified sampling, replayed exactly: keep an event
# iff the first 32 bits of md5(event_id) — a uniform u32 both engines
# compute identically — fall under the stratum's rate × 2³².
_STRAT_SAMPLE_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
                < CASE event_type WHEN 'click' THEN 2147483648
                                  WHEN 'view' THEN 429496729
                                  ELSE 4294967296 END
                THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
FROM events GROUP BY 1
"""


@query("stratified_sample_events", oracle=_STRAT_SAMPLE_ORACLE, tags=("sampling",))
def stratified_sample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling — the corpus-downsampling primitive for
    training-data pipelines (click 50%, view 10%, everything else
    kept). Promoted from rows-only to a FULL oracle in r16 (r15
    VERDICT item 5) by moving from ``sampleBy`` to HASH-THRESHOLD
    sampling: keep an event iff the first 32 bits of md5(event_id)
    fall under rate·2³². That is not just an oracle trick — it is the
    sampler a 100 TB pipeline actually wants: membership is a pure
    function of the ROW (partition-layout-free, so re-runs, retries,
    engine swaps and incremental reprocessing all select the same
    rows), strata rates are exact in expectation with the same
    Bernoulli statistics, and the sample is refinable (rate 0.1 is a
    strict subset of rate 0.5 under the same hash). ``sampleBy``'s
    per-partition RNG draws — membership changes with partitioning —
    stay covered by unit tests as the quick-and-local alternative.
    DuckDB replays the identical md5 threshold, so per-stratum totals
    AND sampled counts are checked exactly."""
    events = load_table(spark, sf_dir, "events")
    u32 = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    threshold = (
        F.when(F.col("event_type") == "click", F.lit(2147483648))
        .when(F.col("event_type") == "view", F.lit(429496729))
        .otherwise(F.lit(4294967296))
    )
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(u32 < threshold, 1).otherwise(0))
        .cast("long")
        .alias("n_sampled"),
    )


_FULL_OUTER_ORACLE = """
SELECT CASE WHEN c_custkey IS NULL THEN 'events_only'
            WHEN user_id IS NULL THEN 'customers_only'
            ELSE 'both' END AS presence,
       COUNT(*) AS n
FROM customer
FULL OUTER JOIN (SELECT DISTINCT user_id FROM events) e
  ON c_custkey = user_id
GROUP BY 1
"""


@query("full_outer_reconciliation", oracle=_FULL_OUTER_ORACLE, tags=("join", "outer"))
def full_outer_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-system reconciliation via FULL OUTER join: customers vs
    distinct event actors, bucketed into both / left-only / right-only.
    Completes the outer-join family (left/semi/anti were covered in
    round 1; full outer is the audit/reconciliation workhorse). The
    event side collapses to distinct keys BEFORE the join — full outer
    cannot broadcast (both sides preserved), so it shuffles both
    sides; shrinking the probe side first is the scale move."""
    customer = load_table(spark, sf_dir, "customer")
    ev_users = load_table(spark, sf_dir, "events").select("user_id").distinct()
    joined = customer.select("c_custkey").join(
        ev_users, customer["c_custkey"] == ev_users["user_id"], "full_outer"
    )
    presence = (
        F.when(F.col("c_custkey").isNull(), "events_only")
        .when(F.col("user_id").isNull(), "customers_only")
        .otherwise("both")
    )
    return joined.groupBy(presence.alias("presence")).agg(
        F.count(F.lit(1)).alias("n")
    )


# Typo'd corpus for the fuzzy join: every sampled part name plus a copy
# with one substituted character ('z' at a key-derived position).
_TYPO_CORPUS_SQL = """
  SELECT p_partkey AS sid, p_name AS s FROM part WHERE p_partkey % 5 = 0
  UNION ALL
  SELECT p_partkey + 1000000000000 AS sid,
         substr(p_name, 1, CAST(p_partkey % length(p_name) AS INTEGER))
           || 'z'
           || substr(p_name, CAST(p_partkey % length(p_name) AS INTEGER) + 2)
           AS s
  FROM part WHERE p_partkey % 5 = 0
"""

# Full relational replay of the CAPPED symmetric-delete pipeline
# (r15 VERDICT item 2): depth-1 delete-neighborhood buckets, the
# bucket_candidate_pairs cap semantics (≤ _FUZZY_CAP members →
# in-bucket all-pairs; above it → star pairs against the bucket-min
# anchor only), candidate dedup, exact levenshtein verify. DuckDB
# independently executes every algorithmic step, so the equivalence is
# checked exactly at ANY scale — including where the cap binds (the
# pre-r16 oracle was the exact O(n²) scan, equivalent only while every
# bucket stayed under the cap; at sf1 the 625-member same-name groups
# made the uncapped face emit 32M pairs / 92 s).
_FUZZY_CAP = 64

_FUZZY_JOIN_ORACLE = f"""
WITH corpus AS ({_TYPO_CORPUS_SQL}),
nb AS (
  SELECT sid, unnest(list_distinct(list_prepend(s,
           list_transform(range(1, length(s) + 1),
             i -> substr(s, 1, i - 1) || substr(s, i + 1))))) AS bucket
  FROM corpus
),
bstat AS (
  SELECT bucket, COUNT(*) AS c, MIN(sid) AS anchor FROM nb GROUP BY 1
),
cand AS (
  SELECT DISTINCT id_a, id_b FROM (
    SELECT a.sid AS id_a, b.sid AS id_b
    FROM nb a
    JOIN nb b ON a.bucket = b.bucket AND a.sid < b.sid
    JOIN bstat st ON st.bucket = a.bucket
    WHERE st.c <= {_FUZZY_CAP}
    UNION ALL
    SELECT st.anchor AS id_a, nb.sid AS id_b
    FROM nb JOIN bstat st ON st.bucket = nb.bucket
    WHERE st.c > {_FUZZY_CAP} AND nb.sid <> st.anchor
  )
)
SELECT c.id_a, c.id_b,
       CAST(levenshtein(ca.s, cb.s) AS INTEGER) AS edit_dist
FROM cand c
JOIN corpus ca ON ca.sid = c.id_a
JOIN corpus cb ON cb.sid = c.id_b
WHERE levenshtein(ca.s, cb.s) <= 1
"""


@query("fuzzy_join_symdelete", oracle=_FUZZY_JOIN_ORACLE, tags=("text", "fuzzy", "join"))
def fuzzy_join_symdelete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy self-join (edit distance ≤ 1) over part names with
    planted single-character typos — symmetric-delete blocking + exact
    levenshtein verify (operators/fuzzyjoin.py), bucket expansion
    capped at {cap} (r15 VERDICT item 2: the corpus has only 64
    distinct part names, so same-name groups grow linearly with SF and
    the uncapped pair set grows QUADRATICALLY — 125k pairs at sf0.1,
    32M at sf1/92 s wall; with the anchor-star cap the emitted set is
    linear in group size and every member stays connected to its
    group's anchor at dist 0, the keep-one/components contract). The
    oracle replays the capped pipeline relationally (see
    _FUZZY_JOIN_ORACLE), so the equivalence is exact at any SF —
    below the cap it degenerates to the exact pair list (sf0.01
    buckets are ~6-12 deep; the r1-r15 green rows' basis is a strict
    subset of this one). Recall trade where the cap binds, documented:
    a dist-1 pair whose every shared bucket exceeds the cap surfaces
    only through its anchor edges, not directly. Complements
    fuzzy_name_distance, which only checks key-adjacent pairs."""
    from pythondataingestionprocess_spark.operators.fuzzyjoin import fuzzy_self_join

    part = load_table(spark, sf_dir, "part")
    sampled = part.filter(F.col("p_partkey") % 5 == 0)
    typos = sampled.select(
        (F.col("p_partkey") + 1000000000000).alias("sid"),
        F.concat(
            F.expr("substr(p_name, 1, CAST(p_partkey % length(p_name) AS INT))"),
            F.lit("z"),
            F.expr("substr(p_name, CAST(p_partkey % length(p_name) AS INT) + 2)"),
        ).alias("s"),
    )
    corpus = sampled.select(
        F.col("p_partkey").alias("sid"), F.col("p_name").alias("s")
    ).unionAll(typos)
    return fuzzy_self_join(corpus, "sid", "s", max_dist=1, bucket_cap=_FUZZY_CAP)


_EQUIDEPTH_ORACLE = """
WITH b AS (
  SELECT l_extendedprice,
         ntile(8) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber)
           AS band
  FROM lineitem
)
SELECT band,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(l_extendedprice) AS lo,
       MAX(l_extendedprice) AS hi
FROM b GROUP BY band ORDER BY band
"""


@query("equidepth_price_bands", oracle=_EQUIDEPTH_ORACLE, tags=("window", "quantile"))
def equidepth_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH price bands via NTILE(8) — the complement of the
    fixed-width histogram (equal-population buckets with data-driven
    edges, the binning a feature-discretization step uses). NTILE
    assigns by row position, so the ORDER BY is made a TOTAL order
    ((price, orderkey, linenumber)) — on price ties, engines would
    otherwise split the tie-group across band boundaries differently.

    Scale note: a global NTILE is a single-partition sort — fine for
    a stats/profiling query, wrong inside a hot path; at 100 TB the
    same result comes from quantile_disc cut points + a width_bucket
    join (both already in the registry). This query exists to pin the
    NTILE window shape itself."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    from pyspark.sql import Window as W

    band = F.ntile(8).over(
        W.orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
    )
    return (
        lineitem.select(F.col("l_extendedprice"), band.alias("band"))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
        .orderBy("band")
    )


# ---------------------------------------------------------------------------
# UNPIVOT / melt: the wide→long reshape (inverse of pivot_status_revenue).
# ---------------------------------------------------------------------------

_UNPIVOT_ORACLE = """
WITH charges AS (
  SELECT l_returnflag,
         CAST(l_extendedprice AS DECIMAL(25,6)) AS base_price,
         CAST(l_extendedprice * l_discount AS DECIMAL(25,6)) AS discount_amt,
         CAST(l_extendedprice * (1 - l_discount) * l_tax AS DECIMAL(25,6)) AS tax_amt
  FROM lineitem
),
long AS (
  SELECT l_returnflag, 'base_price' AS component, base_price AS amount FROM charges
  UNION ALL
  SELECT l_returnflag, 'discount_amt', discount_amt FROM charges
  UNION ALL
  SELECT l_returnflag, 'tax_amt', tax_amt FROM charges
)
SELECT l_returnflag, component,
       COUNT(*) AS n_rows,
       CAST(SUM(amount) AS DOUBLE) AS total_amount
FROM long
GROUP BY 1, 2
"""


@query("unpivot_charge_components", oracle=_UNPIVOT_ORACLE, tags=("reshape", "unpivot", "agg"))
def unpivot_charge_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (the inverse of `pivot_status_revenue`): each
    lineitem's three charge components (base price, discount amount,
    tax amount) melt into (component, amount) rows via the native
    ``DataFrame.unpivot`` — Catalyst's Expand node, one pass over the
    input, no self-union — then roll up per (returnflag, component).

    The oracle spells the same reshape as a 3-way UNION ALL (the
    portable form); component amounts are decimal-exact BEFORE the
    melt so the long sums hash-match. Scale: Expand multiplies rows
    map-side (3× here) ahead of the output-grain exchange — the
    shuffle carries 15 groups, never the melted rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    ep, disc, tax = F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")
    charges = li.select(
        "l_returnflag",
        ep.cast("decimal(25,6)").alias("base_price"),
        (ep * disc).cast("decimal(25,6)").alias("discount_amt"),
        (ep * (1 - disc) * tax).cast("decimal(25,6)").alias("tax_amt"),
    )
    long = charges.unpivot(
        ["l_returnflag"],
        ["base_price", "discount_amt", "tax_amt"],
        "component",
        "amount",
    )
    return long.groupBy("l_returnflag", "component").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("amount").cast("double").alias("total_amount"),
    )
