"""Round-5 classic OLAP shapes (TPC-H Q4/Q5/Q8/Q10/Q13/Q14/Q18/Q21),
re-expressed on the partsupp-free testdata, plus the containment-dedup
screen.

The reference has no query language (SURVEY §3); like ``subqueries.py``
these are beyond-reference surface — the remaining partsupp-free TPC-H
plan shapes the registry lacked after round 4 (VERDICT r4 next-round
items 2-3 name Q21 and Q13 explicitly). Schema adaptations, applied
consistently on BOTH the Spark plan and the DuckDB oracle so the
correctness gate still bites:

- lineitem has no commitdate/receiptdate → "late" is re-expressed as
  ``l_shipdate > o_orderdate + INTERVAL <n> DAY`` (Q21's triple
  self-join and Q4's correlated non-equi EXISTS keep their exact plan
  shapes; only the lateness predicate differs).
- orders has no comment column → Q13's ON-clause exclusion filter uses
  ``o_orderpriority NOT LIKE '%SPECIFIED%'`` instead of the comment
  regex. The point of Q13 — the predicate lives in the LEFT JOIN's ON
  clause, so excluded orders count as zero, not as missing customers —
  is preserved.
- p_type is a flat 6-value enum → Q8/Q14's type predicate is equality.

Spark-first notes (what the plans should look like at 100 TB):

- Q21 is the hardest decorrelation test here: EXISTS + NOT EXISTS over
  the same fact at the same key become one left-semi and one left-anti
  hash join on l_orderkey — never a nested-loop re-scan per row. The
  non-equi part (suppkey != suppkey) rides the equi-join as a join
  residual.
- Q4's EXISTS correlates on BOTH o_orderkey (equi) and o_orderdate
  (non-equi lateness) — Catalyst plans it as a semi join keyed on
  orderkey with the date comparison as residual; the quarter filter
  pushes to the orders scan so the semi probe side is tiny.
- Q13 must NOT pre-aggregate orders before the outer join (that would
  turn customers-with-zero-orders into NULL groups); the left join
  runs first, count(o_orderkey) skips nulls, then the second, tiny
  aggregation groups the distribution.
- Q5/Q8/Q10 are star joins: dims (supplier/nation/region) broadcast,
  the fact chain shuffles once per equi-key. Q8's market share is a
  ratio of two decimal sums in ONE aggregation pass (CASE inside SUM),
  not two scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pythondataingestionprocess_spark.catalog import load_table
from pythondataingestionprocess_spark.plans.registry import (
    dec_sum,
    query,
    sql_dec_sum,
)


def _t(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)


_REV = "l_extendedprice * (1 - l_discount)"


def _rev() -> Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------------------
# TPC-H Q21: suppliers who kept multi-supplier orders waiting.
# ---------------------------------------------------------------------------

_Q21_ORACLE = """
WITH late AS (
  SELECT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
    AND l.l_shipdate > o.o_orderdate + INTERVAL 180 DAY
)
SELECT s_name, n_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM late l1
JOIN supplier ON s_suppkey = l1.l_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
  AND NOT EXISTS (
        SELECT 1 FROM lineitem l3 JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o3.o_orderdate + INTERVAL 180 DAY
      )
GROUP BY s_name, n_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


@query("q21_waiting_suppliers", oracle=_Q21_ORACLE, tags=("subquery", "semi", "anti", "join"))
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: the SOLE late supplier in a finished multi-supplier
    order, counted per supplier — the registry's hardest decorrelation
    shape (EXISTS + NOT EXISTS over the same fact, same key). "Late"
    is shipdate > orderdate + 180d (no commit/receipt dates in this
    schema; reference anchor for existence probes:
    database_utils.py:128-145, generalized).

    Spark-first: both existence checks become HASH joins on
    l_orderkey (left-semi for EXISTS, left-anti for NOT EXISTS) with
    the suppkey inequality as a join residual — no per-row re-scan,
    no nested loop. The late set is computed once and feeds both the
    probe side and the anti build side; supplier/nation are broadcast
    dims; ORDER BY (numwait DESC, s_name) is total so LIMIT 100 is
    deterministic."""
    lineitem, orders, supplier, nation = _t(
        spark, sf_dir, "lineitem", "orders", "supplier", "nation"
    )
    late = (
        lineitem.join(
            orders.filter(F.col("o_orderstatus") == "F").select(
                "o_orderkey", "o_orderdate"
            ),
            lineitem["l_orderkey"] == F.col("o_orderkey"),
        )
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 180 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    others = lineitem.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
    )
    late_others = late.select(
        F.col("l_orderkey").alias("o3_orderkey"),
        F.col("l_suppkey").alias("o3_suppkey"),
    )
    waiting = (
        late.join(
            others,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("l_orderkey") == F.col("o3_orderkey"))
            & (F.col("l_suppkey") != F.col("o3_suppkey")),
            "left_anti",
        )
    )
    return (
        waiting.join(
            F.broadcast(supplier), waiting["l_suppkey"] == supplier["s_suppkey"]
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name", "n_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# TPC-H Q13: customer order-count distribution (filtered-ON left join).
# ---------------------------------------------------------------------------

_Q13_ORACLE = """
WITH c_orders AS (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '%SPECIFIED%'
  GROUP BY c_custkey
)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM c_orders GROUP BY c_count
"""


@query("q13_order_count_distribution", oracle=_Q13_ORACLE, tags=("join", "agg", "outer"))
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: how many customers placed exactly N qualifying
    orders — including N = 0. The load-bearing subtlety is WHERE the
    exclusion predicate lives: in the LEFT JOIN's ON clause, so a
    customer whose every order is excluded still appears with count 0
    (a WHERE clause would delete them; a pre-aggregated orders side
    would too). COUNT(o_orderkey) skips the null-extended rows for
    free. Two aggregations: a big one on c_custkey (one shuffle at
    fact grain), then a ~20-group distribution rollup."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    joined = customer.join(
        orders,
        (customer["c_custkey"] == orders["o_custkey"])
        & (~orders["o_orderpriority"].like("%SPECIFIED%")),
        "left",
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


# ---------------------------------------------------------------------------
# TPC-H Q4: order-priority counts gated by a correlated non-equi EXISTS.
# ---------------------------------------------------------------------------

_Q4_ORACLE = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
  AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY
      )
GROUP BY o_orderpriority
"""


@query("q4_priority_order_checks", oracle=_Q4_ORACLE, tags=("subquery", "semi", "agg"))
def q4_priority_order_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: orders from one quarter that had at least one line
    ship >90 days after ordering, counted per priority. The EXISTS
    correlates on o_orderkey (equi) AND o_orderdate (non-equi) — the
    shape nothing else in the registry covers: Catalyst plans it as a
    left-semi HASH join keyed on orderkey with the date comparison as
    a residual, and the quarter filter pushes to the orders parquet
    scan so the probe side is one quarter, not the full table."""
    orders, lineitem = _t(spark, sf_dir, "orders", "lineitem")
    quarter = orders.filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    return (
        quarter.join(
            lineitem,
            (quarter["o_orderkey"] == lineitem["l_orderkey"])
            & (
                lineitem["l_shipdate"]
                > quarter["o_orderdate"] + F.expr("INTERVAL 90 DAYS")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q5: revenue through LOCAL suppliers per nation of one region.
# ---------------------------------------------------------------------------

_Q5_ORACLE = f"""
SELECT n_name, {sql_dec_sum(_REV, "revenue")}
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
GROUP BY n_name
"""


@query("q5_local_supplier_volume", oracle=_Q5_ORACLE, tags=("join", "agg", "star"))
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 1996 revenue per ASIA nation counting only LOCAL
    fulfilment — the supplier join carries TWO conditions (line's
    suppkey AND customer's nation = supplier's nation), which is what
    distinguishes this from a plain star rollup. Spark-first: the
    fact chain customer⋈orders⋈lineitem shuffles on its equi-keys
    with the year filter pushed to the orders scan; supplier, nation
    and region are broadcast dims, so the locality condition is a
    residual on a broadcast probe — no extra shuffle for it."""
    customer, orders, lineitem, supplier, nation, region = _t(
        spark, sf_dir,
        "customer", "orders", "lineitem", "supplier", "nation", "region",
    )
    year = orders.filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    return (
        customer.join(year, customer["c_custkey"] == year["o_custkey"])
        .join(lineitem, F.col("o_orderkey") == lineitem["l_orderkey"])
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == supplier["s_suppkey"])
            & (F.col("c_nationkey") == supplier["s_nationkey"]),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(dec_sum(_rev(), "revenue"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q8: one nation's market share inside a region, per year.
# ---------------------------------------------------------------------------

_Q8_ORACLE = """
WITH all_sales AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    AND o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1997-01-01'
)
SELECT o_year,
       CAST(CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END
                     AS DECIMAL(25,6))) AS STRING) AS DOUBLE)
       / CAST(CAST(SUM(CAST(volume AS DECIMAL(25,6))) AS STRING) AS DOUBLE) AS mkt_share
FROM all_sales GROUP BY o_year
"""


@query("q8_market_share", oracle=_Q8_ORACLE, tags=("join", "agg", "ratio", "star"))
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_3's share of AMERICA-region ECONOMY-part
    revenue per order year — a ratio of conditional sums over an
    8-table star (nation joined TWICE: customer side filters the
    region, supplier side labels the seller). Both sums ride ONE
    aggregation pass (CASE inside SUM) on one fact scan. Determinism:
    exact decimal sums on both sides, a single IEEE division — the
    registry's ratio-of-sums convention."""
    part, lineitem, orders, customer, supplier, nation, region = _t(
        spark, sf_dir,
        "part", "lineitem", "orders", "customer", "supplier", "nation", "region",
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    sales = (
        part.filter(F.col("p_type") == "ECONOMY")
        .join(lineitem, part["p_partkey"] == lineitem["l_partkey"])
        .join(
            orders.filter(
                (F.col("o_orderdate") >= "1995-01-01")
                & (F.col("o_orderdate") < "1997-01-01")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(customer, F.col("o_custkey") == customer["c_custkey"])
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(region), F.col("c_rkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "AMERICA")
        .join(F.broadcast(supplier), F.col("l_suppkey") == supplier["s_suppkey"])
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            _rev().alias("volume"),
            "supp_nation",
        )
    )
    return sales.groupBy("o_year").agg(
        (
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
                .otherwise(0)
                .cast("decimal(25,6)")
            ).cast("double")
            / F.sum(F.col("volume").cast("decimal(25,6)")).cast("double")
        ).alias("mkt_share")
    )


# ---------------------------------------------------------------------------
# TPC-H Q10: top returning customers by lost revenue.
# ---------------------------------------------------------------------------

_Q10_ORACLE = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       {sql_dec_sum(_REV, "revenue")}
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("q10_returned_items", oracle=_Q10_ORACLE, tags=("join", "agg", "topk"))
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: the 20 customers who returned the most revenue in
    one quarter. The returnflag filter pushes to the lineitem scan and
    the quarter filter to the orders scan BEFORE the join, so the
    fact⋈fact shuffle carries only returned lines of one quarter;
    nation broadcasts. (revenue DESC, c_custkey) is a total order, so
    the LIMIT is deterministic."""
    customer, orders, lineitem, nation = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "nation"
    )
    quarter = orders.filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    returned = lineitem.filter(F.col("l_returnflag") == "R")
    return (
        customer.join(quarter, customer["c_custkey"] == quarter["o_custkey"])
        .join(returned, F.col("o_orderkey") == returned["l_orderkey"])
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dec_sum(_rev(), "revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TPC-H Q14: promo revenue share over one month.
# ---------------------------------------------------------------------------

_Q14_ORACLE = f"""
SELECT 100.0 * CAST(CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                                  THEN {_REV} ELSE 0 END
                          AS DECIMAL(25,6))) AS STRING) AS DOUBLE)
       / CAST(CAST(SUM(CAST({_REV} AS DECIMAL(25,6))) AS STRING) AS DOUBLE) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= DATE '1996-03-01' AND l_shipdate < DATE '1996-04-01'
"""


@query("q14_promo_revenue", oracle=_Q14_ORACLE, tags=("join", "agg", "ratio"))
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: percent of one month's revenue from PROMO parts.
    One broadcast join (part is the small side), one aggregation pass
    holding both conditional sums, one IEEE division ordered exactly
    as the oracle's (100·promo)/total — no second scan, no
    shuffle beyond the single 1-row aggregate."""
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    month = lineitem.filter(
        (F.col("l_shipdate") >= "1996-03-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    joined = month.join(
        F.broadcast(part), month["l_partkey"] == part["p_partkey"]
    )
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", _rev()).otherwise(0).cast("decimal(25,6)")
    ).cast("double")
    total = F.sum(_rev().cast("decimal(25,6)")).cast("double")
    return joined.agg((F.lit(100.0) * promo / total).alias("promo_pct"))


# ---------------------------------------------------------------------------
# TPC-H Q18: large-volume orders joined back to their customers.
# ---------------------------------------------------------------------------

_Q18_ORACLE = """
WITH big AS (
  SELECT l_orderkey,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS STRING) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(25,6))) > 140
)
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       o_totalprice, sum_qty
FROM big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


@query("q18_large_volume_customers", oracle=_Q18_ORACLE, tags=("join", "agg", "having", "topk"))
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds 140 (the
    schema's high tail; spec uses 300 at 7 lines/order — this data
    averages 4), joined back to order + customer detail. The HAVING
    runs on the DECIMAL aggregate itself (exact comparison, no
    double-rounding flake at the threshold boundary); the join-back
    is keyed on the aggregate's own grain so no re-shuffle of the
    fact; (o_totalprice DESC, o_orderkey) totalizes the LIMIT."""
    lineitem, orders, customer = _t(
        spark, sf_dir, "lineitem", "orders", "customer"
    )
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(25,6)")).alias("_dq"))
        .filter(F.col("_dq") > 140)
        .select("l_orderkey", F.col("_dq").cast("double").alias("sum_qty"))
    )
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(customer, F.col("o_custkey") == customer["c_custkey"])
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Containment dedup: asymmetric near-superset screen on word trigrams.
# ---------------------------------------------------------------------------

_CONTAINMENT_ORACLE = """
WITH sh AS (
  SELECT DISTINCT doc_id,
    unnest(list_transform(list_zip(w, w[2:], w[3:]),
           z -> z[1] || ' ' || z[2] || ' ' || z[3])[:greatest(len(w)-2,0)]) AS g
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents)
),
sizes AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY 1),
pairs AS (
  SELECT a.doc_id id_a, b.doc_id id_b, COUNT(*) inter
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, inter * 1.0 / least(s1.n, s2.n) AS containment
FROM pairs
JOIN sizes s1 ON id_a = s1.doc_id
JOIN sizes s2 ON id_b = s2.doc_id
WHERE inter * 1.0 / least(s1.n, s2.n) >= 0.8
"""


@query("dedup_containment", oracle=_CONTAINMENT_ORACLE, tags=("dedup",))
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-trigram CONTAINMENT pairs at ≥0.8: |A∩B| / min(|A|,|B|) —
    the asymmetric near-superset screen (short doc embedded whole in
    a long one) that the Jaccard queries structurally miss. Same
    shared-shingle blocking join as dedup_ngram_jaccard; only the
    denominator differs. See operators/dedup.py:containment_pairs
    for the 100 TB notes."""
    from pythondataingestionprocess_spark.operators import dedup as dd

    docs = load_table(spark, sf_dir, "documents")
    sh = dd.shingle_sets(docs, "doc_id", "text", 3)
    return dd.containment_pairs(sh, "doc_id", 0.8)


# ---------------------------------------------------------------------------
# TPC-H Q9: profit per supplier nation per order year.
# ---------------------------------------------------------------------------

_PROFIT = f"{_REV} - 0.6 * p_retailprice * l_quantity"

_Q9_ORACLE = f"""
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       {sql_dec_sum(_PROFIT, "profit")}
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE contains(p_name, 'gear')
GROUP BY 1, 2
"""


@query("q9_profit_by_nation_year", oracle=_Q9_ORACLE, tags=("join", "agg", "star"))
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit on one product line ('gear' parts) per supplier nation per
    order year. Cost is re-expressed as 0.6·p_retailprice·l_quantity
    (no partsupp/ps_supplycost in this schema); the p_name substring ('gear')
    filter and the two-key (nation, year) rollup keep the plan shape —
    a 5-table star whose fact⋈fact chain (lineitem⋈orders) shuffles
    once while part/supplier/nation broadcast, with the part filter
    cutting the probe BEFORE the join.

    Determinism: the per-row profit expression is identical IEEE
    double arithmetic in both engines (left-associative products, same
    0.6 literal; magnitudes ~1e5, far under the 1e10 product-rounding
    divergence band), then the decimal-sum convention."""
    lineitem, part, supplier, orders, nation = _t(
        spark, sf_dir, "lineitem", "part", "supplier", "orders", "nation"
    )
    gear = part.filter(F.col("p_name").contains("gear")).select(
        "p_partkey", "p_retailprice"
    )
    profit = _rev() - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        lineitem.join(F.broadcast(gear), lineitem["l_partkey"] == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == supplier["s_suppkey"])
        .join(orders, F.col("l_orderkey") == orders["o_orderkey"])
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(dec_sum(profit, "profit"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q3: shipping priority — top unshipped orders by revenue.
# ---------------------------------------------------------------------------

_Q3_ORACLE = f"""
SELECT l_orderkey,
       {sql_dec_sum(_REV, "revenue")},
       strftime(o_orderdate, '%Y-%m-%d') AS order_date
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < DATE '1998-03-15'
  AND l_shipdate > DATE '1998-03-15'
GROUP BY l_orderkey, order_date
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("q3_shipping_priority", oracle=_Q3_ORACLE, tags=("join", "agg", "topk"))
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: the 10 highest-revenue orders from one market segment
    placed before a cutoff but not yet fully shipped at it (no
    o_shippriority column in this schema — the output just drops it;
    the plan shape is intact).

    Spark-first: the segment filter makes customer a MEMBERSHIP test,
    not an enrich — a left-SEMI join (no customer columns in the
    output), so the orders side never widens; the date filters push
    into both scans; the single shuffle is the groupBy on the
    aggregate's own (l_orderkey, o_orderdate) grain; (revenue DESC,
    l_orderkey) totalizes the LIMIT. Revenue is exact-decimal summed
    then cast once (dec_sum convention), so the DESC sort can't flake
    on accumulation order."""
    customer, orders, lineitem = _t(
        spark, sf_dir, "customer", "orders", "lineitem"
    )
    cust = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey"
    )
    # Deliberately NO broadcast hint on the customer side: customer
    # scales with the fact tables (a fifth of all customers is
    # billions of keys at 100 TB), so the semi join must be free to
    # fall back to a shuffled hash join — AQE broadcasts it while it
    # fits (it does at test SF; the plan guard pins only the SEMI
    # shape, not the exchange strategy).
    ords = (
        orders.filter(F.col("o_orderdate") < "1998-03-15")
        .join(cust, F.col("o_custkey") == F.col("c_custkey"), "leftsemi")
        .select("o_orderkey", "o_orderdate")
    )
    return (
        lineitem.filter(F.col("l_shipdate") > "1998-03-15")
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
        .agg(dec_sum(_rev(), "revenue"))
        .select("l_orderkey", "revenue", "order_date")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# TPC-H Q6: forecast revenue change — the pure pushdown scan-agg.
# ---------------------------------------------------------------------------

_Q6_ORACLE = f"""
SELECT {sql_dec_sum("l_extendedprice * l_discount", "forecast_revenue")},
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@query("q6_forecast_revenue", oracle=_Q6_ORACLE, tags=("agg", "pushdown"))
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: revenue that would be gained by eliminating small
    discounts on small-quantity lines in one year — the canonical
    scan-dominated aggregate. The whole query is one pass: all three
    predicates reach the parquet scan as PushedFilters (range on
    l_shipdate/l_discount/l_quantity), the projection prunes to four
    columns, and the 1-row aggregate is map-side partial + single
    final. The 0.05/0.07 bounds compare the same double literals in
    both engines (no decimal re-rounding at the boundary); the sum is
    dec_sum-exact. n_lines pins the selectivity so a silently
    mis-pushed filter can't hash-collide its way past the gate."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dec_sum(
                F.col("l_extendedprice") * F.col("l_discount"),
                "forecast_revenue",
            ),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q12: lateness bands × order-priority class (shipmode-free).
# ---------------------------------------------------------------------------

_Q12_ORACLE = """
SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 120 DAY
            THEN 'LATE' ELSE 'ONTIME' END AS ship_band,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
GROUP BY 1
ORDER BY 1
"""


@query("q12_lateness_priority", oracle=_Q12_ORACLE, tags=("join", "agg", "conditional"))
def q12_lateness_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: line counts split by order-priority class
    within each lateness band. The schema has no l_shipmode, so the
    grouping key is the lateness band itself (shipdate vs
    orderdate+120d, the repo's standard lateness re-expression) —
    what Q12 actually exercises survives: a fact⋈fact equi-join whose
    GROUP BY key is a derived CASE over BOTH sides' columns, with the
    priority split as conditional counts inside one aggregation pass
    (no second scan, no pivot).

    Spark-first: the year filter pushes to the lineitem scan before
    the join; the join shuffles on o_orderkey once; the 2-group
    aggregate is map-side partial."""
    orders, lineitem = _t(spark, sf_dir, "orders", "lineitem")
    year = lineitem.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    band = F.when(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 120 DAY"),
        "LATE",
    ).otherwise("ONTIME")
    return (
        orders.join(year, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(band.alias("ship_band"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("ship_band")
    )


# ---------------------------------------------------------------------------
# TPC-H Q2: minimum-cost supplier per part within a region — the last
# uncovered Q-number (r14 VERDICT item 4). The testdata ships no
# partsupp, so the supply relation is DERIVED from lineitem the same
# way q11/q16/q20 derive it: ps_supplycost := the best (minimum) unit
# price each supplier ever quoted for the part,
# MIN(l_extendedprice / l_quantity) per (partkey, suppkey). The plan
# shape Q2 actually exercises survives intact: a correlated scalar
# MIN subquery over the supply relation (correlated only on partkey)
# joined through the part/supplier/nation/region star with a region
# filter on BOTH the outer block and the subquery.
# ---------------------------------------------------------------------------

_Q2_ORACLE = """
WITH supply AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         MIN(l_extendedprice / l_quantity) AS ps_supplycost
  FROM lineitem GROUP BY 1, 2
), euro AS (
  SELECT ps_partkey, ps_suppkey, ps_supplycost, s_acctbal, s_name, n_name
  FROM supply
  JOIN supplier ON s_suppkey = ps_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
       ps_suppkey AS s_suppkey, ps_supplycost AS supplycost
FROM part JOIN euro ON p_partkey = ps_partkey
WHERE p_size <= 15 AND p_type = 'MEDIUM'
  AND ps_supplycost = (
    SELECT MIN(e2.ps_supplycost) FROM euro e2
    WHERE e2.ps_partkey = p_partkey
  )
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey
LIMIT 100
"""


@query("q2_min_cost_supplier", oracle=_Q2_ORACLE,
       tags=("subquery", "correlated", "star", "topk"))
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2: for each qualifying part, the EUROPE supplier(s)
    quoting the minimum supply cost — correlated scalar MIN subquery
    + 4-dim star, the composition q17 (correlated scalar) and q5/q8
    (multi-dim stars) each cover alone.

    Spark-first decorrelation (what the 100 TB plan must be):

    - The supply relation is ONE fact aggregation — lineitem shuffles
      once on (l_partkey, l_suppkey). MIN(price/qty) is
      order-independent IEEE double, bit-identical on both engines.
    - supplier⋈nation⋈region reduces to a broadcast-able supplier→
      (acctbal, name, nation) map BEFORE touching the fact: region
      and nation broadcast into supplier, the filtered result
      broadcasts into the supply agg — the fact is never shuffled a
      second time for dims.
    - The part filter (p_size, p_type) SEMI-prunes the supply
      relation before the correlated MIN is evaluated: the subquery
      correlates only on partkey, so restricting to qualifying parts
      first is semantics-preserving and cuts the min-agg input by
      ~25x (Catalyst can't do this rewrite itself — the subquery
      would otherwise aggregate every part).
    - The correlated scalar MIN decorrelates to a PARTITIONED WINDOW
      over the aggregated supply relation (min over partkey, filter
      equality — tie-keeping), NOT a self-join back on partkey: the
      self-join form plans the whole supply subtree twice (two fact
      scans + an SMJ — measured on this plan before the rewrite).
      The window's exchange moves only the aggregated pairs, orders
      of magnitude smaller than the fact.
    - LIMIT 100 under a TOTAL order (suppkey breaks any cost tie), so
      the kept set is deterministic; TakeOrderedAndProject caps
      driver-side state at k rows per partition.
    """
    from pyspark.sql import Window as W

    part, supplier, nation, region, lineitem = _t(
        spark, sf_dir, "part", "supplier", "nation", "region", "lineitem"
    )
    euro_supp = (
        supplier
        .join(F.broadcast(nation),
              supplier["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
              nation["n_regionkey"] == region["r_regionkey"])
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    good_parts = part.filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "MEDIUM")
    ).select("p_partkey", "p_brand")
    supply = (
        lineitem
        .join(F.broadcast(good_parts.select("p_partkey")),
              lineitem["l_partkey"] == F.col("p_partkey"), "left_semi")
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity"))
             .alias("ps_supplycost"))
        .join(F.broadcast(euro_supp),
              F.col("ps_suppkey") == F.col("s_suppkey"))
    )
    min_cost = F.min("ps_supplycost").over(W.partitionBy("ps_partkey"))
    return (
        supply
        .withColumn("min_cost", min_cost)
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .join(F.broadcast(good_parts),
              F.col("ps_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            F.col("ps_suppkey").alias("s_suppkey"),
            F.col("ps_supplycost").alias("supplycost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name",
                 "p_partkey", "s_suppkey")
        .limit(100)
    )
