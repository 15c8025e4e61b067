"""Statement-grammar queries (SURVEY.md §2.8 F1/F2/F4/F5 + §3 EP2).

Cross-engine check of the full BBVA charge-line grammar: BOTH engines
deterministically render statement lines from ``orders`` (date →
dd-mmm-yyyy Spanish lowercase; amount → '+/- $1,234.56') and parse
them back with their own regex + cleaning stack. Hash equality proves
the regex grammar, the signed-money cleaner, and the month-map date
parser agree end-to-end — without shipping any real statement data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pythondataingestionprocess_spark.catalog import load_table
from pythondataingestionprocess_spark.functions.cleaning import signed_money
from pythondataingestionprocess_spark.functions.dates import parse_stmt_date
from pythondataingestionprocess_spark.plans.registry import query
from pythondataingestionprocess_spark.sources.statement import CHARGE_LINE

_MONTHS = ["ene", "feb", "mar", "abr", "may", "jun",
           "jul", "ago", "sep", "oct", "nov", "dic"]

_CHARGE_ORACLE = r"""
WITH src AS (
  SELECT o_orderkey, o_orderdate,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         CASE WHEN o_orderkey % 2 = 1 THEN '- $' ELSE '+ $' END AS sgn
  FROM orders WHERE o_orderkey % 211 = 0
), abbr AS (
  SELECT *,
    ['ene','feb','mar','abr','may','jun','jul','ago','sep','oct','nov','dic']
      [month(o_orderdate)] AS mon,
    ['ene','feb','mar','abr','may','jun','jul','ago','sep','oct','nov','dic']
      [month(o_orderdate + INTERVAL 1 DAY)] AS mon2
  FROM src
), lines AS (
  SELECT o_orderkey,
    strftime(CAST(o_orderdate AS DATE), '%d-') || mon ||
      strftime(CAST(o_orderdate AS DATE), '-%Y') || ' ' ||
    strftime(CAST(o_orderdate + INTERVAL 1 DAY AS DATE), '%d-') || mon2 ||
      strftime(CAST(o_orderdate + INTERVAL 1 DAY AS DATE), '-%Y') ||
    ' CARGO ORDEN ' || o_orderkey || ' ' || sgn ||
    format('{:,}', cents // 100) || '.' ||
    lpad(CAST(cents % 100 AS VARCHAR), 2, '0') AS line
  FROM abbr
), parsed AS (
  SELECT o_orderkey, line,
    regexp_extract(line,
      '(?i)(\d{2}-[a-z]{3}-\d{4})\s+(\d{2}-[a-z]{3}-\d{4})\s+(.+?)\s+([+-]\s*\$?[\d,]+\.\d{2})',
      ['d1','d2','descr','amount']) AS g
  FROM lines
)
SELECT o_orderkey,
  strftime(make_date(
    CAST(string_split(g['d1'], '-')[3] AS INT),
    list_position(['ene','feb','mar','abr','may','jun','jul','ago','sep','oct','nov','dic'],
                  string_split(g['d1'], '-')[2]),
    CAST(string_split(g['d1'], '-')[1] AS INT)), '%Y-%m-%d') AS op_date,
  g['descr'] AS descr,
  (CASE WHEN contains(g['amount'], '-') THEN -1 ELSE 1 END)
    * CAST(replace(replace(replace(replace(g['amount'], '-', ''), '+', ''),
                           '$', ''), ',', '') AS DOUBLE) AS amount
FROM parsed WHERE g['d1'] <> ''
"""


@query("stmt_charge_line_grammar", oracle=_CHARGE_ORACLE, tags=("sources", "statement"))
def stmt_charge_line_grammar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 regular-charge grammar + F5 signed money + F3 Spanish date
    parse, round-tripped through rendered lines on both engines."""
    orders = load_table(spark, sf_dir, "orders")

    def abbr_of(c) -> F.Column:
        out = F.lit(None).cast("string")
        for i, a in enumerate(_MONTHS, start=1):
            out = F.when(F.month(c) == i, F.lit(a)).otherwise(out)
        return out

    def render_date(c) -> F.Column:
        return F.concat_ws(
            "-",
            F.lpad(F.dayofmonth(c).cast("string"), 2, "0"),
            abbr_of(c),
            F.year(c).cast("string"),
        )

    d1 = F.col("o_orderdate")
    d2 = F.date_add(F.col("o_orderdate"), 1)
    sgn = F.when(F.col("o_orderkey") % 2 == 1, F.lit("- $")).otherwise(F.lit("+ $"))
    # amount rendered from integer cents (identically in the oracle) —
    # sidesteps float-formatting rounding-mode differences
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    line = F.concat(
        render_date(d1), F.lit(" "), render_date(d2),
        F.lit(" CARGO ORDEN "), F.col("o_orderkey").cast("string"), F.lit(" "),
        sgn, F.format_number((cents / 100).cast("long"), 0), F.lit("."),
        F.lpad((cents % 100).cast("string"), 2, "0"),
    )
    lines = (
        orders.filter(F.col("o_orderkey") % 211 == 0)
        .select("o_orderkey", line.alias("line"))
    )
    g = lambda i: F.regexp_extract("line", CHARGE_LINE, i)  # noqa: E731
    return lines.filter(g(1) != "").select(
        "o_orderkey",
        F.date_format(parse_stmt_date(g(1)), "yyyy-MM-dd").alias("op_date"),
        g(3).alias("descr"),
        signed_money(g(4)).alias("amount"),
    )
