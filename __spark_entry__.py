"""Driver contract for the spark-graft builder (PySpark target).

Exposes the engine's declared query surface
(``pythondataingestionprocess_spark.plans.REGISTRY``) to the driver:

- ``entry(spark)`` — flagship query at sf0.001 (smoke check)
- ``queries()`` — name → (spark, sf_dir) -> DataFrame
- ``oracle_sql()`` — name → DuckDB SQL (omitted for rows-only ops)
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pythondataingestionprocess_spark.plans import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["flagship_revenue_by_nation"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-checkable query."""
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
