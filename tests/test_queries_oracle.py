"""Mirror of the driver's t2 check: every registered query vs its
DuckDB oracle at sf0.001 (driver runs sf0.01). Stricter than the
driver — exact canonical-value equality."""

from __future__ import annotations

import pytest

from pythondataingestionprocess_spark.oracle import check_query
from pythondataingestionprocess_spark.plans import REGISTRY


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_dir, name):
    problems = check_query(spark, sf_dir, name)
    assert not problems, f"{name}: {problems}"


def test_rows_only_queries_run(spark, sf_dir):
    """Queries without an oracle must still execute and return a schema."""
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            df = spec.fn(spark, sf_dir)
            assert df.columns, name
            assert df.count() >= 0, name


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)
    assert "flagship_revenue_by_nation" in q
