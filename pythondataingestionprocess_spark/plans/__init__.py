"""Query plan catalog. Importing this package populates REGISTRY."""

from pythondataingestionprocess_spark.plans.registry import REGISTRY, QuerySpec, query

# Each module registers its queries on import.
from pythondataingestionprocess_spark.plans import core_relational  # noqa: E402,F401
from pythondataingestionprocess_spark.plans import windows  # noqa: E402,F401
from pythondataingestionprocess_spark.plans import cleaning_queries  # noqa: E402,F401
from pythondataingestionprocess_spark.plans import llm_ops  # noqa: E402,F401
from pythondataingestionprocess_spark.plans import streaming_queries  # noqa: E402,F401
from pythondataingestionprocess_spark.plans import source_queries  # noqa: E402,F401
from pythondataingestionprocess_spark.plans import asof_queries  # noqa: E402,F401
from pythondataingestionprocess_spark.plans import subqueries  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "query"]
