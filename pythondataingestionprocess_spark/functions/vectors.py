"""Vector expressions over array<float> embedding columns.

All folds are sequential left-to-right in double precision, which is
deterministic and matches a sequential SQL/DuckDB double fold
bit-for-bit (verified empirically — note that DuckDB's builtin
``list_cosine_similarity`` computes in float32 on FLOAT[] inputs and
does NOT match; oracles must use explicit double folds).

JVM-side expressions, no UDFs: at 100 TB the dot products run inside
codegen next to the scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    prods = F.zip_with(
        _c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    sq = F.transform(_c(a), lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column | str, b: Column | str) -> Column:
    return F.try_divide(dot(a, b), norm(a) * norm(b))
