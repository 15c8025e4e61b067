"""Multi-dimensional data-layout keys: Morton (Z-order) interleaving.

Why the engine has this: at 100 TB, file-level min/max skipping only
prunes on the column the data happens to be sorted by. Writing files
in Morton order over the two most-queried dimensions keeps BOTH
dimensions' min/max ranges tight per file, so a 2-D box predicate
(price band x date band) prunes on either axis — the Delta/Iceberg
``ZORDER BY`` layout, built here from plain bitwise expressions.

The interleave is the classic mask-shift bit spread (public domain
"Interleave bits by Binary Magic Numbers", Stanford bit-twiddling
hacks): an 8-bit value is spread to 16 bits in three mask steps, and
the two spread values are OR-combined with one side shifted left by
one. Everything is integer-exact, so the same expression text is a
valid DuckDB oracle; ``morton16_sql`` emits both dialects from one
template (Spark spells shifts ``shiftleft``, DuckDB ``<<``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# mask constants for the 8->16 bit spread
_M4, _M2, _M1 = 0x0F0F, 0x3333, 0x5555


def _shl(expr: str, n: int, dialect: str) -> str:
    return f"shiftleft({expr}, {n})" if dialect == "spark" else f"({expr} << {n})"


def _spread_sql(expr: str, dialect: str) -> str:
    """Spread the low 8 bits of ``expr`` so they occupy even bit
    positions 0,2,...,14."""
    s = f"(({expr}) & 255)"
    s = f"((({s} | {_shl(s, 4, dialect)}) & {_M4}))"
    s = f"((({s} | {_shl(s, 2, dialect)}) & {_M2}))"
    s = f"((({s} | {_shl(s, 1, dialect)}) & {_M1}))"
    return s


def morton16_sql(x_expr: str, y_expr: str, dialect: str) -> str:
    """SQL text for the 16-bit Morton code of two 8-bit bucket
    expressions — ``dialect`` is ``"spark"`` or ``"duckdb"``; the
    expression shape (and therefore every intermediate value) is
    identical across the two."""
    if dialect not in ("spark", "duckdb"):
        raise ValueError(f"unknown dialect {dialect!r}")
    sx = _spread_sql(x_expr, dialect)
    sy = _spread_sql(y_expr, dialect)
    return f"({sx} | {_shl(sy, 1, dialect)})"


def morton16(x_expr: str, y_expr: str) -> Column:
    """Spark Column for the 16-bit Morton code (x in even bits, y in
    odd bits) of two 8-bit bucket expressions given as SQL text."""
    return F.expr(morton16_sql(x_expr, y_expr, "spark"))


def morton16_py(x: int, y: int) -> int:
    """Pure-Python reference for tests: bit-by-bit interleave."""
    out = 0
    for i in range(8):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out
