"""Date expressions (SURVEY.md §2.8 F3, F8, F18).

The reference parses two date shapes: lowercase Spanish-abbreviated
statement dates (``17-sep-2025``) and Excel serial dates (``45369``).
JVM locale handling of lowercase Spanish month abbreviations is
unreliable, so the statement parser uses an explicit month map —
deterministic on any cluster locale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EXCEL_EPOCH = "1899-12-30"  # Excel serial day 0 (1900 leap-year bug baked in)

# Spanish month abbreviations as produced by the BBVA statements the
# reference parses with %d-%b-%Y (pdf_to_xlsx.py:60-64). English
# aliases included for the overlap cases (ene/jan differ, mar/mar same).
SPANISH_MONTH_ABBR: dict[str, int] = {
    "ene": 1, "feb": 2, "mar": 3, "abr": 4, "may": 5, "jun": 6,
    "jul": 7, "ago": 8, "sep": 9, "oct": 10, "nov": 11, "dic": 12,
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def excel_serial_to_date(col: Column | str) -> Column:
    """F18: Excel serial day number → date (``45369`` → 2024-03-18).

    Observed in the reference corpus (Compras!J2 ``Fch Cmpr``, SURVEY
    §1.2); the reference relies on pandas' Excel reader doing this
    implicitly — here it is an explicit, testable expression.
    """
    return F.date_add(F.lit(EXCEL_EPOCH).cast("date"), _c(col).try_cast("int"))


def month_from_abbr(col: Column | str) -> Column:
    """Lowercase month abbreviation → month number (NULL if unknown)."""
    c = F.lower(F.trim(_c(col)))
    expr: Column = F.lit(None).cast("int")
    for abbr, num in SPANISH_MONTH_ABBR.items():
        expr = F.when(c == abbr, F.lit(num)).otherwise(expr)
    return expr


def parse_stmt_date(col: Column | str) -> Column:
    """F3: parse ``dd-mmm-yyyy`` with lowercase Spanish month
    abbreviations (``17-sep-2025``); unparseable → NULL (the reference
    keeps the raw string on failure, pdf_to_xlsx.py:61-64 — callers
    that need that union keep the raw column alongside).
    """
    c = F.trim(_c(col).cast("string"))
    parts = F.split(c, "-")
    day = F.element_at(parts, 1).try_cast("int")
    month = month_from_abbr(F.element_at(parts, 2))
    year = F.element_at(parts, 3).try_cast("int")
    iso = F.concat_ws(
        "-",
        F.format_string("%04d", year),
        F.format_string("%02d", month),
        F.format_string("%02d", day),
    )
    return F.when(
        (F.size(parts) == 3) & year.isNotNull() & month.isNotNull() & day.isNotNull(),
        F.try_to_date(iso, "yyyy-MM-dd"),
    )
