"""URL derivation expressions (SURVEY.md §2.8 F9-F11) — the store /
provider / domain rules that turn product URLs into dimension keys.

Implemented with regexp parts extraction (not java-URI ``parse_url``)
so malformed no-scheme URLs degrade exactly like Python's ``urlparse``
does in the reference (empty host, everything in path) instead of
erroring, and so the same logic is expressible in the DuckDB oracle.

Reference behavior notes (intent preserved, bugs documented):

- ``get_provider_store`` (utils_tools.py:132-182) checks its
  keep-path substring list BEFORE the specific mercadolibre/amazon
  rules; since "mercado" and "amazon" are in that list, the
  ``articulo.``→``www.`` rewrite (:165-167) and the ``/dp/`` path
  trimming (:168-173) are **unreachable** at runtime. We replicate
  the reachable behavior (keep-path wins) for parity.
- ``samscLub.com.mx`` / ``homeDepot`` (:148,:153) can never match the
  lowercased host — dead entries, omitted here.
- ``get_domain_store`` (utils_tools.py:193-194) calls ``str.replace``
  without assigning — a no-op. We implement the *intent*
  (``articulo.mercadolibre`` → ``www.mercadolibre``); divergence
  documented here and exercised in tests.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"

# get_store_name skip tokens (utils_tools.py:124)
STORE_SKIP_TOKENS: tuple[str, ...] = ("www", "es", "articulo", "super")

# get_provider_store domain tiers (utils_tools.py:145-154); dead
# entries dropped per module docstring.
BASE_ONLY_DOMAINS: tuple[str, ...] = (
    "temu.com", "shein.com", "walmart.com.mx", "soriana.com",
    "costco.com.mx", "liverpool.com.mx", "sears.com.mx",
    "coppel.com", "elektra.com.mx",
)
KEEP_PATH_DOMAINS: tuple[str, ...] = (
    "ebay.", "mercado", "aliexpress", "amazon", "bestbuy",
    "target", "lowes", "officedepot",
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_scheme(col: Column | str) -> Column:
    return F.regexp_extract(_c(col), _SCHEME_RE, 1)


def url_host(col: Column | str) -> Column:
    """Lowercased host; empty string when the URL has no scheme
    (urlparse-netloc semantics)."""
    return F.lower(F.regexp_extract(_c(col), _HOST_RE, 1))


def url_path(col: Column | str) -> Column:
    """Path without query/fragment; for no-scheme input the whole
    pre-query string lands here (urlparse semantics)."""
    c = _c(col)
    return F.when(
        c.rlike(_SCHEME_RE), F.regexp_extract(c, _PATH_RE, 1)
    ).otherwise(F.regexp_extract(c, r"^([^?#]*)", 1))


def store_name_from_url(col: Column | str) -> Column:
    """F9 ``get_store_name`` (utils_tools.py:114-130): literal "ML" →
    "mercadolibre"; else hostname split on '.', drop
    www/es/articulo/super tokens, first remaining token if ≥2 remain.
    """
    c = _c(col)
    host = url_host(c)
    tokens = F.filter(
        F.split(host, r"\."), lambda t: ~t.isin(*STORE_SKIP_TOKENS)
    )
    return (
        F.when(c == "ML", F.lit("mercadolibre"))
        .when(host == "", F.lit(None).cast("string"))
        .when(F.size(tokens) >= 2, F.lower(F.element_at(tokens, 1)))
        .otherwise(F.lit(None).cast("string"))
    )


def canonicalize_provider_url(col: Column | str) -> Column:
    """F10 ``get_provider_store`` (utils_tools.py:132-182): canonical
    provider URL — base-only marketplaces collapse to scheme://host,
    everything else keeps the path and drops query/fragment.
    """
    c = F.trim(_c(col).cast("string"))
    scheme, host, path = url_scheme(c), url_host(c), url_path(c)
    base_only = F.lit(False)
    for d in BASE_ONLY_DOMAINS:
        base_only = base_only | host.contains(d)
    return (
        F.when(c.isNull() | (c == ""), F.lit(None).cast("string"))
        .when(base_only, F.concat(scheme, F.lit("://"), host))
        .otherwise(F.concat(scheme, F.lit("://"), host, path))
    )


def domain_from_url(col: Column | str) -> Column:
    """F11 ``get_domain_store`` (utils_tools.py:184-197): literal
    "mercadolibre" → "www.mercadolibre.com.mx"; else the lowered
    ``https?://([^/]+)`` host with articulo.mercadolibre →
    www.mercadolibre (intent of the reference's no-op bug — see
    module docstring)."""
    c = _c(col)
    host = F.lower(F.regexp_extract(c, r"https?://([^/]+)", 1))
    return (
        F.when(c == "mercadolibre", F.lit("www.mercadolibre.com.mx"))
        .when(host == "", F.lit(None).cast("string"))
        .otherwise(F.regexp_replace(host, r"^articulo\.mercadolibre", "www.mercadolibre"))
    )
