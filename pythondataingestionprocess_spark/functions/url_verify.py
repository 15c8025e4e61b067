"""Live URL verification — the reference's ``verify_url`` network
probe (utils_tools.py:92-108), OFF by default.

The reference HEAD-requests every provider link at ingest time with a
browser User-Agent, follows redirects, and maps status 200 → active,
anything else (or any transport error) → inactive. That is a
NONDETERMINISTIC effect — the same pipeline run twice can produce
different ``is_active`` values — so the registered queries and their
DuckDB oracles stay on the deterministic ``lit(True)`` stub (SURVEY
§7 risk 5) and this module is opt-in via ``stage_batch(...,
verify_urls=True)``.

Scale discipline when enabled: the probe UDF is applied ONLY to the
distinct miss-set — distinct urls of the batch, anti-joined against
the urls the store has already verified — never to the row grain. A
daily batch re-mentioning 10k known providers and adding 3 new ones
performs exactly 3 HEAD requests. The verified misses then join back
onto the provider dim at its (id_store, provider_url) grain.

The transport is injectable (any ``url -> status_code`` callable) so
tests run a stubbed transport with zero sockets; the default is a
stdlib ``urllib`` HEAD with the reference's redirect/timeout/UA
behavior — no third-party HTTP dependency.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# The reference's browser-masquerade UA string class (utils_tools.py:
# 94-97) — any mainstream UA works; servers that 403 generic clients
# are exactly why the reference sets one.
_USER_AGENT = (
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/58.0.3029.110 Safari/537.3"
)
_TIMEOUT_S = 10


def _head_preserving_opener():
    """An opener whose redirect handler keeps the HEAD method. Stock
    urllib rewrites every redirected request as a GET — which would
    both diverge from the reference (``requests.head`` with
    ``allow_redirects=True`` stays HEAD) and pull full response bodies
    for every redirected link in the miss-set. Pinned by the
    live-server test: its handler implements ONLY do_HEAD, so a GET
    after redirect comes back 501."""
    import urllib.request

    class _KeepHead(urllib.request.HTTPRedirectHandler):
        def redirect_request(self, req, fp, code, msg, headers, newurl):
            new = super().redirect_request(req, fp, code, msg, headers, newurl)
            if new is not None and req.get_method() == "HEAD":
                new = urllib.request.Request(
                    new.full_url, headers=req.headers,
                    origin_req_host=req.origin_req_host,
                    unverifiable=True, method="HEAD",
                )
            return new

    return urllib.request.build_opener(_KeepHead)


def default_transport(url: str) -> int:
    """HEAD ``url`` (redirects followed as HEAD, 10 s timeout, browser
    UA) and return the final status code. Raises on transport failure —
    the UDF maps exceptions to inactive, like the reference's
    ``except RequestException: return False``."""
    import urllib.request

    req = urllib.request.Request(
        url, method="HEAD", headers={"User-Agent": _USER_AGENT}
    )
    with _head_preserving_opener().open(req, timeout=_TIMEOUT_S) as resp:
        return int(resp.status)


def _verify_udf(transport: Callable[[str], int]):
    @pandas_udf("boolean")
    def verify(urls: pd.Series) -> pd.Series:
        out = []
        for u in urls:
            try:
                out.append(u is not None and transport(u) == 200)
            except Exception:
                out.append(False)
        return pd.Series(out)

    return verify


def verify_url_statuses(
    urls: DataFrame,
    known: DataFrame | None = None,
    url_col: str = "provider_url",
    transport: Callable[[str], int] | None = None,
) -> DataFrame:
    """``(url_col, is_active)`` for every distinct url in ``urls``:
    statuses already in ``known`` (url_col, is_active) pass through
    unprobed; only the anti-joined miss-set reaches the transport.
    The miss-set is distinct BEFORE the UDF, so each unknown url is
    probed exactly once per batch however many rows mention it."""
    transport = transport or default_transport
    distinct = urls.select(url_col).distinct()
    if known is not None:
        # Collapse to ONE row per url: the store may hold conflicting
        # statuses for the same url (a stub-True row written by a
        # verify_urls=False batch alongside a probed-False row); a
        # plain distinct() passes both through and the inner join back
        # in stage_batch then duplicates provider rows (r8 ADVICE).
        # Policy: any True wins (optimistic — a url ever seen active
        # stays active until a probe of the miss-set demotes it).
        known = (
            known.groupBy(url_col)
            .agg(F.max("is_active").alias("is_active"))
        )
        misses = distinct.join(known, url_col, "left_anti")
    else:
        known = None
        misses = distinct
    probed = misses.withColumn("is_active", _verify_udf(transport)(F.col(url_col)))
    if known is None:
        return probed
    # pass-through statuses win for urls the store already verified
    return known.join(distinct, url_col, "left_semi").unionByName(probed)
