"""Live-transport integration for functions/url_verify (r8 VERDICT
item 6): pin the stdlib-urllib HEAD/redirect/UA/timeout behavior of
``default_transport`` against a REAL local ``http.server`` — the
stubbed-callable tests prove the miss-set discipline; these prove the
transport itself. No socket leaves localhost.

Reference anchor: utils_tools.py:92-108 (requests.head with browser
UA, allow_redirects=True, timeout=10, RequestException -> inactive).
"""

from __future__ import annotations

import socket
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from pythondataingestionprocess_spark.functions import url_verify
from pythondataingestionprocess_spark.functions.url_verify import (
    default_transport,
    verify_url_statuses,
)


class _Handler(BaseHTTPRequestHandler):
    """Routes: /ok 200; /redirect 302->/ok; /missing 404;
    /ua 200 only with the browser UA (403 otherwise); /slow sleeps
    1.5 s then 200. Only do_HEAD is defined — a GET would 501, so a
    green run also proves the transport really sends HEAD."""

    seen: list[tuple[str, str]] = []

    def do_HEAD(self):  # noqa: N802 (http.server API)
        _Handler.seen.append((self.command, self.path))
        if self.path == "/ok":
            self.send_response(200)
        elif self.path == "/redirect":
            self.send_response(302)
            self.send_header("Location", "/ok")
        elif self.path == "/ua":
            ua = self.headers.get("User-Agent", "")
            self.send_response(200 if ua.startswith("Mozilla/5.0") else 403)
        elif self.path == "/slow":
            time.sleep(1.5)
            self.send_response(200)
        else:
            self.send_response(404)
        self.end_headers()

    def log_message(self, *args):  # silence per-request stderr noise
        pass


@pytest.fixture(scope="module")
def live_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()
    t.join(timeout=5)


def test_default_transport_head_ok(live_server):
    _Handler.seen.clear()
    assert default_transport(f"{live_server}/ok") == 200
    assert _Handler.seen == [("HEAD", "/ok")]


def test_default_transport_follows_redirects(live_server):
    """The reference follows redirects and reports the FINAL status —
    302 -> /ok must come back 200, not 302."""
    _Handler.seen.clear()
    assert default_transport(f"{live_server}/redirect") == 200
    assert _Handler.seen == [("HEAD", "/redirect"), ("HEAD", "/ok")]


def test_default_transport_sends_browser_user_agent(live_server):
    """Servers that 403 generic clients are why the reference sets a
    browser UA — /ua returns 200 only for a Mozilla/5.0 agent."""
    assert default_transport(f"{live_server}/ua") == 200


def test_default_transport_raises_on_non_200(live_server):
    """urllib raises HTTPError on 4xx/5xx; the UDF's except branch maps
    that to inactive (the reference's RequestException branch)."""
    import urllib.error

    with pytest.raises(urllib.error.HTTPError):
        default_transport(f"{live_server}/missing")


def test_default_transport_times_out(live_server, monkeypatch):
    """A server that answers slower than the timeout must raise (and so
    map to inactive), never hang the ingest. Driver-side call, so the
    monkeypatched module constant is visible to the transport."""
    monkeypatch.setattr(url_verify, "_TIMEOUT_S", 0.5)
    with pytest.raises(Exception):
        default_transport(f"{live_server}/slow")


def test_default_transport_connection_refused():
    """A dead host (closed port on localhost) must raise URLError."""
    import urllib.error

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()  # nothing listens here now
    with pytest.raises(urllib.error.URLError):
        default_transport(f"http://127.0.0.1:{port}/ok")


def test_verify_url_statuses_end_to_end_live(spark, live_server):
    """The full Spark face over the real transport: 200 -> active,
    404 -> inactive, redirect-to-200 -> active; known urls pass
    through unprobed (no request hits the server for them)."""
    urls = spark.createDataFrame(
        [(f"{live_server}/ok",), (f"{live_server}/missing",),
         (f"{live_server}/redirect",), (f"{live_server}/known",)],
        "provider_url string",
    )
    known = spark.createDataFrame(
        [(f"{live_server}/known", True)],
        "provider_url string, is_active boolean",
    )
    _Handler.seen.clear()
    got = {
        r["provider_url"]: r["is_active"]
        for r in verify_url_statuses(urls, known).collect()
    }
    assert got == {
        f"{live_server}/ok": True,
        f"{live_server}/missing": False,
        f"{live_server}/redirect": True,
        f"{live_server}/known": True,
    }
    assert ("HEAD", "/known") not in _Handler.seen
