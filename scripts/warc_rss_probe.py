"""WARC segment peak-memory probe (r11 VERDICT item 8 / BASELINE.md).

The r11 mmap change (sources/warc_lite.py::_map_readonly) claims "peak
memory = one record" when scanning a plain segment. Measure it instead
of asserting it: build a ~1 GB synthetic plain WARC (1 MB text
records), then parse it to exhaustion in TWO subprocess modes —

- ``mmap``: the shipped path (read-only map, per-record slices);
- ``read``: the pre-r11 behavior (whole file into one bytes object).

Reported per mode: tracemalloc heap peak (Python allocations — the
"one record" claim lives here), RssAnon from /proc/self/status
(anonymous memory the process actually demands; file-backed mapped
pages are reclaimable page cache and deliberately excluded), and
ru_maxrss for context (in mmap mode it approaches the file size
because resident FILE-BACKED pages count — that is cache, not demand).

Usage: python scripts/warc_rss_probe.py [size_mb] (default 1024)
"""
from __future__ import annotations

import json
import os
import resource
import subprocess
import sys
import tracemalloc

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RECORD_MB = 1
SEG = "/tmp/warc_rss_probe.warc"


def _record(body: bytes, i: int) -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: conversion\r\n"
        f"WARC-Target-URI: https://example.com/page{i}\r\n"
        f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"WARC-Record-ID: <urn:uuid:{i:08d}>\r\n"
        f"Content-Type: text/plain\r\n"
        f"Content-Length: {len(body)}\r\n"
        "\r\n"
    ).encode()
    return head + body + b"\r\n\r\n"


def build(size_mb: int) -> int:
    size = RECORD_MB * (1 << 20)
    stamp = b"lorem ipsum dolor sit amet "
    body = (stamp * (size // len(stamp) + 1))[:size]
    n = max(1, size_mb // RECORD_MB)
    with open(SEG, "wb") as f:
        for i in range(n):
            f.write(_record(body, i))
    return n


def _rss_anon_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("RssAnon:"):
                return round(int(line.split()[1]) / 1024, 1)
    return -1.0


def run_mode(mode: str) -> None:
    from pythondataingestionprocess_spark.sources import warc_lite as wl

    tracemalloc.start()
    n, total = 0, 0
    with open(SEG, "rb") as f:
        data = wl._map_readonly(f) if mode == "mmap" else f.read()
        for rec in wl.parse_warc_bytes(data):
            n += 1
            total += rec["content_length"] or 0
    _, heap_peak = tracemalloc.get_traced_memory()
    print(json.dumps({
        "mode": mode,
        "n_records": n,
        "payload_mb": round(total / (1 << 20), 1),
        "heap_peak_mb": round(heap_peak / (1 << 20), 1),
        "rss_anon_mb": _rss_anon_mb(),
        "ru_maxrss_mb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1
        ),
    }))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--mode":
        run_mode(sys.argv[2])
        sys.exit(0)
    size_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n = build(size_mb)
    print(json.dumps({"segment": SEG, "size_mb": size_mb, "n_records": n}))
    for mode in ("mmap", "read"):
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--mode", mode],
            check=True,
        )
    os.unlink(SEG)
