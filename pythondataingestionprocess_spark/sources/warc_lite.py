"""WARC / WET ingestion (ISO 28500) — the Common Crawl wire format,
THE bulk source of a web-scale training-data pipeline. Stdlib-only
(zlib handles the gzip framing), same zero-dependency posture as
``pdf_lite``/``xlsx_lite``.

Exposed as a PySpark-4 Python DataSource (``spark.read.format("warc")``,
register via :func:`register`) with ONE FILE PER PARTITION — the honest
unit of parallelism for this format: Common Crawl compresses EACH
RECORD as its own gzip member, so a segment file is not byte-splittable
by a generic reader, but a crawl ships ~64k segment files per dump and
a 1000-executor cluster saturates on file grain. Records STREAM out of
the reader (member-at-a-time decompression — peak memory is one record
block, not the decompressed file).

Fault isolation is per RECORD, not per file: a malformed record yields
a quarantine row (``decode_status`` prefixed ``quarantine:``) and the
parser resyncs to the next ``WARC/1.`` magic, so one corrupt member
never dead-letters a 400 MB segment. This extends the reference's
file-grain S6 dead-letter contract (files.py) one level down, which is
what record-framed formats allow.

Output schema (text/* blocks decode utf-8-replace into ``text``;
anything else — e.g. ``application/http`` response records — rides as
``payload`` bytes for the multimodal/binary path):

    path, record_id, warc_type, target_uri, warc_date, content_type,
    content_length, text, payload, decode_status

``wet_to_documents`` maps clean WET conversion records onto the
engine's documents shape (surrogate doc_id via xxhash64 of the
record id — same key discipline as pipeline/ingest.py).
"""

from __future__ import annotations

import glob
import mmap
import os
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

_GZIP_MAGIC = b"\x1f\x8b"

SCHEMA = (
    "path string, record_id string, warc_type string, target_uri string, "
    "warc_date string, content_type string, content_length long, "
    "text string, payload binary, decode_status string"
)


class MalformedRecord(ValueError):
    pass


_GZ_CHUNK = 1 << 20  # max decompressobj feed size
_GZ_FEED_FLOOR = 1 << 10  # min adaptive feed size

# white-box instrumentation: total bytes and calls handed to the
# decompressor — the linearity tests pin the adaptive-feed
# amplification bound and the within-member geometric growth
_GZ_FEED_STATS = {"fed": 0, "calls": 0}


def _iter_member_records(data: bytes) -> Iterator[dict]:
    """Records from a (possibly multi-member) gzip buffer, member by
    member — Common Crawl's one-record-per-member layout means peak
    memory is one record, not the whole file.

    Two contracts the naive whole-tail loop broke (r10 review, both
    passes):

    - **bounded memcpy**: member boundaries are only discoverable by
      decompressing, so every feed that overshoots a boundary pays one
      copy of the overshoot (zlib materializes ``unused_data``); the
      feed size therefore ADAPTS to ~2x the previous member's
      compressed size (floor 1 KiB, cap ``_GZ_CHUNK``), making the
      expected overshoot proportional to the member itself, and the
      overshoot is given back by REWINDING the cursor (never by
      carrying a buffer that would be re-fed whole) — total memcpy
      ~2-4x the file for roughly-uniform member sizing (CC segments
      are), plain O(member) for large members, plus one stale-guess
      window per large-to-small size transition. The original code
      re-fed the whole remaining tail per member (O(members x file));
      the first fix still paid ~2 x 1 MiB per member; the second went
      quadratic on size-transition straddles.
    - **per-member quarantine**: a corrupt member yields ONE
      quarantine row and parsing RESYNCS at the next gzip magic —
      in the one-record-per-member layout, member corruption IS the
      per-record corruption case, and it must not dead-letter the
      rest of a 400 MB segment. Resync scans for ``\\x1f\\x8b``,
      which can false-positive inside compressed bytes (~1/64 KiB);
      each false hop just fails fast into another quarantine row and
      keeps scanning — convergence is guaranteed, at worst a handful
      of extra quarantine rows per corrupt member."""
    mv = memoryview(data)
    n = len(data)
    pos = 0  # next unread offset in data
    guess = 8 * _GZ_FEED_FLOOR  # adaptive feed size (~member scale)
    while pos < n:
        member_start = pos
        if bytes(mv[pos : pos + 2]) != _GZIP_MAGIC:
            yield _quarantine(f"gzip: non-gzip bytes at offset {member_start}")
            nxt = data.find(_GZIP_MAGIC, pos + 1)
            if nxt == -1:
                return
            pos = nxt
            continue
        d = zlib.decompressobj(wbits=47)
        out = []
        feed = guess
        try:
            while True:
                if pos >= n:
                    raise zlib.error("truncated gzip member")
                chunk = bytes(mv[pos : pos + feed])
                pos += len(chunk)
                _GZ_FEED_STATS["fed"] += len(chunk)
                _GZ_FEED_STATS["calls"] += 1
                # grow the feed geometrically WITHIN a member: a large
                # member after a tiny-member run must not be fed in
                # floor-sized slices forever (fourth review pass —
                # ~10^6 decompress calls per GB); overshoot stays
                # bounded by the LAST feed, which the rewind returns
                feed = min(2 * feed, _GZ_CHUNK)
                out.append(d.decompress(chunk))
                if d.eof:
                    # REWIND the overshoot instead of carrying a
                    # pending buffer: unused_data is always a suffix
                    # of the LAST fed chunk (feeding stops at eof), so
                    # the next member re-slices those bytes from the
                    # memoryview at the NEW (already-shrunk) guess —
                    # a carried buffer fed whole went quadratic on a
                    # stale-large guess straddling a run of tiny
                    # members (third review pass: 1687x measured)
                    pos -= len(d.unused_data)
                    out.append(d.flush())
                    break
        except zlib.error as e:
            yield _quarantine(f"gzip:{e} (member at offset {member_start})")
            nxt = data.find(_GZIP_MAGIC, member_start + 2)
            if nxt == -1:
                return
            pos = nxt
            continue
        guess = max(_GZ_FEED_FLOOR, min(2 * (pos - member_start), _GZ_CHUNK))
        yield from iter_records(b"".join(out))


def _parse_one(buf: bytes, pos: int) -> tuple[dict, int]:
    """One record starting at ``pos`` (which must point at the version
    line). Returns (record dict, position after the content block)."""
    eol = buf.find(b"\r\n", pos)
    if eol == -1:
        raise MalformedRecord("truncated version line")
    version = buf[pos:eol]
    if not version.startswith(b"WARC/1."):
        raise MalformedRecord(f"bad version line {version[:20]!r}")
    headers: dict[str, str] = {}
    last_name: str | None = None
    p = eol + 2
    while True:
        eol = buf.find(b"\r\n", p)
        if eol == -1:
            raise MalformedRecord("truncated header block")
        line = buf[p:eol]
        p = eol + 2
        if line == b"":
            break
        if line[:1] in (b" ", b"\t"):
            # ISO 28500 folded header: continuation lines start with
            # SP/TAB and extend the previous value
            if last_name is None:
                raise MalformedRecord("continuation line before any header")
            headers[last_name] += " " + line.strip().decode("utf-8", "replace")
            continue
        name, sep, value = line.partition(b":")
        if not sep:
            raise MalformedRecord(f"header without colon {line[:40]!r}")
        last_name = name.strip().lower().decode("ascii", "replace")
        headers[last_name] = value.strip().decode("utf-8", "replace")
    try:
        clen = int(headers["content-length"])
    except KeyError:
        raise MalformedRecord("missing Content-Length") from None
    except ValueError:
        raise MalformedRecord(
            f"bad Content-Length {headers['content-length']!r}"
        ) from None
    if clen < 0 or p + clen > len(buf):
        raise MalformedRecord(
            f"content block truncated (need {clen}, have {len(buf) - p})"
        )
    block = buf[p : p + clen]
    ctype = headers.get("content-type", "")
    is_text = ctype.split(";")[0].strip().lower().startswith("text/")
    return (
        {
            "record_id": headers.get("warc-record-id"),
            "warc_type": headers.get("warc-type"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": ctype or None,
            "content_length": clen,
            "text": block.decode("utf-8", "replace") if is_text else None,
            "payload": None if is_text else bytes(block),
            "decode_status": "ok",
        },
        p + clen,
    )


def _quarantine(reason: str) -> dict:
    return {
        "record_id": None,
        "warc_type": None,
        "target_uri": None,
        "warc_date": None,
        "content_type": None,
        "content_length": None,
        "text": None,
        "payload": None,
        "decode_status": f"quarantine:{reason}",
    }


def iter_records(buf: bytes) -> Iterator[dict]:
    """All records in a decompressed buffer; malformed spans become
    quarantine rows and parsing resyncs at the next ``WARC/1.``."""
    pos, n = 0, len(buf)
    while pos < n:
        while pos < n and buf[pos] in (0x0D, 0x0A):
            pos += 1
        if pos >= n:
            break
        start = pos
        try:
            rec, pos = _parse_one(buf, pos)
            yield rec
        except MalformedRecord as e:
            yield _quarantine(str(e))
            nxt = buf.find(b"WARC/1.", start + 1)
            if nxt == -1:
                break
            pos = nxt


def parse_warc_bytes(data) -> Iterator[dict]:
    """Records from raw file bytes — gzip (multi-member) or plain.

    Accepts any bytes-like with ``find`` and slicing (``bytes`` or an
    ``mmap``): the file readers hand in a read-only memory map so the
    compressed segment is never heap-resident as one Python buffer —
    peak heap is one decompressed record block plus the adaptive feed
    window, and the OS pages the map in and out under pressure (a real
    Common Crawl segment is ~1 GB compressed per task)."""
    if bytes(data[:2]) == _GZIP_MAGIC:
        yield from _iter_member_records(data)
    else:
        # iter_records only needs find/len/slicing, all of which an
        # mmap provides (slices come back as real bytes)
        yield from iter_records(data)


def _map_readonly(f):
    """Read-only memory map of an open binary file; b"" for an empty
    file (mmap rejects zero-length maps)."""
    try:
        return mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
    except ValueError:
        return b""


_COLS = (
    "record_id",
    "warc_type",
    "target_uri",
    "warc_date",
    "content_type",
    "content_length",
    "text",
    "payload",
    "decode_status",
)


class _WarcPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WarcReader(DataSourceReader):
    def __init__(self, options: dict):
        self.glob_pattern = options.get("path")
        if not self.glob_pattern:
            raise ValueError("warc source requires a path")
        if os.path.isdir(self.glob_pattern):
            self.glob_pattern = os.path.join(self.glob_pattern, "*")

    def partitions(self):  # one file = one task
        return [_WarcPartition(p) for p in sorted(glob.glob(self.glob_pattern))]

    def read(self, partition: _WarcPartition | None) -> Iterator[tuple]:
        if partition is None:
            # empty glob: Spark's planner substitutes one None
            # partition when partitions() == [] — yield 0 rows, don't
            # crash the task (r10 review)
            return
        with open(partition.path, "rb") as f:
            data = _map_readonly(f)
            for rec in parse_warc_bytes(data):
                yield (partition.path, *(rec[c] for c in _COLS))


class WarcStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin: ingest a LANDING DIRECTORY of segment files.

    Offset = ``{"n": files consumed, "last": last consumed name}``
    against the sorted listing. Contract (checked, fail-loud): the
    directory is append-only with lexicographically increasing names —
    exactly how crawl segments arrive (``CC-MAIN-…-00123.warc.gz``).
    Names, not mtimes, order batches, so there is no same-mtime
    nondeterminism (the FileStreamSource trap test_streaming.py
    documents), and ``readBetweenOffsets`` replays a checkpointed
    batch deterministically after failure: the same name slice yields
    the same records."""

    def __init__(self, options: dict):
        self.glob_pattern = options.get("path")
        if not self.glob_pattern:
            raise ValueError("warc source requires a path")
        if os.path.isdir(self.glob_pattern):
            self.glob_pattern = os.path.join(self.glob_pattern, "*")
        # optional per-batch file cap (the built-in file source's
        # maxFilesPerTrigger): the simple-stream wrapper holds each
        # batch's rows in memory (list, see _rows), so a long-running
        # stream over a busy landing dir should cap batches. OFF by
        # default because the Python simple-stream runner executes
        # exactly ONE prefetched batch under trigger(availableNow) —
        # a cap there means one run ingests only cap files (pinned in
        # tests); continuous triggers drain the backlog across
        # micro-batches as expected.
        raw_cap = options.get("maxFilesPerTrigger")
        self.max_files = int(raw_cap) if raw_cap is not None else None
        if self.max_files is not None and self.max_files < 1:
            raise ValueError("maxFilesPerTrigger must be >= 1")

    def _files(self) -> list[str]:
        return sorted(glob.glob(self.glob_pattern))

    def _check(self, files: list[str], n: int, last: str) -> None:
        if n == 0:
            return
        if len(files) < n or files[n - 1] != last:
            seen = repr(files[n - 1]) if len(files) >= n else "<missing>"
            raise RuntimeError(
                f"warc landing dir mutated under the stream: offset says "
                f"file #{n} is {last!r}, listing says {seen} — "
                "the directory must be append-only with increasing names"
            )

    def initialOffset(self) -> dict:
        return {"n": 0, "last": ""}

    def read(self, start: dict):
        files = self._files()
        self._check(files, start["n"], start["last"])
        cut = (
            len(files)
            if self.max_files is None
            else min(len(files), start["n"] + self.max_files)
        )
        new = files[start["n"] : cut]
        end = {"n": cut, "last": files[cut - 1] if cut else ""}
        return self._rows(new), end

    def readBetweenOffsets(self, start: dict, end: dict):
        files = self._files()
        # validate BOTH edges: an earlier file renamed to sort inside
        # the replay slice keeps the end position intact but shifts
        # what files[start:end] means — fail loud, never replay the
        # wrong files (r10 review)
        self._check(files, start["n"], start["last"])
        self._check(files, end["n"], end["last"])
        return self._rows(files[start["n"] : end["n"]])

    def _rows(self, paths: list[str]) -> list[tuple]:
        # a LIST, not a generator: the simple-stream wrapper caches the
        # returned value and copy.copy()s it for prefetch replay —
        # generators are neither copyable nor picklable. Micro-batch
        # grain bounds the materialization to the new files per tick.
        out: list[tuple] = []
        for path in paths:
            with open(path, "rb") as f:
                data = _map_readonly(f)
                out.extend(
                    (path, *(rec[c] for c in _COLS))
                    for rec in parse_warc_bytes(data)
                )
        return out


class WarcDataSource(DataSource):
    """WARC/WET record source — one row per record, one task per file;
    batch (``spark.read``) and streaming (``spark.readStream``)."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema: StructType) -> WarcReader:
        return WarcReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> WarcStreamReader:
        return WarcStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(WarcDataSource)


def read_warc(spark, path: str) -> DataFrame:
    register(spark)
    return spark.read.format("warc").load(path)


def wet_to_documents(records: DataFrame) -> DataFrame:
    """Clean WET conversion records → the engine's documents shape:
    ``(doc_id, source, text)`` with the xxhash64 surrogate key and the
    URI host as the source (the grain the boilerplate screen and the
    per-source samplers key on)."""
    return (
        records.filter(
            (F.col("decode_status") == "ok")
            & (F.col("warc_type") == "conversion")
            & F.col("text").isNotNull()
        )
        .select(
            F.xxhash64("record_id").alias("doc_id"),
            # regexp_extract yields '' (not NULL) on a miss or a NULL-
            # free non-match; route both through nullif -> 'unknown'
            # lower() first: URI schemes AND hosts are case-insensitive
            # (RFC 3986 §3.1/§3.2.2), so HTTP://Example.COM/ must land
            # on source 'example.com', not 'unknown'
            F.coalesce(
                F.nullif(
                    F.regexp_extract(
                        F.lower(F.coalesce("target_uri", F.lit(""))),
                        r"^[a-z][a-z0-9+.-]*://([^/]+)",
                        1,
                    ),
                    F.lit(""),
                ),
                F.lit("unknown"),
            ).alias("source"),
            "text",
        )
    )
