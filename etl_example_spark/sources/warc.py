"""WARC (Web ARChive) record source — the actual head of a web-curation
pipeline: crawl corpora (Common Crawl, internal crawlers) arrive as
concatenated WARC records, not as pre-extracted HTML columns. This module
gives the engine that entry point via the Python Data Source API (the
q70/st44 ``SyntheticDocsDataSource`` pattern: partition planning on the
driver, record materialization + parse on executors).

Two layers, deliberately separate:

- :func:`parse_warc_records` — a REAL incremental WARC/1.0 parser over a
  byte buffer: walks ``WARC/1.0`` record heads, reads CRLF-delimited
  WARC headers, honors ``Content-Length`` (BYTES, not characters — the
  classic WARC parsing bug with multibyte payloads), strips the embedded
  HTTP/1.1 response envelope of ``response`` records, skips
  ``warcinfo``/``request``/``metadata`` records, and resynchronizes on
  the next record head after a malformed block instead of aborting the
  split (a crawl file with one damaged record loses one record, not the
  shard).
- ``WarcDataSource`` — partition-planned Spark source. Each partition
  synthesizes its id-slice of the crawl deterministically (every byte of
  the WARC stream is a pure function of the record id — the q70
  discipline, which is what lets a SQL oracle regenerate the expected
  rows) and runs the real parser over the concatenated bytes. A
  production deployment swaps the synthesizer for ranged reads of real
  .warc files (one partition per file or per
  ``spark.sql.files.maxPartitionBytes`` slice); the parser and the
  Spark plumbing (schema, partition planning, per-executor iteration)
  are exactly what ships here.

Reference scope note: the reference system (`src/job.py`) has no web
ingestion surface; this extends the engine toward the LLM-pipeline
north star (the brief's WARC/WET head), composed with
operators/extraction.strip_html downstream (the d102 registration).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

CRLF = b"\r\n"
_HEAD = b"WARC/1.0\r\n"


def parse_warc_records(buf: bytes):
    """Yield ``(url, rec_type, http_status, body_bytes)`` for every
    well-formed record in a WARC/1.0 byte buffer.

    Content-Length is byte-exact: bodies slice by length, never by
    delimiter scan, so a body containing ``\\r\\n\\r\\n`` or another
    record's magic survives intact. ``response`` records carry an
    embedded HTTP/1.1 envelope; the returned body starts after its
    blank line. Records with missing/invalid Content-Length or a
    truncated body resynchronize at the next ``WARC/1.0`` head.
    """
    pos = 0
    n = len(buf)
    while True:
        head = buf.find(_HEAD, pos)
        if head < 0:
            return
        hdr_end = buf.find(CRLF + CRLF, head)
        if hdr_end < 0:
            return
        headers: dict[str, str] = {}
        for line in buf[head + len(_HEAD) : hdr_end].split(CRLF):
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().decode("ascii", "replace").lower()] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            pos = head + len(_HEAD)  # malformed: resync at next head
            continue
        body_start = hdr_end + len(CRLF + CRLF)
        body_end = body_start + length
        if length < 0 or body_end > n:
            pos = head + len(_HEAD)  # truncated: resync
            continue
        pos = body_end
        rec_type = headers.get("warc-type", "")
        url = headers.get("warc-target-uri", "")
        body = buf[body_start:body_end]
        status = 0
        if rec_type == "response":
            # strip the embedded HTTP response envelope (bytes domain)
            http_end = body.find(CRLF + CRLF)
            if http_end >= 0:
                status_line = body.split(CRLF, 1)[0]
                parts = status_line.split()
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
                body = body[http_end + len(CRLF + CRLF) :]
        yield url, rec_type, status, body


def synthetic_html(i: int, dup_every: int = 0) -> str:
    """The deterministic page body for crawl record ``i`` — markup that
    exercises every strip_html stage (comment, script with a literal
    '<', entities, block boundaries) plus a multibyte char ('é') so
    Content-Length byte arithmetic is load-bearing. Mirrored by the SQL
    oracle from md5(i).

    ``dup_every=k`` makes every k-th page (i % k == k-1) a BYTE-EXACT
    mirror of the previous page under a different URL — the duplicate
    structure real crawls have (mirrors, trackers re-serving content)
    and the d103 dedup chain needs to demonstrate anything."""
    if dup_every and i % dup_every == dup_every - 1 and i > 0:
        return synthetic_html(i - 1)
    d = hashlib.md5(str(i).encode()).hexdigest()
    return (
        f"<html><head><title>Doc {i}</title>"
        "<script>if (1<2) { spam(); }</script></head>"
        f"<body><!-- crawl {i} --><p>alpha {d[:8]} &amp; café</p>"
        f"<p>beta {d[8:16]}</p></body></html>"
    )


def synthetic_warc_record(i: int, dup_every: int = 0) -> bytes:
    """One WARC/1.0 response record for id ``i`` (plus a request record
    every 5th id, which the reader must skip — real crawls interleave
    them)."""
    html = synthetic_html(i, dup_every).encode("utf-8")
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
    )
    rec = (
        _HEAD
        + b"WARC-Type: response\r\n"
        + f"WARC-Record-ID: <urn:uuid:{i:032d}>\r\n".encode()
        + f"WARC-Target-URI: https://example.org/doc/{i}\r\n".encode()
        + f"Content-Length: {len(http)}\r\n".encode()
        + CRLF
        + http
        + CRLF
        + CRLF
    )
    if i % 5 == 0:
        req = b"GET /doc HTTP/1.1\r\nHost: example.org\r\n\r\n"
        rec = (
            _HEAD
            + b"WARC-Type: request\r\n"
            + f"WARC-Target-URI: https://example.org/doc/{i}\r\n".encode()
            + f"Content-Length: {len(req)}\r\n".encode()
            + CRLF
            + req
            + CRLF
            + CRLF
        ) + rec
    return rec


def synthetic_wet_text(i: int, dup_every: int = 0) -> str:
    """The extracted-text body of WET conversion record ``i`` — what a
    Common Crawl ``.wet`` file carries for the page
    :func:`synthetic_html` renders: title line + paragraph lines,
    newline-joined, with the multibyte 'é' so Content-Length byte
    arithmetic stays load-bearing. ``dup_every`` mirrors every k-th
    text like the WARC side (crawl mirrors survive extraction)."""
    if dup_every and i % dup_every == dup_every - 1 and i > 0:
        return synthetic_wet_text(i - 1)
    d = hashlib.md5(str(i).encode()).hexdigest()
    return f"Doc {i}\nalpha {d[:8]} & café\nbeta {d[8:16]}"


def synthetic_wet_record(i: int, dup_every: int = 0) -> bytes:
    """One WARC/1.0 ``conversion`` record for id ``i`` — the WET shape:
    plain-text body, ``Content-Type: text/plain``, NO embedded HTTP
    envelope (the structural difference from ``response`` records; the
    parser must not peel bytes it would peel from a response)."""
    body = synthetic_wet_text(i, dup_every).encode("utf-8")
    return (
        _HEAD
        + b"WARC-Type: conversion\r\n"
        + f"WARC-Target-URI: https://example.org/doc/{i}\r\n".encode()
        + f"WARC-Refers-To: <urn:uuid:{i:032d}>\r\n".encode()
        + b"Content-Type: text/plain\r\n"
        + f"Content-Length: {len(body)}\r\n".encode()
        + CRLF
        + body
        + CRLF
        + CRLF
    )


@dataclass
class _WarcSlice(InputPartition):
    start: int
    end: int


def _warcinfo() -> bytes:
    info = b"software: synthetic-crawler/1.0\r\n"
    return (
        _HEAD
        + b"WARC-Type: warcinfo\r\n"
        + f"Content-Length: {len(info)}\r\n".encode()
        + CRLF
        + info
        + CRLF
        + CRLF
    )


def _parse_slice(start: int, end: int, dup_every: int):
    """Synthesize + REAL-parse crawl records [start, end): the shared
    kernel of the batch partitions and the streaming micro-batches, so
    stream-read == batch-read is true by construction."""
    buf = _warcinfo() + b"".join(
        synthetic_warc_record(i, dup_every) for i in range(start, end)
    )
    for url, rec_type, status, body in parse_warc_records(buf):
        if rec_type != "response":
            continue
        yield url, status, body.decode("utf-8", "replace")


class _WarcReader(DataSourceReader):
    #: the per-slice synthesize+parse kernel — the ONLY thing the WET
    #: variant overrides, so slice planning lives in one place
    _kernel = staticmethod(_parse_slice)

    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.n_parts = max(1, int(options.get("partitions", 8)))
        self.dup_every = int(options.get("dupEvery", 0))

    def partitions(self):
        if self.rows <= 0:
            return [_WarcSlice(0, 0)]
        step = -(-self.rows // self.n_parts)
        return [
            _WarcSlice(lo, min(lo + step, self.rows))
            for lo in range(0, self.rows, step)
        ]

    def read(self, partition: _WarcSlice):
        # one concatenated WARC stream per partition, with a warcinfo
        # head record (real files start with one; the parser skips it)
        yield from self._kernel(
            partition.start, partition.end, self.dup_every
        )


def _parse_wet_slice(start: int, end: int, dup_every: int):
    """Synthesize + REAL-parse WET records [start, end): same kernel
    discipline as :func:`_parse_slice`, filtered to ``conversion``
    records (a real .wet file is warcinfo + conversions only)."""
    buf = _warcinfo() + b"".join(
        synthetic_wet_record(i, dup_every) for i in range(start, end)
    )
    for url, rec_type, _status, body in parse_warc_records(buf):
        if rec_type != "conversion":
            continue
        yield url, body.decode("utf-8", "replace")


class _WetReader(_WarcReader):
    """``_WarcReader`` with the conversion-record kernel — slice
    planning is inherited, only the parse kernel differs (a future
    partition-planning fix lands in ONE place)."""

    _kernel = staticmethod(_parse_wet_slice)


class WetDataSource(DataSource):
    """``spark.read.format("synthetic_wet").option("rows", N)`` →
    (url string, text string) — WET conversion records (extracted
    plain text, no HTTP envelope), the entry point text-first crawl
    consumers actually read. Same partition-planned synthesize+parse
    shape as :class:`WarcDataSource`; a production deployment swaps
    the synthesizer for ranged reads of real ``.wet`` files.
    ``spark.readStream`` gives the offset-managed streaming form."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_wet"

    def schema(self) -> str:
        return "url string, text string"

    def reader(self, schema):
        return _WetReader(self.options)

    def simpleStreamReader(self, schema):
        return _WetStreamReader(self.options)


class _WarcStreamReader(SimpleDataSourceStreamReader):
    """Offset-managed STREAMING half of the crawl source — ingest-time
    web curation starts here: the offset is the next unread record id,
    each micro-batch synthesizes and REAL-parses its slice (the same
    kernel as the batch partitions), and ``readBetweenOffsets`` replays
    any committed range deterministically, so restart/recovery yields
    identical batches (exactly-once downstream with idempotent
    sinks)."""

    #: per-slice kernel hook — the WET stream variant overrides ONLY
    #: this, so offset bookkeeping lives in one place
    _kernel = staticmethod(_parse_slice)

    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.batch = int(options.get("batchRows", 100))
        self.dup_every = int(options.get("dupEvery", 0))

    def initialOffset(self):
        return {"offset": 0}

    def read(self, start):
        lo = int(start["offset"])
        hi = min(lo + self.batch, self.rows)
        return (
            iter(list(self._kernel(lo, hi, self.dup_every))),
            {"offset": hi},
        )

    def readBetweenOffsets(self, start, end):
        return iter(
            list(
                self._kernel(
                    int(start["offset"]),
                    int(end["offset"]),
                    self.dup_every,
                )
            )
        )


class _WetStreamReader(_WarcStreamReader):
    """``_WarcStreamReader`` over the conversion-record kernel — same
    offset contract, so stream-read == batch-read by construction and
    a future offset-semantics fix lands in one place."""

    _kernel = staticmethod(_parse_wet_slice)


class WarcDataSource(DataSource):
    """``spark.read.format("synthetic_warc").option("rows", N)`` →
    (url string, http_status int, html string) — response records only,
    parsed from a synthesized concatenated WARC stream by a real
    incremental parser. ``spark.readStream`` gives the offset-managed
    streaming form (micro-batched by ``batchRows``); ``dupEvery=k``
    mirrors every k-th page under a new URL (duplicate structure for
    the dedup chain)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_warc"

    def schema(self) -> str:
        return "url string, http_status int, html string"

    def reader(self, schema):
        return _WarcReader(self.options)

    def simpleStreamReader(self, schema):
        return _WarcStreamReader(self.options)


def register_warc_datasource(spark) -> None:
    spark.dataSource.register(WarcDataSource)


def register_wet_datasource(spark) -> None:
    spark.dataSource.register(WetDataSource)
