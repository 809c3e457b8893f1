"""WARC crawl-archive ingestion (ISO 28500) — the web-corpus on-ramp.

The reference (yoadjei/mini-etl) has no crawl surface; this source feeds
the training-data extension set: WARC files → (url, date, status, payload)
rows → ``functions.web.html_to_text`` → the text curation pipeline.

Scale design: the unit of parallelism is the WARC FILE, deliberately.
Common-Crawl-style archives are concatenated per-record gzip members, so
a byte range mid-file cannot be decompressed without an external index —
every production pipeline shards by file (CC ships ~64k files of ~1 GB
per crawl), and Spark's ``binaryFile`` source gives exactly that: one
task per file, thousands of files in flight across the cluster. Parsing
runs in ``mapInPandas`` (Arrow-batched, one Python worker pass per
file), and records stream out in bounded chunks so a 1 GB archive never
needs 2× memory for the output batch. The parser is pure stdlib
(``zlib`` with a gzip-member loop) — no warcio dependency.
"""
from __future__ import annotations

import zlib
from collections.abc import Iterator
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

Source = Callable[[SparkSession], DataFrame]

WARC_SCHEMA = StructType(
    [
        StructField("file", StringType()),
        StructField("record_id", StringType()),
        StructField("warc_type", StringType()),
        StructField("url", StringType()),
        StructField("warc_date", StringType()),
        StructField("content_type", StringType()),
        StructField("http_status", IntegerType()),
        StructField("http_content_type", StringType()),
        StructField("payload_length", LongType()),
        StructField("payload", BinaryType()),
        # CDX-style locator: byte offset + length of the unit you must
        # read from the ORIGINAL file to recover this record — the gzip
        # member for compressed archives, the record block for plain
        # ones. select(url, file, record_offset, record_length) IS a CDX
        # index; persist it and later fetches become ranged reads instead
        # of full-archive scans.
        StructField("record_offset", LongType()),
        StructField("record_length", LongType()),
    ]
)


_GZ_FEED = 1 << 18  # 256 KB decompressor feed — bounds per-member copies


def _iter_members(data: bytes) -> Iterator[tuple[bytes, int, int]]:
    """(decompressed_bytes, compressed_offset, compressed_length) per gzip
    member of a concatenated-member archive; a plain (uncompressed) blob
    yields itself once with offset 0. The offsets are what a CDX index
    stores: seek to offset, read length, gunzip — one record recovered
    without touching the rest of the archive.

    The decompressor is fed bounded memoryview slices, NOT ``data[pos:]``:
    a Common-Crawl-layout file has one member per record (~100k/GB), and
    re-slicing the remaining buffer per member would make parsing
    quadratic in file size. Here each member costs its own bytes plus at
    most one ``_GZ_FEED`` tail (zlib's ``unused_data`` copy of the final
    chunk's leftover)."""
    if data[:2] != b"\x1f\x8b":
        yield data, 0, len(data)
        return
    view = memoryview(data)
    pos, n = 0, len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        out = []
        fed = 0
        while not d.eof and pos + fed < n:
            chunk = view[pos + fed : pos + fed + _GZ_FEED]
            out.append(d.decompress(chunk))
            fed += len(chunk)
        if not d.eof:  # truncated member — stop rather than loop forever
            break
        out.append(d.flush())
        consumed = fed - len(d.unused_data)
        yield b"".join(out), pos, consumed
        pos += consumed


def _iter_warc_records(
    data: bytes,
) -> Iterator[tuple[dict[str, str], bytes, int, int]]:
    """Yield (headers, payload, record_start, record_end) per WARC record
    — offsets are positions within ``data``. Headers are lower-cased.
    Tolerant of trailing garbage: parsing stops at the first block that
    doesn't start with ``WARC/`` instead of raising mid-file."""
    pos, n = 0, len(data)
    while pos < n:
        while data.startswith(b"\r\n", pos) or data.startswith(b"\n", pos):
            pos += 2 if data.startswith(b"\r\n", pos) else 1
        if pos >= n or not data.startswith(b"WARC/", pos):
            break
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        block = data[pos:hdr_end].decode("utf-8", "replace")
        for line in block.split("\r\n")[1:]:  # [0] is the version line
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get("content-length", "0"))
        except ValueError:
            break
        body_start = hdr_end + 4
        yield headers, data[body_start : body_start + clen], pos, body_start + clen
        pos = body_start + clen


def _split_http(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content-type, body) of an HTTP message payload; the
    payload comes back whole when no header/body split exists."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return None, None, payload
    head = payload[:sep].decode("latin-1", "replace")
    lines = head.split("\r\n")
    status: int | None = None
    ctype: str | None = None
    first = lines[0].split()
    if len(first) >= 2 and first[0].startswith("HTTP/"):
        try:
            status = int(first[1])
        except ValueError:
            status = None
    for line in lines[1:]:
        if ":" in line:
            k, v = line.split(":", 1)
            if k.strip().lower() == "content-type":
                ctype = v.strip()
    return status, ctype, payload[sep + 4 :]


def read_warc(
    path: str,
    glob: str | None = "*.warc*",
    record_types: tuple[str, ...] | None = ("response",),
    parse_http: bool = True,
    chunk_rows: int = 256,
    **options: Any,
) -> Source:
    """WARC archives → one row per record: (file, record_id, warc_type,
    url, warc_date, content_type, http_status, http_content_type,
    payload_length, payload).

    ``record_types`` filters at parse time (default keeps only
    ``response`` — the fetched pages; pass ``None`` for everything incl.
    warcinfo/request/metadata). ``parse_http`` splits the HTTP envelope
    of application/http payloads so ``payload`` is the BODY (the HTML)
    and status/content-type become columns; with ``parse_http=False``
    the raw record block is returned. ``chunk_rows`` bounds each Arrow
    output batch so huge archives stream instead of materializing one
    batch per file.

    Compose: ``read_warc(...)`` → filter ``http_status = 200 AND
    http_content_type LIKE 'text/html%'`` → ``web.html_to_text`` →
    the corpus pipeline. Filters on the metadata columns happen after
    parse (the gzip layout makes scan-level pushdown impossible without
    an external CDX index — documented trade)."""

    def _read(spark: SparkSession) -> DataFrame:
        reader = spark.read.format("binaryFile")
        if glob:
            reader = reader.option("pathGlobFilter", glob)
        for k, v in options.items():
            reader = reader.option(k, v)
        files = reader.load(path).select("path", "content")

        # `is not None`, not truthiness: an empty tuple is an empty FILTER
        # (keep nothing), the opposite of the keep-everything None
        wanted = (
            {t.lower() for t in record_types} if record_types is not None else None
        )

        def _parse(batches):
            import pandas as pd

            for pdf in batches:
                rows: list[tuple] = []
                for fpath, blob in zip(pdf["path"], pdf["content"]):
                    raw = bytes(blob)
                    compressed = raw[:2] == b"\x1f\x8b"
                    for chunk, moff, mlen in _iter_members(raw):
                        for hdr, payload, rs, re_ in _iter_warc_records(chunk):
                            wtype = hdr.get("warc-type", "")
                            if wanted is not None and wtype.lower() not in wanted:
                                continue
                            status = http_ct = None
                            body = payload
                            if parse_http and "application/http" in hdr.get(
                                "content-type", ""
                            ):
                                status, http_ct, body = _split_http(payload)
                            # locator: the gzip member for compressed files
                            # (intra-member position is unseekable), the
                            # record block itself for plain ones
                            off, length = (moff, mlen) if compressed else (
                                rs, re_ - rs,
                            )
                            rows.append(
                                (
                                    fpath,
                                    hdr.get("warc-record-id"),
                                    wtype,
                                    hdr.get("warc-target-uri"),
                                    hdr.get("warc-date"),
                                    hdr.get("content-type"),
                                    status,
                                    http_ct,
                                    len(body),
                                    body,
                                    off,
                                    length,
                                )
                            )
                            if len(rows) >= chunk_rows:
                                yield pd.DataFrame(
                                    rows, columns=WARC_SCHEMA.names
                                )
                                rows = []
                if rows:
                    yield pd.DataFrame(rows, columns=WARC_SCHEMA.names)

        return files.mapInPandas(_parse, WARC_SCHEMA)

    return _read
