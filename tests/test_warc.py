"""WARC source (sources.warc): synthetic archives round-tripped through
the distributed reader — plain and per-record-gzip layouts, HTTP envelope
splitting, record-type filtering, and the compose-with-html_to_text path."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from mini_etl_spark.sources.warc import read_warc


def _record(wtype: str, uri: str | None, payload: bytes, extra: str = "") -> bytes:
    hdrs = [
        "WARC/1.0",
        f"WARC-Type: {wtype}",
        f"WARC-Record-ID: <urn:uuid:{wtype}-{uri or 'none'}>",
        "WARC-Date: 2024-01-02T03:04:05Z",
    ]
    if uri:
        hdrs.append(f"WARC-Target-URI: {uri}")
    if extra:
        hdrs.append(extra)
    hdrs.append(f"Content-Length: {len(payload)}")
    head = "\r\n".join(hdrs).encode() + b"\r\n\r\n"
    return head + payload + b"\r\n\r\n"


def _http_response(body: bytes, ctype: str = "text/html") -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype.encode()
        + b"\r\nServer: x\r\n\r\n" + body
    )


HTML_A = b"<html><body><h1>Alpha</h1><p>Tom &amp; Jerry</p></body></html>"
HTML_B = b"<html><body><p>Beta page</p></body></html>"


def _archive() -> bytes:
    return (
        _record("warcinfo", None, b"software: synthetic\r\n",
                extra="Content-Type: application/warc-fields")
        + _record("request", "https://a.example.com/x",
                  b"GET /x HTTP/1.1\r\nHost: a.example.com\r\n\r\n",
                  extra="Content-Type: application/http; msgtype=request")
        + _record("response", "https://a.example.com/x",
                  _http_response(HTML_A),
                  extra="Content-Type: application/http; msgtype=response")
        + _record("response", "https://b.example.org/y",
                  _http_response(HTML_B),
                  extra="Content-Type: application/http; msgtype=response")
    )


@pytest.fixture()
def warc_dir(tmp_path):
    (tmp_path / "plain.warc").write_bytes(_archive())
    # per-record gzip members, the Common-Crawl layout: each record its own
    # gzip member, concatenated
    members = b"".join(
        gzip.compress(_record("response", f"https://gz.example.net/{i}",
                              _http_response(f"<p>gz {i}</p>".encode()),
                              extra="Content-Type: application/http; msgtype=response"))
        for i in range(3)
    )
    (tmp_path / "cc.warc.gz").write_bytes(members)
    return str(tmp_path)


def test_read_warc_responses(spark, warc_dir):
    df = read_warc(warc_dir)(spark)
    rows = {r["url"]: r for r in df.collect()}
    assert len(rows) == 5  # 2 plain + 3 gz responses; request/warcinfo dropped
    a = rows["https://a.example.com/x"]
    assert a["warc_type"] == "response"
    assert a["http_status"] == 200
    assert a["http_content_type"] == "text/html"
    assert bytes(a["payload"]) == HTML_A  # HTTP envelope stripped
    assert a["payload_length"] == len(HTML_A)
    assert a["warc_date"] == "2024-01-02T03:04:05Z"
    assert "cc.warc.gz" in rows["https://gz.example.net/0"]["file"]


def test_read_warc_all_types_raw(spark, warc_dir):
    df = read_warc(warc_dir, record_types=None, parse_http=False)(spark)
    got = {(r["warc_type"], r["url"]) for r in df.collect()}
    assert ("warcinfo", None) in got
    assert ("request", "https://a.example.com/x") in got
    # raw mode: payload keeps the HTTP envelope
    raw = {r["url"]: bytes(r["payload"]) for r in df.collect()
           if r["warc_type"] == "response" and r["url"].startswith("https://a.")}
    assert raw["https://a.example.com/x"].startswith(b"HTTP/1.1 200 OK")


def test_warc_to_text_pipeline(spark, warc_dir):
    """The crawl on-ramp end-to-end: WARC → 200s → html_to_text → rows."""
    from mini_etl_spark.functions.web import html_to_text, url_host

    df = read_warc(warc_dir)(spark)
    out = (
        df.filter((F.col("http_status") == 200)
                  & F.col("http_content_type").startswith("text/html"))
        .select(
            url_host(F.col("url")).alias("host"),
            html_to_text(F.col("payload").cast("string")).alias("text"),
        )
    )
    texts = {r["host"]: r["text"] for r in out.collect()}
    assert texts["a.example.com"] == "Alpha\n\nTom & Jerry"  # </h1><p> = ¶ break
    assert texts["b.example.org"] == "Beta page"


def test_warc_truncated_tail_tolerated(spark, tmp_path):
    data = _archive() + b"GARBAGE-NOT-A-RECORD"
    (tmp_path / "t.warc").write_bytes(data)
    df = read_warc(str(tmp_path))(spark)
    assert df.count() == 2  # parses the good prefix, no exception


def test_warc_chunked_output(spark, tmp_path):
    """chunk_rows bounds Arrow batches without losing records."""
    many = b"".join(
        _record("response", f"https://s.example.com/{i}",
                _http_response(f"<p>{i}</p>".encode()),
                extra="Content-Type: application/http; msgtype=response")
        for i in range(100)
    )
    (tmp_path / "many.warc").write_bytes(many)
    df = read_warc(str(tmp_path), chunk_rows=7)(spark)
    assert df.count() == 100
    assert df.select("url").distinct().count() == 100


def test_warc_cdx_offsets_seekable(spark, warc_dir):
    """The CDX contract: (record_offset, record_length) recovers each
    record from the ORIGINAL file with one ranged read — seek, read,
    (gunzip), parse — for both plain and per-record-gzip layouts."""
    import gzip as _gzip
    import os

    from mini_etl_spark.sources.warc import _iter_warc_records

    df = read_warc(warc_dir)(spark)
    for r in df.collect():
        fpath = r["file"].replace("file:", "")
        with open(fpath, "rb") as f:
            f.seek(r["record_offset"])
            blob = f.read(r["record_length"])
        if os.path.basename(fpath).endswith(".gz"):
            blob = _gzip.decompress(blob)
        recs = list(_iter_warc_records(blob))
        assert any(h.get("warc-target-uri") == r["url"] for h, _, _, _ in recs), r["url"]
