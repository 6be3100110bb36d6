"""WARC source: record parsing, gzip-member handling, PAGES_SCHEMA
shape, skip/malformed accounting, and pipeline compatibility."""

from __future__ import annotations

import gzip
from datetime import datetime

import pytest

from entity_resolution_spark.sources.warc import (
    iter_warc_records,
    pages_from_warc_bytes,
    read_warc,
)


def _record(wtype: str, url: str | None = None, body: bytes = b"",
            date: str = "2017-03-22T17:42:48Z", length: int | None = None) -> bytes:
    head = [b"WARC/1.0", f"WARC-Type: {wtype}".encode()]
    if url is not None:
        head.append(f"WARC-Target-URI: {url}".encode())
    head.append(f"WARC-Date: {date}".encode())
    head.append(f"Content-Length: {length if length is not None else len(body)}".encode())
    return b"\r\n".join(head) + b"\r\n\r\n" + body + b"\r\n\r\n"


def _response(url: str, html: bytes, **kw) -> bytes:
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
    return _record("response", url=url, body=http, **kw)


HTML_A = b"<html><title>A</title><body>alpha text</body></html>"
HTML_B = b"<html><title>B</title><body>beta text</body></html>"


def _archive() -> bytes:
    return (
        _record("warcinfo", body=b"software: test\r\n")
        + _response("http://a.example/x", HTML_A)
        + _record("request", url="http://a.example/x", body=b"GET /x HTTP/1.1\r\n")
        + _response("http://b.example/y", HTML_B)
    )


def test_iter_warc_records_and_types():
    recs = list(iter_warc_records(_archive()))
    assert [h["warc-type"] for h, _ in recs] == [
        "warcinfo", "response", "request", "response",
    ]
    assert recs[1][0]["warc-target-uri"] == "http://a.example/x"


def test_pages_from_warc_bytes_plain_and_gzip_members():
    rows, malformed = pages_from_warc_bytes(_archive())
    assert malformed == 0
    assert [(r[0], bytes(r[2])) for r in rows] == [
        ("http://a.example/x", HTML_A),
        ("http://b.example/y", HTML_B),
    ]
    assert rows[0][1] == datetime(2017, 3, 22, 17, 42, 48)
    assert rows[0][3] == "" and rows[0][4] == "und"

    # Common-Crawl shape: each record its own gzip member, concatenated
    gz = b"".join(gzip.compress(_record("warcinfo", body=b"x"))
                  for _ in range(1)) + gzip.compress(
        _response("http://a.example/x", HTML_A)
    ) + gzip.compress(_response("http://b.example/y", HTML_B))
    rows_gz, malformed_gz = pages_from_warc_bytes(gz)
    assert malformed_gz == 0
    assert [(r[0], bytes(r[2])) for r in rows_gz] == [
        ("http://a.example/x", HTML_A),
        ("http://b.example/y", HTML_B),
    ]


def test_malformed_record_stops_file_but_keeps_prior_rows():
    # second record lies about its length -> structural error after
    # the first good page; the good page survives, the error is counted
    bad = _response("http://a.example/x", HTML_A) + _record(
        "response", url="http://b.example/y", body=b"short", length=10_000
    )
    rows, malformed = pages_from_warc_bytes(bad)
    assert [r[0] for r in rows] == ["http://a.example/x"]
    assert malformed == 1


def test_read_warc_spark_roundtrip(spark, tmp_path):
    (tmp_path / "seg0.warc").write_bytes(_archive())
    (tmp_path / "seg1.warc.gz").write_bytes(
        gzip.compress(_response("http://c.example/z", HTML_A))
    )
    df = read_warc(spark, str(tmp_path))
    got = {r["url"]: bytes(r["html"]) for r in df.collect()}
    assert got == {
        "http://a.example/x": HTML_A,
        "http://b.example/y": HTML_B,
        "http://c.example/z": HTML_A,
    }
    assert [f.name for f in df.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]


def test_read_warc_refuses_silently_empty_file(spark, tmp_path):
    # nonempty bytes, zero parseable pages -> the job must fail loudly
    (tmp_path / "junk.warc").write_bytes(b"this is not a warc at all")
    with pytest.raises(Exception, match="0 pages"):
        read_warc(spark, str(tmp_path)).collect()


def test_warc_pages_run_the_pipeline(spark, tmp_path):
    from entity_resolution_spark.plans.pipeline import EntityResolutionPipeline

    # two byte-identical pages at different urls -> one entity;
    # one distinct page -> its own entity
    arc = (
        _response("http://a.example/x", HTML_A)
        + _response("http://mirror.example/x", HTML_A)
        + _response("http://b.example/y", HTML_B)
    )
    (tmp_path / "seg.warc").write_bytes(arc)
    pages = read_warc(spark, str(tmp_path))
    ents = EntityResolutionPipeline().run(pages)
    by_url = {r["url"]: r["entity_id"] for r in ents.collect()}
    assert len(by_url) == 3
    assert by_url["http://a.example/x"] == by_url["http://mirror.example/x"]
    assert by_url["http://b.example/y"] != by_url["http://a.example/x"]
