"""WARC ingest — Common-Crawl-shaped archives -> PAGES_SCHEMA rows.

The reference ingests from warehouse tables only; this engine's input
domain (BASELINE.json input_hint) is Common-Crawl-style web pages, and
the archival format those actually ship in is WARC (ISO 28500):
length-prefixed records, one HTTP response per crawled page, usually
as per-record gzip members concatenated into a .warc.gz. This module
reads that format with zero extra dependencies:

- `spark.read.format("binaryFile")` assigns ONE FILE PER TASK — the
  natural WARC parallelism (a crawl segment is thousands of ~1 GB
  files; at 100 TB the cluster width is the file count, and no file
  exceeds binaryFile's 2 GB cap in practice).
- `mapInPandas` streams each file through a pure-Python record parser
  (Arrow-batched, never per-row Python against Spark rows; the
  per-record loop is plain bytes work inside one task).
- gzip is handled member-by-member with zlib (a .warc.gz is MANY
  concatenated members — single-shot gzip.decompress semantics differ
  across versions, so the loop is explicit).

Output matches PAGES_SCHEMA exactly: (url, warc_ts, html, text,
lang). `text` is empty ("") — the extract stage derives
`extracted_text` from html downstream; the `text` column's
byte-identity contract applies to corpora that ship a reference text,
which a raw WARC does not. `lang` defaults to "und" (blocking
lang-scopes keys; "und" keeps all WARC pages in one scope until
doc_langid stamps a real code).

No silent drops: records that are not WARC responses are skipped by
design; MALFORMED records stop that file's parse and are counted, and
a nonempty archive yielding zero pages raises instead of returning an
empty frame (same stance as ngram_jaccard_pairs' cap guard).
"""

from __future__ import annotations

import zlib
from datetime import datetime
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_CRLF2 = b"\r\n\r\n"


def _gunzip_members(data: bytes) -> bytes:
    """Decompress ALL gzip members concatenated in `data`."""
    out = []
    while data:
        d = zlib.decompressobj(wbits=31)  # 31 = gzip wrapper
        out.append(d.decompress(data))
        out.append(d.flush())
        if not d.eof:  # truncated member
            raise ValueError("truncated gzip member in WARC")
        data = d.unused_data
    return b"".join(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n")[1:]:  # [0] is the version/status line
        k, sep, v = line.partition(b":")
        if sep:
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1", errors="replace"
            )
    return headers


def iter_warc_records(data: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Yield (warc_headers, block_bytes) per record; pure function,
    unit-testable without Spark. Raises ValueError on a structurally
    malformed record (bad magic, missing/short Content-Length)."""
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record padding
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"bad WARC magic at byte {pos}")
        head_end = data.find(_CRLF2, pos)
        if head_end < 0:
            raise ValueError("unterminated WARC header block")
        headers = _parse_headers(data[pos:head_end])
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as e:
            raise ValueError("missing/invalid Content-Length") from e
        body_start = head_end + len(_CRLF2)
        body_end = body_start + length
        if body_end > n:
            raise ValueError("record body exceeds file size")
        yield headers, data[body_start:body_end]
        pos = body_end


def _http_body(block: bytes) -> bytes:
    """Payload of an HTTP response block (strip status line+headers)."""
    i = block.find(_CRLF2)
    return block[i + len(_CRLF2) :] if i >= 0 else block


def _warc_ts(value: str) -> datetime:
    # WARC-Date is ISO 8601 UTC, e.g. 2017-03-22T17:42:48Z
    return datetime.strptime(value, "%Y-%m-%dT%H:%M:%SZ")


def pages_from_warc_bytes(
    raw: bytes, source: str = "<bytes>"
) -> tuple[list[tuple], int]:
    """Parse one WARC (plain or gzip) into PAGES_SCHEMA tuples.

    Returns (rows, n_malformed): a structural error mid-file stops
    that file's parse and counts it, so one corrupt archive cannot
    kill a 10k-file read while still being observable."""
    if raw[:2] == b"\x1f\x8b":
        raw = _gunzip_members(raw)
    rows: list[tuple] = []
    malformed = 0
    try:
        for headers, block in iter_warc_records(raw):
            if headers.get("warc-type") != "response":
                continue  # request/metadata/warcinfo records, by design
            url = headers.get("warc-target-uri")
            date = headers.get("warc-date")
            if not url or not date:
                malformed += 1
                continue
            try:
                ts = _warc_ts(date)
            except ValueError:
                malformed += 1
                continue
            rows.append((url, ts, bytearray(_http_body(block)), "", "und"))
    except ValueError:
        malformed += 1
    return rows, malformed


def read_warc(spark: SparkSession, path: str, *, path_glob: str = "*.warc*") -> DataFrame:
    """Read WARC file(s) at `path` into a PAGES_SCHEMA DataFrame.

    One file = one task (binaryFile semantics) = one Arrow batch of
    parsed pages; downstream fan_out widens further when files are
    fewer than cores. Raises (inside the task, failing the job loudly)
    if a nonempty archive parses to zero pages.
    """
    from entity_resolution_spark.datagen import PAGES_SCHEMA

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", path_glob)
        .load(path)
        .select("path", "content")
    )

    def parse(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path_, content in zip(pdf["path"], pdf["content"]):
                rows, malformed = pages_from_warc_bytes(bytes(content), source=path_)
                if not rows and len(content) > 0:
                    raise ValueError(
                        f"WARC {path_}: 0 pages parsed "
                        f"({malformed} malformed record(s)) — refusing to "
                        "return a silently empty read"
                    )
                yield pd.DataFrame(
                    rows, columns=["url", "warc_ts", "html", "text", "lang"]
                )

    return files.mapInPandas(parse, schema=PAGES_SCHEMA)
