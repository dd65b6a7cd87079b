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
* the HTTP payload is properly decoded: chunked ``Transfer-Encoding`` is
  de-chunked, ``Content-Encoding: gzip/deflate`` decompressed (best-effort —
  undecodable bodies pass through raw), and LF-only header separators are
  tolerated;
* malformed records are skipped and resynced (errors-as-values — a bad
  record or a truncated archive never fails the task); per-file parse
  health is observable via :func:`warc_scan_report` (file, n_response,
  n_bad, parse_error).

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

from .schemas import PAGES_SCHEMA

__all__ = ["PAGES_SCHEMA", "parse_warc", "http_body", "warc_pages",
           "warc_scan_report", "write_warc"]

_CRLF2 = b"\r\n\r\n"

#: records per Arrow output batch — bounds peak memory and stays far under
#: Arrow's 2 GiB int32 offset cap for binary arrays even at 1 MB/page
_BATCH_RECORDS = 1024


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
            length = -1
        # negative length would walk pos BACKWARDS (infinite loop on a
        # crafted record); over-long length means a truncated archive whose
        # chopped payload must not enter the table as a healthy page
        if length < 0 or head_end + 4 + length > n:
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
    """Decode a response record's block to the entity body: strip the HTTP
    envelope (CRLF or bare-LF separators), de-chunk ``Transfer-Encoding:
    chunked``, and decompress ``Content-Encoding: gzip/deflate`` —
    best-effort: anything undecodable passes through raw (the downstream
    sniffer routes it to a status, never a crash)."""
    if not block.startswith(b"HTTP/"):
        return block
    sep = block.find(_CRLF2)
    sep_len = 4
    if sep < 0:
        sep = block.find(b"\n\n")  # LF-only servers exist in real crawls
        sep_len = 2
        if sep < 0:
            return block
    head = block[:sep].decode("latin-1", errors="replace").lower()
    body = block[sep + sep_len:]
    hdrs = {}
    for line in head.split("\n")[1:]:
        k, _, v = line.partition(":")
        if _:
            hdrs[k.strip()] = v.strip()
    if "chunked" in hdrs.get("transfer-encoding", ""):
        body = _dechunk(body)
    enc = hdrs.get("content-encoding", "")
    try:
        if "gzip" in enc:
            body = gzip.decompress(body)
        elif "deflate" in enc:
            import zlib

            try:
                body = zlib.decompress(body)
            except zlib.error:
                body = zlib.decompress(body, -zlib.MAX_WBITS)  # raw deflate
    except Exception:  # noqa: BLE001 - keep the raw bytes, sniffer decides
        pass
    return body


def _dechunk(body: bytes) -> bytes:
    """Decode HTTP/1.1 chunked transfer coding; returns raw input if the
    chunk framing is broken partway (best-effort)."""
    out = bytearray()
    pos = 0
    try:
        while True:
            eol = body.index(b"\r\n", pos)
            size = int(body[pos:eol].split(b";")[0], 16)
            if size == 0:
                break
            out += body[eol + 2:eol + 2 + size]
            pos = eol + 2 + size + 2  # skip chunk + trailing CRLF
    except (ValueError, IndexError):
        return bytes(body)
    return bytes(out)


def _parse_warc_date(s: str | None):
    import datetime as dt

    if not s:
        return None
    try:
        # WARC/1.1 allows fractional seconds; fromisoformat handles both
        return dt.datetime.fromisoformat(s.rstrip("Z"))
    except ValueError:
        return None


def warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """Read ``*.warc`` / ``*.warc.gz`` files under ``path`` into the
    input_hint pages shape.  One row per HTTP response record; ``lang``
    starts null (language-ID is a downstream operator)."""

    def run(batches):
        import pyarrow as pa

        def flush(urls, tss, payloads):
            return pa.record_batch([
                pa.array(urls, pa.string()),
                pa.array(tss, pa.timestamp("us")),
                pa.array(payloads, pa.binary()),
                pa.array([None] * len(urls), pa.string()),
                pa.array([None] * len(urls), pa.string()),
            ], names=["url", "warc_ts", "html", "text", "lang"])

        for b in batches:
            # chunked emission: never hold a whole decompressed archive's
            # payloads in one Arrow batch (int32 offset cap ≈ 2 GiB; CC
            # segments decompress to 3-5 GB)
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
                        if len(urls) >= _BATCH_RECORDS:
                            yield flush(urls, tss, payloads)
                            urls, tss, payloads = [], [], []
                except Exception:  # noqa: BLE001 - corrupt archive: rows
                    # already flushed stand; health is in warc_scan_report
                    continue
            if urls:
                yield flush(urls, tss, payloads)

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInArrow(run, PAGES_SCHEMA)


def warc_scan_report(spark: SparkSession, path: str) -> DataFrame:
    """Per-file parse health: ``(file, n_response, n_other, n_bad,
    parse_error)`` — the observability row for corrupt archives that
    :func:`warc_pages` (deliberately) skips past."""
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType([
        StructField("file", StringType(), False),
        StructField("n_response", IntegerType(), False),
        StructField("n_other", IntegerType(), False),
        StructField("n_bad", IntegerType(), False),
        StructField("parse_error", StringType(), True),
    ])

    def run(batches):
        import pyarrow as pa

        for b in batches:
            rows = {"file": [], "n_response": [], "n_other": [],
                    "n_bad": [], "parse_error": []}
            for fname, blob in zip(b.column("path"), b.column("content")):
                n_resp = n_other = n_bad = 0
                err = None
                try:
                    for rec in parse_warc(blob.as_py()):
                        if rec["type"] == "response":
                            n_resp += 1
                        elif rec["type"] == "_bad":
                            n_bad += 1
                        else:
                            n_other += 1
                except Exception as exc:  # noqa: BLE001
                    err = f"{type(exc).__name__}: {exc}"
                rows["file"].append(fname.as_py())
                rows["n_response"].append(n_resp)
                rows["n_other"].append(n_other)
                rows["n_bad"].append(n_bad)
                rows["parse_error"].append(err)
            yield pa.record_batch(
                [pa.array(rows["file"], pa.string()),
                 pa.array(rows["n_response"], pa.int32()),
                 pa.array(rows["n_other"], pa.int32()),
                 pa.array(rows["n_bad"], pa.int32()),
                 pa.array(rows["parse_error"], pa.string())],
                names=list(rows))

    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")
    return files.mapInArrow(run, schema)


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
