"""Shared table schemas — single source of truth for the input_hint shape."""

from __future__ import annotations

from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: BASELINE.json input_hint: the Common-Crawl-style pages table.  ``url`` is
#: nullable because raw WARC records may lack a WARC-Target-URI; the
#: extraction DAG routes such rows by status rather than dropping them.
PAGES_SCHEMA = StructType([
    StructField("url", StringType(), True),
    StructField("warc_ts", TimestampType(), True),
    StructField("html", BinaryType(), True),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
])
