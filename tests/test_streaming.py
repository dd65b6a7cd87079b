"""Structured Streaming extraction: byte-identity through the streaming
path, and exactly-once incremental resume via the sink checkpoint."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from pdf_ocr_engine_spark.sources.fixtures import write_pages_parquet
from pdf_ocr_engine_spark.streaming.extract_stream import extract_stream

pytestmark = pytest.mark.spark


@pytest.fixture()
def stream_dirs(build_dir):
    base = os.path.join(build_dir, "stream_test")
    shutil.rmtree(base, ignore_errors=True)
    dirs = {k: os.path.join(base, k) for k in ("in", "out", "ckpt", "stage")}
    os.makedirs(dirs["in"])
    os.makedirs(dirs["stage"])
    return dirs


def _land_slice(dirs, corpus_path, name, lo, hi):
    """Land rows [lo, hi) of the staged corpus as one input file (goldens
    stay in staging — the watched dir must only see input_hint-shaped files)."""
    import pyarrow.parquet as pq

    table = pq.read_table(corpus_path).slice(lo, hi - lo)
    pq.write_table(table, os.path.join(dirs["in"], name))


def _drain(spark, dirs):
    q = extract_stream(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    q.awaitTermination()


def test_streaming_matches_golden_and_resumes(spark, stream_dirs):
    corpus = write_pages_parquet(
        os.path.join(stream_dirs["stage"], "corpus.parquet"), n_docs=110)

    # batch 1: 40 docs land
    _land_slice(stream_dirs, corpus, "part1.parquet", 0, 40)
    _drain(spark, stream_dirs)
    out1 = spark.read.parquet(stream_dirs["out"])
    assert out1.count() == 40

    # batch 2: 70 more docs land; resume from checkpoint must process ONLY
    # the new file (exactly-once), never duplicating batch 1.
    _land_slice(stream_dirs, corpus, "part2.parquet", 40, 110)
    _drain(spark, stream_dirs)
    out = spark.read.parquet(stream_dirs["out"])
    assert out.count() == 110
    assert out.select("url").distinct().count() == 110

    # byte-identity through the streaming path (same operator as batch)
    golden = spark.read.parquet(corpus.replace(".parquet", "_golden.parquet"))
    joined = out.join(golden, "url").select("text", "golden_text",
                                            "status", "golden_status")
    bad = joined.where(
        (F.col("status") != F.col("golden_status")) |
        (F.col("golden_text").isNotNull() &
         (F.col("text") != F.col("golden_text")))).count()
    assert bad == 0
