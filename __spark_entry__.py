"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``pdf_ocr_engine_spark`` (see SURVEY.md §2 for the
operator inventory each query maps to); this module is the thin contract
surface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pdf_ocr_engine_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full extraction pipeline
    (sniff → decode → layout reconstruction → assemble) over the documents
    table wrapped as Common-Crawl-style pages, with per-partition lineage."""
    from pdf_ocr_engine_spark.queries import q_extract_documents

    return q_extract_documents(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2 plus the
    training-data-pipeline operators (dedup / similarity / text analysis /
    multimodal).  Each callable takes (spark, sf_dir) → DataFrame; all
    computed columns are aliased identically to the oracle SQL."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin per query — EVERY registry entry has
    one (55/55).  The LSH tiers (dedup_minhash, dedup_simhash,
    dedup_embedding_lsh, ann_lsh) are value-checked via their
    containment/recall property: the oracle recomputes all above-threshold
    pairs (or the true top-k over planted near-duplicates) from scratch,
    so a hash match proves the bucketed candidate generation lost
    nothing."""
    return dict(ORACLES)
