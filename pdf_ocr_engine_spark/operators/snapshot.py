"""Snapshot delta — incremental processing between corpus crawls.

Web corpora arrive as periodic snapshots (monthly Common Crawl dumps);
reprocessing 100 TB from scratch each time wastes the cluster on the
~95% that did not change.  ``snapshot_delta`` classifies every document
across two snapshots so downstream stages (extraction, dedup, indexing)
run on the delta only:

* ``added``     — key only in the new snapshot
* ``removed``   — key only in the old snapshot
* ``changed``   — key in both, content fingerprints differ
* ``unchanged`` — key in both, fingerprints equal

Scale shape: ONE full-outer join on the key — with both snapshot tables
written bucketed by the key (the natural layout for this workload) the
join is a co-partitioned sort-merge with zero shuffle; otherwise it is
one shuffle per side.  The fingerprint is computed per side before the
join (narrow), so the join carries two small columns, never the texts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text_funcs import fingerprint

__all__ = ["snapshot_delta"]


def snapshot_delta(old: DataFrame, new: DataFrame, key_col: str = "url",
                   text_col: str = "text",
                   fingerprint_col: Column | None = None) -> DataFrame:
    """``(key, change)`` for every key in either snapshot.  ``change`` ∈
    added / removed / changed / unchanged.  Content identity is the
    normalized-text fingerprint (``functions.text_funcs.fingerprint``)
    unless ``fingerprint_col`` supplies a custom expression."""
    fp = (fingerprint_col if fingerprint_col is not None
          else fingerprint(F.col(text_col)))
    # presence tracked with explicit markers, never fp nullness: a doc
    # with NULL text (decode_error rows are realistic inputs) present in
    # both snapshots must classify by content, not as added/removed
    o = old.select(F.col(key_col).alias("key"), fp.alias("__fp_old"),
                   F.lit(True).alias("__in_old"))
    n = new.select(F.col(key_col).alias("key"), fp.alias("__fp_new"),
                   F.lit(True).alias("__in_new"))
    joined = o.join(n, "key", "full_outer")
    return joined.select(
        F.col("key").alias(key_col),
        F.when(F.col("__in_old").isNull(), F.lit("added"))
         .when(F.col("__in_new").isNull(), F.lit("removed"))
         .when(F.col("__fp_old").eqNullSafe(F.col("__fp_new")),
               F.lit("unchanged"))
         .otherwise(F.lit("changed")).alias("change"))
