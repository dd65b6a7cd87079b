"""Sequence packing — documents → fixed-size training context windows.

GPT-style pretraining concatenates documents in a deterministic order and
splits the token stream at context-window boundaries (documents cross
boundaries; an EOS token separates them).  The operator computes, for
every document, WHERE its tokens land: ``(bucket, seq_id, offset)`` —
enough for a writer to materialize shards without ever holding more than
one partition's documents.

Spark-first shape (100 TB):
* the corpus is first split into ``16^bucket_hex_chars`` independent
  **buckets** by key hash — each bucket is a training shard, packed
  independently, so the expensive running sum is a window PARTITIONED by
  bucket: every bucket packs in parallel, no global ordering, no
  single-task bottleneck (raise ``bucket_hex_chars`` as the corpus
  grows; 3 hex chars = 4096-way parallelism);
* within a bucket the order is the hashed key (reproducible across runs
  and engines — the same property the split/cap operators rely on), and
  the running token sum is an exclusive window cumsum: one shuffle total.

The arithmetic is pure integer column expressions, so the DuckDB oracle
recomputes every document's placement exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_sequences"]


def pack_sequences(df: DataFrame, window_tokens: int = 2048,
                   bucket_hex_chars: int = 2, key_col: str = "url",
                   n_tokens_col: str | Column = "n_tokens") -> DataFrame:
    """Assign every document its packed position: ``bucket`` (hex shard
    id), ``seq_id`` (context window index within the bucket), ``offset``
    (token offset where the document starts inside that window) and the
    carried ``n_tokens``.  A document with ``offset + n_tokens >
    window_tokens`` continues into the following window(s) — the standard
    contiguous-packing semantics."""
    if window_tokens < 1:
        raise ValueError("window_tokens must be >= 1")
    if not 1 <= bucket_hex_chars <= 4:
        raise ValueError("bucket_hex_chars must be in [1, 4]")
    ntok = (F.col(n_tokens_col) if isinstance(n_tokens_col, str)
            else n_tokens_col).cast("long")
    key = F.col(key_col)
    bucket = F.substring(F.md5(key), 1, bucket_hex_chars)
    w = (Window.partitionBy("bucket")
         .orderBy(F.md5(key), key)
         .rowsBetween(Window.unboundedPreceding, -1))
    out = (df.withColumn("bucket", bucket)
           .withColumn("__ntok", ntok)
           .withColumn("__cum_before",
                       F.coalesce(F.sum("__ntok").over(w), F.lit(0)))
           .select(
               key_col, "bucket",
               F.floor(F.col("__cum_before") / window_tokens)
                .alias("seq_id"),
               F.pmod(F.col("__cum_before"), F.lit(window_tokens))
                .cast("long").alias("offset"),
               F.col("__ntok").alias("n_tokens")))
    return out
