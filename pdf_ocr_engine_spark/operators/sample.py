"""Deterministic sampling operators — eval splits and per-host caps.

Two operations every large-scale training-data pipeline needs and that
must be REPRODUCIBLE across runs, engines, and cluster sizes (a random()
split re-drawn per run silently leaks eval documents into training):

* :func:`deterministic_split` — train/eval membership from a salted md5
  of the document key.  Pure narrow column expressions (whole-stage
  codegen, no shuffle, no RNG state): the same document lands in the
  same split on any cluster, any partitioning, any engine that can
  compute md5 — which is exactly what makes the DuckDB oracle possible.
* :func:`cap_per_host` — keep at most N documents per host (the
  C4/Gopher-style guard against a single domain dominating the corpus),
  selected deterministically by hashed order so reruns keep the SAME
  documents, not an arbitrary N.

Scale notes (100 TB):
* The split adds zero shuffles.  The cap shuffles once on host — the
  corpus' natural skew axis; the output is bounded at ``max_per_host``
  rows per host, so the *result* never hot-spots.  For a pathological
  mega-host whose INPUT rows overwhelm one window task, pre-prune with
  the same hash order: ``df.where(hash16(key) < t)`` for a threshold
  chosen from an approximate per-host count, then cap exactly — the
  deterministic order makes the two-pass refinement consistent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..plans.pipeline import host_col

__all__ = ["cap_per_host", "deterministic_split", "hash16"]


def hash16(key: Column, salt: str = "") -> Column:
    """First 16 bits of md5(key ∥ salt) as a 4-char hex STRING — uniform,
    engine-portable (lexicographic compare == numeric compare on fixed-
    width hex), and stable forever.  The basis of both operators."""
    return F.substring(F.md5(F.concat(key, F.lit(salt))), 1, 4)


def deterministic_split(df: DataFrame, eval_fraction: float = 0.01,
                        key_col: str = "url",
                        salt: str = "split-v1") -> DataFrame:
    """Add a ``split`` column ('train' / 'eval'): eval iff the 16-bit key
    hash falls below ``⌊eval_fraction·65536⌋``.  Deterministic per key —
    re-runs, engine swaps, and repartitions cannot move a document across
    the split boundary.  Granularity is 1/65536 ≈ 0.0015%."""
    if not 0.0 <= eval_fraction <= 1.0:
        raise ValueError(f"eval_fraction {eval_fraction} outside [0, 1]")
    thr_n = int(eval_fraction * 65536)
    if thr_n >= 65536:
        # fraction == 1.0: format() would yield the 5-char '10000', which
        # loses the fixed-width lexicographic compare — short-circuit
        return df.withColumn("split", F.lit("eval"))
    thr = format(thr_n, "04x")
    return df.withColumn(
        "split",
        F.when(hash16(F.col(key_col), salt) < F.lit(thr),
               F.lit("eval")).otherwise(F.lit("train")))


def cap_per_host(df: DataFrame, max_per_host: int,
                 key_col: str = "url") -> DataFrame:
    """Keep at most ``max_per_host`` documents per host, chosen by
    deterministic hashed order (md5 of the key, key as tie-break) — NOT by
    input order, which varies with partitioning.  One shuffle on host;
    output bounded per host by construction.

    Keys that yield NO host (scheme-less / malformed urls all regex-
    extract to ``''``) pass through uncapped: they are unrelated
    documents, not one domain — collapsing millions of them into a single
    ``''`` partition's cap would silently drop almost all of them."""
    if max_per_host < 1:
        raise ValueError("max_per_host must be >= 1")
    host = host_col(F.col(key_col))
    w = (Window.partitionBy(host)
         .orderBy(F.md5(F.col(key_col)), F.col(key_col)))
    return (df.withColumn("__host", host)
            .withColumn("__rn", F.row_number().over(w))
            .where((F.col("__rn") <= max_per_host)
                   | (F.col("__host") == ""))
            .drop("__rn", "__host"))
