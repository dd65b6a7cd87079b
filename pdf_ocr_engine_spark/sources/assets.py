"""Executor-local asset distribution (S6 — the reference's model cache).

The reference ships Tesseract traineddata to a read-only cache the worker
opens at init (``/root/reference/src/lib/ocr/ocr.ts:52-55``).  The Spark
analog: ship the file with ``spark-submit --files`` (or
``sc.addFile`` programmatically), and open it executor-side via
``SparkFiles.get`` ONCE per Python worker — at the UDF init point, never
inside the batch loop.  This module is that mechanism, carrying a real
asset the pipeline actually uses: a wordlist of legitimately-hyphenated
compounds that hyphenation repair must not fuse
(``core/hyphen.repair_hyphenation`` exceptions).

Load discipline (the part a model-backed decoder inherits unchanged):

* ``load_asset_words`` memoizes per (worker) process — a worker that runs
  many tasks/batches reads the file from disk once;
* resolution order: ``SparkFiles.get`` (the ``--files`` drop point) →
  the packaged default under ``pdf_ocr_engine_spark/data/`` — so the
  pipeline still runs when no ``--files`` was passed;
* set ``SPARK_GRAFT_ASSET_AUDIT`` to a writable path and every *disk
  read* appends one line ``<pid>\t<resolved path>`` — the observability
  hook tests use to assert once-per-task loading.
"""

from __future__ import annotations

import os
import threading

__all__ = ["HYPHEN_EXCEPTIONS_ASSET", "ship_asset", "load_asset_words",
           "packaged_asset_path"]

HYPHEN_EXCEPTIONS_ASSET = "hyphen_exceptions.txt"

_CACHE: dict[str, frozenset[str]] = {}
_LOCK = threading.Lock()


def packaged_asset_path(name: str) -> str:
    """Path of the asset bundled inside the package (the no-``--files``
    fallback)."""
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", name)


def ship_asset(spark, path: str | None = None,
               name: str = HYPHEN_EXCEPTIONS_ASSET) -> str:
    """Driver-side: distribute the asset to every executor's task dir —
    the programmatic twin of ``spark-submit --files <path>``.  Returns the
    path that was shipped."""
    p = path or packaged_asset_path(name)
    spark.sparkContext.addFile(p)
    return p


def _resolve(name: str) -> str:
    try:
        from pyspark import SparkFiles
        p = SparkFiles.get(name)
        if os.path.isfile(p):
            return p
    except Exception:  # noqa: BLE001 - no active Spark files root
        pass
    return packaged_asset_path(name)


def load_asset_words(name: str = HYPHEN_EXCEPTIONS_ASSET,
                     audit_path: str | None = None) -> frozenset[str]:
    """Executor-side: the asset as a lowercase word set, read from disk at
    most once per worker process (call this at the UDF init point; repeat
    calls — later tasks, later batches — hit the in-process cache).

    ``audit_path``: one line ``<pid>\\t<resolved path>`` is appended per
    DISK read (cache hits write nothing).  Callers in UDFs capture the
    driver's ``SPARK_GRAFT_ASSET_AUDIT`` into the closure — pre-forked
    Python workers don't inherit driver env changes."""
    with _LOCK:
        cached = _CACHE.get(name)
        if cached is not None:
            return cached
        path = _resolve(name)
        with open(path, encoding="utf-8") as f:
            words = frozenset(
                w.strip().lower() for w in f
                if w.strip() and not w.startswith("#"))
        audit = audit_path or os.environ.get("SPARK_GRAFT_ASSET_AUDIT")
        if audit:
            with open(audit, "a", encoding="utf-8") as af:
                af.write(f"{os.getpid()}\t{path}\n")
        _CACHE[name] = words
        return words
