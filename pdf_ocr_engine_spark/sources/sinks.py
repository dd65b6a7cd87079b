"""Output sinks — Iceberg table or parquet path, one call.

The north_rule's production target is an Iceberg table (atomic commits give
the checkpoint manifests their commit point for free); this sandbox ships no
Iceberg runtime jar, so the parquet path is the tested one and the Iceberg
path is a thin, clearly-gated `writeTo` that activates when the catalog is
on the classpath (`spark-submit --packages org.apache.iceberg:...` +
catalog conf).

Target syntax:

* ``iceberg:db.table``  → ``df.writeTo("db.table").append()`` (or
  ``createOrReplace`` for overwrite)
* anything else         → treated as a filesystem path, parquet
"""

from __future__ import annotations

from pyspark.sql import DataFrame

ICEBERG_PREFIX = "iceberg:"


def write_output(df: DataFrame, target: str, *, mode: str = "overwrite") -> None:
    """Write ``df`` to ``target`` (see module docstring for syntax)."""
    if target.startswith(ICEBERG_PREFIX):
        table = target[len(ICEBERG_PREFIX):]
        try:
            writer = df.writeTo(table)
            if mode == "overwrite":
                writer.createOrReplace()
            else:
                writer.append()
        except Exception as exc:  # noqa: BLE001
            raise RuntimeError(
                f"Iceberg write to {table!r} failed — is the Iceberg runtime "
                f"on the classpath and the catalog configured? "
                f"(--packages org.apache.iceberg:iceberg-spark-runtime-...)"
            ) from exc
    else:
        df.write.mode(mode).parquet(target)


def read_pages(spark, source: str) -> DataFrame:
    """Read the pages table: ``iceberg:db.table``, ``warc:<dir>`` (raw
    Common-Crawl archives via :mod:`.warc`), or a parquet path."""
    if source.startswith(ICEBERG_PREFIX):
        return spark.read.format("iceberg").load(source[len(ICEBERG_PREFIX):])
    if source.startswith("warc:"):
        from .warc import warc_pages

        return warc_pages(spark, source[len("warc:"):])
    return spark.read.parquet(source)
