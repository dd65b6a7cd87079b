#!/usr/bin/env python
"""Local replica of the driver's DuckDB oracle gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, compares row count, sorted column names,
and an order-insensitive value hash.  Usage::

    python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.10g}"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_hash(rows: list[dict], cols: list[str]) -> tuple[int, str, list[str]]:
    """``cols`` comes from the result SCHEMA, never from rows[0] — an
    empty-vs-empty comparison must still fail on diverging column sets."""
    cols = sorted(cols)
    if not rows:
        return 0, "EMPTY", cols
    lines = sorted("\x1f".join(norm_cell(r[c]) for c in cols) for r in rows)
    h = hashlib.md5("\n".join(lines).encode()).hexdigest()
    return len(rows), h, cols


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from pdf_ocr_engine_spark.plans.pipeline import build_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spark = build_session("oracle-check", master="local[8]",
                          shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    # Local gate checks the driver-visible 50-entry registry PLUS the
    # folded demo queries (kept out of queries() to fit the driver's
    # 50-row CORRECTNESS cap but still oracle-verified here).
    from pdf_ocr_engine_spark.queries import EXTRA_ORACLES, EXTRA_QUERIES

    queries = {**entrymod.queries(), **EXTRA_QUERIES}
    oracles = {**entrymod.oracle_sql(), **EXTRA_ORACLES}
    unknown = only - set(queries)
    if unknown:
        print(f"FAIL unknown query name(s): {sorted(unknown)}")
        return 1
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [r.asDict() for r in sdf.collect()]
            sn, sh, scols = table_hash(srows, sdf.columns)
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {sn} rows, cols={scols}")
            continue
        try:
            otab = con.execute(oracles[name]).fetch_arrow_table()
            on, oh, ocols = table_hash(otab.to_pylist(), otab.column_names)
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            failures += 1
            continue
        ok = (sn, sh, scols) == (on, oh, ocols)
        if not ok:
            failures += 1
            print(f"FAIL {name}: spark(n={sn},cols={scols},h={sh[:8]}) "
                  f"duck(n={on},cols={ocols},h={oh[:8]})")
            if sn and on and scols == ocols and sn == on:
                s_lines = sorted(
                    tuple(norm_cell(r[c]) for c in scols) for r in srows)
                o_lines = sorted(
                    tuple(norm_cell(r[c]) for c in ocols)
                    for r in otab.to_pylist())
                shown = 0
                for a, b in zip(s_lines, o_lines):
                    if a != b and shown < 3:
                        print(f"   spark: {a}\n   duck : {b}")
                        shown += 1
        else:
            print(f"OK   {name}: {sn} rows")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
