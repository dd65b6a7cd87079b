#!/usr/bin/env python
"""Scaling-evidence job — submitted via spark-submit at two parallelism levels.

    spark-submit --master local[8]  --py-files pdf_ocr_engine_spark.zip \
        scripts/scaling_job.py --input <corpus> --output <dir> --runs 2

Runs the COMPLETE production pipeline (scan → salted repartition → Arrow-batched
extract → output + per-partition metrics write) end-to-end ``--runs`` times and
prints ONE JSON line with per-run wall seconds and steady-state throughput.

The sandbox has no multi-node cluster, so the north_rule's "N and 4N executors"
criterion is evidenced with the same job at ``local[8]`` vs ``local[32]``
(driver instruction).  Two design points that make the measurement honest:

* a tiny warmup job starts the Python worker pool before timing — worker
  startup is a per-session constant that amortizes to zero over a 10^12-doc
  run, and BASELINE.json's metric is steady-state docs/sec;
* the partition count is FIXED (64) across both sizes, so both runs execute
  the identical physical plan over identical input — only available cores vary.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time


def main(argv: list[str]) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--runs", type=int, default=2)
    p.add_argument("--partitions", type=int, default=64)
    p.add_argument("--salt-buckets", type=int, default=None)
    args = p.parse_args(argv)

    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    from pdf_ocr_engine_spark.plans.pipeline import build_session, write_extraction

    spark = build_session("scaling-job")  # master comes from spark-submit
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    pages = spark.read.parquet(args.input)
    n_docs = pages.count()

    # start the Python worker pool outside the timed section (see docstring)
    @F.pandas_udf(LongType())
    def _one(x):
        return x * 0 + 1

    spark.range(0, cores * 2, 1, cores * 2) \
        .select(_one("id").alias("o")).agg(F.sum("o")).collect()

    walls: list[float] = []
    for i in range(args.runs):
        out = f"{args.output}/run{i}"
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.perf_counter()
        write_extraction(spark, pages, out, num_partitions=args.partitions,
                         salt_buckets=args.salt_buckets,
                         run_id=f"scaling-{cores}-{i}")
        walls.append(round(time.perf_counter() - t0, 3))

    best = min(walls)
    print(json.dumps({
        "cores": cores,
        "n_docs": n_docs,
        "partitions": args.partitions,
        "runs_sec": walls,
        "best_sec": best,
        "docs_per_sec": round(n_docs / best, 1),
    }), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
