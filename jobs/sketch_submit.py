#!/usr/bin/env python
"""``spark-submit`` entry point for the resumable sketch pipeline.

The cluster deployment path the north star requires ("the whole pipeline
runs via spark-submit --py-files at N and 4N executors"):

    spark-submit --master local[8] \\
        --py-files dist/phphll_spark.zip \\
        jobs/sketch_submit.py \\
        --input  /data/pages.parquet \\
        --checkpoint /data/ckpt \\
        --keys lang --value url --p 14

This script deliberately imports ``phphll_spark`` only AFTER the
SparkSession exists, so the import must resolve from the ``--py-files``
zip exactly as it would on a real cluster's executors (the test runs it
from a directory that does not contain the package).

Prints ONE JSON line: run/resume stats, per-group estimates, rows
processed this run, wall time, and throughput.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet directory of pages")
    ap.add_argument("--checkpoint", required=True, help="checkpoint/lineage dir")
    ap.add_argument("--keys", default="", help="comma-separated group keys ('' = global)")
    ap.add_argument("--value", default="url", help="column to count distinct")
    ap.add_argument("--p", type=int, default=14, help="HLL precision (4-18)")
    ap.add_argument("--salt-partitions", type=int, default=None)
    ap.add_argument("--fail-after-splits", type=int, default=None,
                    help="test hook: stop after N splits (simulated kill)")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--warmup", action="store_true",
                    help="fold 2 splits untimed first (JIT + Python workers + "
                         "Arrow path) so wall_sec measures steady-state "
                         "throughput — the regime that matters at 10^12 rows")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    builder = SparkSession.builder.appName("phphll-sketch-pipeline")
    if args.shuffle_partitions:
        builder = builder.config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # resolves from --py-files (or the cluster's deployed archive)
    from phphll_spark.plans.pipeline import run_sketch_pipeline

    keys = [k for k in args.keys.split(",") if k]
    if args.warmup:
        from phphll_spark.functions.sketch import hll_partial_sketches

        warm_files = spark.read.parquet(args.input).inputFiles()[:2]
        hll_partial_sketches(spark.read.parquet(*warm_files), [], args.value, p=args.p).count()
    t0 = time.time()
    res = run_sketch_pipeline(
        spark,
        args.input,
        args.checkpoint,
        key_cols=keys,
        value_col=args.value,
        p=args.p,
        salt_partitions=args.salt_partitions,
        fail_after_splits=args.fail_after_splits,
    )
    rows = res.results.select(*keys, "approx_distinct").collect()
    wall = time.time() - t0

    rows_this_run = 0
    if res.processed_splits:
        this_run = spark.read.parquet(f"{args.checkpoint}/partials-{res.run_id}.parquet")
        rows_this_run = this_run.agg(F.sum("row_count")).collect()[0][0] or 0

    estimates = {
        ("|".join(str(r[k]) for k in keys) if keys else "__global__"): r["approx_distinct"]
        for r in rows
    }
    print(
        json.dumps(
            {
                "run_id": res.run_id,
                "master": spark.sparkContext.master,
                "processed_splits": res.processed_splits,
                "skipped_splits": res.skipped_splits,
                "rows_this_run": int(rows_this_run),
                "wall_sec": round(wall, 3),
                "rows_per_sec": int(rows_this_run / wall) if wall > 0 else 0,
                "estimates": estimates,
            }
        )
    )
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
