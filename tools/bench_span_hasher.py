#!/usr/bin/env python
"""A/B benchmark for duplicated_ngram_spans' window hashers (VERDICT r04
#1): the zero-copy murmur word-window path (with_word_window_hashes,
scale default) vs the JVM md5(concat_ws) path (kept for oracle parity).

Same query, same session, interleaved reps, minima — per the repo's
shared-box rule. Pin with taskset (the harness pins 0-15 itself via
the CPUS env contract is NOT assumed: run `taskset -c 0-15 python
tools/bench_span_hasher.py`).

Usage: python tools/bench_span_hasher.py [sf_dir] [reps] [n_tokens]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
N_TOKENS = int(sys.argv[3]) if len(sys.argv) > 3 else 20
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from phphll_spark.operators import duplicated_ngram_spans

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    docs.count()  # warm scan cache/JVM
    spark.range(0, CPUS * 4, numPartitions=CPUS).mapInPandas(
        lambda it: it, schema="id long"
    ).count()  # warm Python workers

    times: dict[str, list[float]] = {"murmur": [], "md5": []}
    counts: dict[str, int] = {}
    for _ in range(REPS):
        for hasher in ("murmur", "md5"):  # interleaved, minima below
            t0 = time.monotonic()
            n = duplicated_ngram_spans(docs, "doc_id", "text", n=N_TOKENS, hasher=hasher).count()
            times[hasher].append(time.monotonic() - t0)
            counts[hasher] = n
    assert counts["murmur"] == counts["md5"], counts
    out = {
        "sf_dir": SF_DIR,
        "n": N_TOKENS,
        "cpus": CPUS,
        "n_spans": counts["murmur"],
        "murmur_min_s": round(min(times["murmur"]), 3),
        "md5_min_s": round(min(times["md5"]), 3),
        "speedup_min": round(min(times["md5"]) / min(times["murmur"]), 3),
        "murmur_all_s": [round(t, 3) for t in times["murmur"]],
        "md5_all_s": [round(t, 3) for t in times["md5"]],
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
