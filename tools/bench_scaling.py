#!/usr/bin/env python
"""Scaling-efficiency evidence for the north rule: the identical sketch
job at two parallelism levels (local[8] vs local[32]) on the same input —
the sandbox stand-in for N vs 4N executors (no real cluster available).

Runs each level in its own subprocess (a JVM can't change master), warms
the Python workers, times the warm steady-state ingest, and writes the
results to BENCH.md.

Usage: python tools/bench_scaling.py [n_rows]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from phphll_spark.functions import hll_global_distinct, hll_count_distinct

cpus = int(sys.argv[1]); cache = sys.argv[2]
spark = (SparkSession.builder.master(f"local[{{cpus}}]")
         .config("spark.sql.shuffle.partitions", str(cpus))
         .config("spark.driver.memory", "48g")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
         .config("spark.sql.files.maxPartitionBytes", "160m")
         .config("spark.sql.files.openCostInBytes", "160m")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
spark.range(0, cpus * 4, numPartitions=cpus).mapInPandas(lambda it: it, schema="id long").count()

def _timed(job):
    t0 = time.time(); job(); return time.time() - t0
pages = spark.read.parquet(cache)
n = pages.count()
results = {{}}
# warm once, then min-of-3 (the host is shared — min filters external noise)
from pyspark.sql import functions as SF
from phphll_spark.operators import minhash_candidate_pairs, release_cached

def _minhash_job():
    # the flagship TRAINING-DATA op: MinHash-LSH candidate generation over
    # a deterministic 1-in-64 slice of the texts (signatures narrow, one
    # banded shuffle, bucket guard bounds the exact-dup blowup)
    out = minhash_candidate_pairs(
        pages.filter(SF.pmod(SF.xxhash64("url"), SF.lit(64)) == 0),
        "url", "text", num_hashes=32, bands=8, shingle_k=5, max_bucket_size=64,
    ).count()
    release_cached(spark)
    return out

for name, job, rows in [
    ("global_distinct_texts", lambda: hll_global_distinct(pages, "text"), n),
    ("global_distinct_urls", lambda: hll_global_distinct(pages, "url"), n),
    ("distinct_urls_per_lang_day", lambda: hll_count_distinct(
        pages.withColumn("day", SF.to_date("warc_ts")), ["lang", "day"], "url").count(), n),
    ("minhash_candidates_1in64", _minhash_job, n // 64),
]:
    job()  # warm
    best = min(_timed(job) for _ in range(3))
    results[name] = {{"sec": round(best, 3), "rows_per_sec": int(rows / best)}}
sys.stderr.write("level done\n")
print(json.dumps({{"cpus": cpus, "rows": n, "jobs": results}}))
spark.stop()
""".format(repo=REPO)


def ensure_cache() -> str:
    cache = os.path.join(REPO, ".bench_cache", f"pages_{N_ROWS}")
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        gen = (
            "import sys; sys.path.insert(0, {repo!r})\n"
            "from pyspark.sql import SparkSession\n"
            "from phphll_spark.sources.pages import generate_pages_parquet\n"
            "spark = (SparkSession.builder.master('local[32]')"
            ".config('spark.driver.memory','48g').config('spark.ui.enabled','false').getOrCreate())\n"
            "generate_pages_parquet(spark, {cache!r}, {n}, n_files=64)\n"
            "spark.stop()\n"
        ).format(repo=REPO, cache=cache, n=N_ROWS)
        subprocess.run([sys.executable, "-c", gen], check=True)
    return cache


def _pin_prefix(cpus: int) -> list[str]:
    """Bound the whole process tree (JVM + Python workers) to N cpus via
    taskset — local[N] alone only caps JVM task slots, so the small level
    would borrow extra host cores for its Python workers and the measured
    scaling would be understated."""
    if shutil.which("taskset"):
        return ["taskset", "-c", f"0-{cpus - 1}"]
    return []


def run_level(cpus: int, cache: str) -> dict:
    out = subprocess.run(
        [*_pin_prefix(cpus), sys.executable, "-c", RUNNER, str(cpus), cache],
        check=True,
        capture_output=True,
        text=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def _merge_min(a: dict, b: dict) -> dict:
    for job, r in b["jobs"].items():
        if job not in a["jobs"] or r["sec"] < a["jobs"][job]["sec"]:
            a["jobs"][job] = r
    return a


def main() -> None:
    cache = ensure_cache()
    n_low = int(os.environ.get("SPARK_GRAFT_SCALE_LOW", "2"))
    n_high = int(os.environ.get("SPARK_GRAFT_SCALE_HIGH", "8"))
    # interleave rounds (low, high, low, high) and keep per-job minima —
    # the host is shared with other tenants, so external load drifts
    low = run_level(n_low, cache)
    high = run_level(n_high, cache)
    low = _merge_min(low, run_level(n_low, cache))
    high = _merge_min(high, run_level(n_high, cache))
    print(json.dumps(low))
    print(json.dumps(high))
    lines = [
        "# BENCH — measured performance (this sandbox: 32-core local mode)",
        "",
        "## Scaling efficiency (north rule: ≥0.8 from N to 4N)",
        "",
        f"Job: HLL approx-distinct over the synthetic Common-Crawl-style pages table "
        f"({low['rows']:,} rows, parquet, 64 files), identical input at both levels; "
        f"warm steady-state timing (Python workers pre-warmed), min over interleaved "
        f"rounds. Each level runs `taskset`-pinned to exactly N host cpus so the "
        f"whole process tree (JVM scan threads AND Python workers) is bounded like "
        f"an N-core executor container — bare local[N] only caps JVM task slots and "
        f"overstates the small level. local[{low['cpus']}] vs local[{high['cpus']}] "
        "stands in for N vs 4N executors (no real cluster in this sandbox). NB the "
        "32-core box is SHARED with other tenants; raw JSON from both levels is "
        "committed alongside.",
        "",
        f"| job | local[{low['cpus']}] | local[{high['cpus']}] | speedup | efficiency |",
        "|---|---|---|---|---|",
    ]
    for job in low["jobs"]:
        t8 = low["jobs"][job]["sec"]
        t32 = high["jobs"][job]["sec"]
        r8 = low["jobs"][job]["rows_per_sec"]
        r32 = high["jobs"][job]["rows_per_sec"]
        speedup = t8 / t32
        eff = speedup / 4
        lines.append(
            f"| {job} | {t8:.2f}s ({r8:,}/s) | {t32:.2f}s ({r32:,}/s) | {speedup:.2f}x | **{eff:.2f}** |"
        )
    lines += [
        "",
        "Reference single-node baseline (BASELINE.md): C `hllcnt` ingests ≈6.35M items/s "
        "single-thread. Figures above include the parquet scan + Arrow transfer, "
        "not just hashing.",
        "",
        "_Generated by tools/bench_scaling.py; bench.py prints the per-round "
        "headline JSON consumed by the driver._",
    ]
    # write the raw per-session report next to the curated BENCH.md
    # (BENCH.md itself is hand-maintained and must not be clobbered)
    with open(os.path.join(REPO, "BENCH_scaling.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    for job in low["jobs"]:
        eff = (low["jobs"][job]["sec"] / high["jobs"][job]["sec"]) / 4
        print(f"{job}: efficiency {eff:.2f}")


if __name__ == "__main__":
    main()
