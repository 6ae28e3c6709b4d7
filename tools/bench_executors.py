#!/usr/bin/env python
"""Executor-model scaling evidence for the north rule: N vs 4N EXECUTORS,
modeled faithfully — each "executor" is its OWN JVM + its own Python
workers pinned to its own disjoint 2 host cores, processing a disjoint
slice of the input files; the level-2 wall is the max over the 4
concurrent executors plus a driver-side merge of their partial sketches
(associative max-merge, the same operation a cluster's final reduce does).

Rationale (measured, see BENCH.md round 4): inside ONE local-mode JVM the
JVM-side scan scales 2->8 cores at ~0.96 but the single shared
JVM<->Python Arrow bridge scales at ~0.6, dragging thread-level numbers
below the 0.8 bar for short jobs. On a real cluster that bridge is
per-executor (nothing shared between executors), which this harness
reproduces — so its ratio, not the single-JVM thread ratio, is the honest
stand-in for the rule's two-cluster-size criterion.

Usage: python tools/bench_executors.py [n_rows] [--reps 2]
Writes BENCH_executors.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
REPS = 2

# Each executor subprocess: local[2] pinned to 2 cores, folds its file
# slice into ONE global sketch blob (partial fold + single merge), prints
# warm min wall + the blob hex. Session startup/warmup excluded in both
# levels (cluster executors are long-lived).
RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
from phphll_spark.functions import hll_sketch

files = sys.argv[1].split(",")
reps = int(sys.argv[2])
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.driver.memory", "12g")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
         .config("spark.sql.files.maxPartitionBytes", "160m")
         .config("spark.sql.files.openCostInBytes", "160m")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
spark.range(0, 8, numPartitions=2).mapInPandas(lambda it: it, schema="id long").count()

def job():
    df = spark.read.parquet(*files).select("url")
    return bytes(hll_sketch(df, [], "url").collect()[0]["sketch"])

blob = job()  # warm
best = float("inf")
for _ in range(reps):
    t0 = time.time(); blob = job(); best = min(best, time.time() - t0)
print(json.dumps({{"wall": best, "blob": blob.hex()}}))
spark.stop()
""".format(repo=REPO)


def run_executor(pin: str, files: list[str], out: dict, key: str) -> subprocess.Popen:
    return subprocess.Popen(
        ["taskset", "-c", pin, sys.executable, "-c", RUNNER, ",".join(files), str(REPS)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )


def main() -> None:
    sys.path.insert(0, REPO)
    from phphll_spark.hll import HLL

    cache = os.path.join(REPO, ".bench_cache", f"pages_{N_ROWS}")
    files = sorted(
        os.path.join(cache, f) for f in os.listdir(cache) if f.endswith(".parquet")
    )
    assert len(files) % 4 == 0, f"need a multiple of 4 files, got {len(files)}"

    # level 1: ONE executor (2 cores) over all files
    p = run_executor("0-1", files, {}, "single")
    single = json.loads(p.stdout.read().splitlines()[-1])
    assert p.wait() == 0

    # level 2: FOUR executors (2 cores each, disjoint pins) over 4 slices,
    # launched concurrently; level wall = max over executors + local merge
    slices = [files[i::4] for i in range(4)]
    procs = [
        run_executor(f"{2*i}-{2*i+1}", slices[i], {}, f"ex{i}") for i in range(4)
    ]
    outs = []
    for p in procs:
        outs.append(json.loads(p.stdout.read().splitlines()[-1]))
        assert p.wait() == 0
    t0 = time.time()
    merged = HLL(bytes.fromhex(outs[0]["blob"]))
    merged.merge(*[bytes.fromhex(o["blob"]) for o in outs[1:]])
    est4 = merged.count()
    merge_sec = time.time() - t0
    est1 = HLL(bytes.fromhex(single["blob"])).count()
    assert est1 == est4, (est1, est4)  # partition-grouping independence

    wall1 = single["wall"]
    wall4 = max(o["wall"] for o in outs) + merge_sec
    eff = (wall1 / wall4) / 4
    rec = {
        "rows": N_ROWS,
        "job": "global distinct urls (partial fold + merge)",
        "level_1_executor_2cores": {"wall_sec": round(wall1, 3)},
        "level_4_executors_2cores_each": {
            "wall_sec": round(wall4, 3),
            "per_executor": [round(o["wall"], 3) for o in outs],
            "merge_sec": round(merge_sec, 4),
        },
        "estimate": est1,
        "speedup": round(wall1 / wall4, 3),
        "efficiency": round(eff, 3),
    }
    with open(os.path.join(REPO, "BENCH_executors.json"), "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec, indent=2))


if __name__ == "__main__":
    main()
