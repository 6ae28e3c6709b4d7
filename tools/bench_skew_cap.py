#!/usr/bin/env python
"""Skew-safety evidence for the two-phase capping operators at sf1 scale
(VERDICT r03 #6): cap_per_stratum / cap_tokens_per_stratum are plan-argued
skew-safe (salted partial top-k / bucketed budget — no single task ever
sorts a whole head stratum) but were only ever timed at sf0.1. This bench
runs them over an 80M-row synthetic frame twice — once with UNIFORM strata
and once with one stratum deliberately ~100x the tail strata — and shows
the wall time is flat across the two shapes. For contrast it also times
the NAIVE single-window cap (the anti-pattern the two-phase shape
replaces) on both shapes, where the head stratum becomes one straggler
task.

The frame is generated on the fly from spark.range (native expressions,
no disk): generation cost is identical across variants and negligible
against the windowed shuffles being measured. Deterministic: stratum and
token columns are pure functions of the row id.

Usage: python tools/bench_skew_cap.py [n_rows] [cpus]
(pins the process tree with taskset; interleaves variants and keeps
per-variant minima — the box is shared, see CLAUDE.md)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 80_000_000
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 16

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, Window, functions as F
from phphll_spark.operators import cap_per_stratum, cap_tokens_per_stratum

n_rows, cpus = int(sys.argv[1]), int(sys.argv[2])
spark = (SparkSession.builder.master(f"local[{{cpus}}]")
         .config("spark.sql.shuffle.partitions", str(cpus * 4))
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

def frame(skewed: bool):
    base = spark.range(0, n_rows, numPartitions=256)
    if skewed:
        # one head stratum with 1/8 of ALL rows (~114x a tail stratum)
        strat = F.when(F.col("id") % 8 == 0, F.lit("head")).otherwise(
            F.concat(F.lit("s"), F.pmod(F.xxhash64("id"), F.lit(799)).cast("string")))
    else:
        strat = F.concat(F.lit("s"), (F.col("id") % 800).cast("string"))
    tok = (F.pmod(F.col("id") * 2654435761, F.lit(97)) + 5).cast("int")
    return base.select("id", strat.alias("src"), tok.alias("tok"))

def run_rows(df):
    return cap_per_stratum(df, "id", "src", 1000).agg(
        F.count("*"), F.sum("id")).collect()[0][0]

def run_tokens(df):
    return cap_tokens_per_stratum(df, "id", "src", "tok", 2_000_000).agg(
        F.count("*"), F.sum("tok")).collect()[0][0]

def run_naive_rows(df):
    w = Window.partitionBy("src").orderBy("id")
    return (df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= 1000)
            .agg(F.count("*"), F.sum("id")).collect()[0][0])

def timed(job, df):
    t0 = time.time(); rows = job(df); return time.time() - t0, rows

jobs = {{"cap_rows_two_phase": run_rows, "cap_tokens_two_phase": run_tokens,
        "cap_rows_naive_window": run_naive_rows}}
results = {{}}
frames = {{"uniform": frame(False), "skewed": frame(True)}}
for shape, df in frames.items():
    df.limit(1000).count()  # warm python/jvm paths
for name, job in jobs.items():
    for shape, df in frames.items():
        secs, kept = [], None
        for _ in range(2):  # interleaved below by job ordering; min-of-2
            s, kept = timed(job, df)
            secs.append(s)
        results[f"{{name}}:{{shape}}"] = {{"sec": round(min(secs), 2), "kept": int(kept)}}
        sys.stderr.write(f"{{name}}:{{shape}} {{min(secs):.2f}}s kept={{kept}}\n")
print(json.dumps({{"rows": n_rows, "cpus": cpus, "results": results}}))
spark.stop()
""".format(repo=REPO)


def main() -> None:
    pin = ["taskset", "-c", f"0-{CPUS - 1}"] if shutil.which("taskset") else []
    out = subprocess.run(
        [*pin, sys.executable, "-c", RUNNER, str(N_ROWS), str(CPUS)],
        check=True, capture_output=True, text=True,
    )
    sys.stderr.write(out.stderr)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    with open(os.path.join(REPO, "BENCH_skew.json"), "w") as f:
        json.dump(rec, f, indent=2)
    r = rec["results"]
    print(json.dumps(rec, indent=2))
    for name in ("cap_rows_two_phase", "cap_tokens_two_phase", "cap_rows_naive_window"):
        u, s = r[f"{name}:uniform"]["sec"], r[f"{name}:skewed"]["sec"]
        print(f"{name}: uniform {u}s vs skewed {s}s (ratio {s / u:.2f})")


if __name__ == "__main__":
    main()
