"""End-to-end through the real deployment path: ``spark-submit
--py-files dist/phphll_spark.zip jobs/sketch_submit.py`` (north star:
"the whole pipeline runs via spark-submit --py-files").

Runs from a scratch cwd so ``phphll_spark`` can only resolve from the
zip — exactly the executor-side story on a real cluster. Covers the
kill/resume contract: a run killed mid-scan (--fail-after-splits), then
a resume run that skips completed splits and still lands inside the 6σ
estimate bound.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

import pyspark
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")

N_ROWS = 20_000
N_FILES = 4


def _submit(zip_path: str, cwd: str, *job_args: str) -> dict:
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable, PYSPARK_DRIVER_PYTHON=sys.executable)
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "sketch_submit.py"),
            *job_args,
        ],
        check=True,
        capture_output=True,
        text=True,
        env=env,
        cwd=cwd,
        timeout=300,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert lines, f"no JSON line in spark-submit output:\n{out.stdout}\n{out.stderr[-2000:]}"
    return json.loads(lines[-1])


@pytest.mark.slow
def test_spark_submit_pipeline_kill_resume(spark, tmp_path):
    from phphll_spark.sources.pages import exact_distinct_urls, generate_pages_parquet
    from tools.package import build_zip

    zip_path = build_zip(REPO)
    input_dir = str(tmp_path / "pages")
    generate_pages_parquet(spark, input_dir, N_ROWS, n_files=N_FILES)
    ckpt = str(tmp_path / "ckpt")
    scratch = tmp_path / "scratch"  # no phphll_spark importable from here
    scratch.mkdir()

    base = ["--input", input_dir, "--checkpoint", ckpt, "--value", "url"]

    # run 1: killed after 2 of 4 splits
    r1 = _submit(zip_path, str(scratch), *base, "--fail-after-splits", "2")
    assert r1["processed_splits"] == 2
    assert r1["skipped_splits"] == 0
    assert r1["rows_this_run"] > 0

    # run 2: resumes — re-scans ONLY the 2 missing splits
    r2 = _submit(zip_path, str(scratch), *base)
    assert r2["processed_splits"] == 2
    assert r2["skipped_splits"] == 2

    exact = exact_distinct_urls(N_ROWS)
    est = r2["estimates"]["__global__"]
    bound = math.ceil(6 * 1.04 / math.sqrt(16384) * exact)
    assert abs(est - exact) <= bound, (est, exact)

    # resumed-run estimate must equal the uninterrupted in-process run
    from phphll_spark.functions import hll_global_distinct

    direct = hll_global_distinct(spark.read.parquet(input_dir), "url")
    assert est == direct
