#!/usr/bin/env python
"""Dump the formatted physical plans of the flagship queries to PLANS.md
so the scale-critical plan properties (column pruning, filter pushdown,
broadcast joins, sketch-only exchanges, no Python in native paths) are
reviewable without running Spark.

Usage: python tools/plan_report.py
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SECTIONS = [
    (
        "hll_count_distinct(pages, ['lang'], 'url') — the flagship sketch agg",
        "Scan reads ONLY (lang, url) — `html`/`text` pruned; MapInArrow is the "
        "per-partition fold; the Exchange above it carries (lang, sketch) rows "
        "only; final merge agg is one tiny stage.",
        "sketch",
    ),
    (
        "filtered sketch (lang = 'en') — predicate pushdown",
        "The lang filter reaches the parquet scan (PushedFilters), so non-en "
        "row groups are skipped before any decode.",
        "filtered",
    ),
    (
        "nations-per-region — broadcast join",
        "The 5-row region dim broadcasts; no SortMergeJoin/shuffle of nation.",
        "join",
    ),
    (
        "TPC-H Q1-style pricing summary — whole-stage codegen",
        "Pure JVM HashAggregate with partial aggregation; no Python nodes.",
        "pricing",
    ),
    (
        "sessionization — analytic windows, single user-key shuffle",
        "lag + conditional cumsum windows; no Python nodes anywhere.",
        "sessions",
    ),
    (
        "IVF probe against the materialized per-centroid index — partition pruning",
        "The index is parquet partitioned by centroid; the probe filter shows "
        "as PartitionFilters on the scan, so only probed inverted lists are "
        "read — the corpus is never rescanned (VERDICT r01 #4).",
        "ivf_probe",
    ),
    (
        "embedding near-dup, LSH-blocked — no cartesian product",
        "Candidates come from equi-grouped (table, bucket) cells expanded "
        "in-place; verification joins only on candidate ids. No "
        "CartesianProduct / BroadcastNestedLoopJoin anywhere.",
        "near_dup_blocked",
    ),
    (
        "exact all-pairs cosine via blocked GEMM — distributed O(n²) without a cross join",
        "One persisted block matrix per groupBy cell; B(B+1)/2 combos via "
        "broadcast equi-joins against a tiny combo table; one numpy matmul "
        "per combo emits only qualifying pairs.",
        "all_pairs_gemm",
    ),
    (
        "inclusion-exclusion intersection — ONE events scan (fused multi-sketch fold)",
        "One groupBy(uid) flags pass; a single mapInArrow fold then produces the "
        "A, B and A∪B partial sketches AND the exact overlap count together — "
        "one Scan node and two Exchanges total, where separate per-sketch "
        "branches would scan events five times (VERDICT r02 #5).",
        "intersection",
    ),
    (
        "cap_per_stratum — skew-safe two-phase top-k",
        "Phase 1 ranks within (stratum, xxhash64-salt) — a head stratum is "
        "spread over salt_buckets tasks; phase 2 re-ranks the bounded "
        "candidates exactly. Two Window nodes, the first partitioned by "
        "(stratum, _salt) (VERDICT r02 #2).",
        "cap_salted",
    ),
]


def _plan(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue().strip()


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    import __spark_entry__ as em
    from phphll_spark.functions import hll_count_distinct
    from phphll_spark.operators import session_stats
    from phphll_spark.sources.pages import generate_pages_parquet

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import tempfile

    pages_path = os.path.join(tempfile.mkdtemp(), "pages.parquet")
    generate_pages_parquet(spark, pages_path, 5_000, n_files=4)
    pages = spark.read.parquet(pages_path)
    sf = "/root/testdata/sf0.001"

    import numpy as np

    from phphll_spark.operators import (
        embedding_near_dup_blocked,
        ivf_build_index,
        ivf_topk_indexed,
        kmeans_centroids,
    )

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    train = np.array([r["embedding"] for r in emb.limit(256).collect()], dtype=np.float64)
    centroids = kmeans_centroids(train, 8, seed=42)
    ivf_path = os.path.join(tempfile.mkdtemp(), "ivf_index")
    ivf_build_index(emb, "vec_id", "embedding", centroids=centroids, path=ivf_path)
    qvecs = {int(r["vec_id"]): list(r["embedding"]) for r in emb.filter(F.col("vec_id") < 3).collect()}

    plans = {
        "sketch": _plan(hll_count_distinct(pages, ["lang"], "url")),
        "filtered": _plan(hll_count_distinct(pages.filter(F.col("lang") == "en"), ["lang"], "url")),
        "join": _plan(em.q_hll_nations_per_region(spark, sf)),
        "pricing": _plan(em.q_pricing_summary(spark, sf)),
        "sessions": _plan(session_stats(spark.read.parquet(f"{sf}/events.parquet"), "user_id", "ts")),
        "ivf_probe": _plan(
            ivf_topk_indexed(spark, ivf_path, qvecs, centroids=centroids, n_probe=2, k=3)
        ),
        "near_dup_blocked": _plan(
            embedding_near_dup_blocked(emb, "vec_id", "embedding", threshold=0.5, dim=64),
            "simple",
        ),
        "intersection": _plan(em.q_hll_intersection_event_types(spark, sf)),
        "cap_salted": _plan(
            __import__("phphll_spark.operators", fromlist=["cap_per_stratum"]).cap_per_stratum(
                spark.read.parquet(f"{sf}/documents.parquet"), "doc_id", "source", 3
            ),
            "simple",
        ),
        "all_pairs_gemm": _plan(
            __import__("phphll_spark.operators", fromlist=["cosine_all_pairs_blocked"])
            .cosine_all_pairs_blocked(emb, "vec_id", "embedding", threshold=0.4, num_blocks=4),
            "simple",
        ),
    }

    lines = [
        "# PLANS — physical plans of the flagship queries",
        "",
        "Generated by `python tools/plan_report.py` (Spark "
        f"{spark.version}, AQE on). The properties asserted by "
        "`tests/test_plans.py` are visible below.",
    ]
    for title, note, key in SECTIONS:
        lines += ["", f"## {title}", "", note, "", "```", plans[key], "```"]
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("PLANS.md written")
    spark.stop()


if __name__ == "__main__":
    main()
