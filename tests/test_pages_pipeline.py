"""Pages generator determinism + resumable checkpoint/lineage pipeline."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from phphll_spark.hll import HLL
from phphll_spark.plans import lineage_table, run_sketch_pipeline
from phphll_spark.sources.pages import (
    exact_distinct_urls,
    extract_text_oracle,
    generate_pages,
    generate_pages_parquet,
)


@pytest.fixture(scope="module")
def pages_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pages") / "pages.parquet")
    generate_pages_parquet(spark, path, 20_000, n_files=8, n_hosts=200)
    return path


def test_generation_deterministic_and_partition_invariant(spark):
    a = generate_pages(spark, 2000, partitions=2).orderBy("row_id").collect()
    b = generate_pages(spark, 2000, partitions=7).orderBy("row_id").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_text_byte_identical_per_url(spark, pages_path):
    """The per-row invariant vs the serial oracle (FIXTURES.md §1)."""
    sample = spark.read.parquet(pages_path).limit(200).collect()
    for r in sample:
        assert r["text"] == extract_text_oracle(r["url"]), r["url"]
    # same url ⇒ same text across duplicate rows
    df = spark.read.parquet(pages_path)
    assert df.select("url", "text").distinct().count() == df.select("url").distinct().count()


def test_dup_fraction_and_truth(spark, pages_path):
    df = spark.read.parquet(pages_path)
    n = df.count()
    distinct = df.select("url").distinct().count()
    assert n == 20_000
    assert distinct == exact_distinct_urls(20_000)
    assert 0.85 < distinct / n < 0.95  # ~10% dups


def test_host_skew_exists(spark, pages_path):
    top = (
        spark.read.parquet(pages_path)
        .groupBy(F.regexp_extract("url", r"https://([^/]+)/", 1).alias("host"))
        .count()
        .orderBy(F.desc("count"))
        .first()
    )
    assert top["count"] > 20_000 * 0.05  # skewed head host


def test_html_binary_safe(spark, pages_path):
    r = spark.read.parquet(pages_path).select("html").first()
    assert b"\x00" in bytes(r["html"])


def test_pipeline_full_run_matches_local(spark, pages_path, tmp_path):
    ck = str(tmp_path / "ck_full")
    res = run_sketch_pipeline(
        spark, pages_path, ck, key_cols=["lang"], value_col="url"
    )
    assert res.processed_splits == 8 and res.skipped_splits == 0
    got = {r["lang"]: r["approx_distinct"] for r in res.results.collect()}
    rows = spark.read.parquet(pages_path).select("lang", "url").collect()
    local = {}
    for r in rows:
        local.setdefault(r["lang"], HLL()).add(r["url"])
    assert got == {k: h.count() for k, h in local.items()}


def test_pipeline_kill_and_resume_without_rehash(spark, pages_path, tmp_path):
    """Kill mid-scan (3 of 8 splits), resume, verify: no split re-hashed,
    final result identical to the uninterrupted run."""
    ck = str(tmp_path / "ck_resume")
    first = run_sketch_pipeline(
        spark, pages_path, ck, key_cols=["lang"], value_col="url", fail_after_splits=3
    )
    assert first.processed_splits == 3
    second = run_sketch_pipeline(spark, pages_path, ck, key_cols=["lang"], value_col="url")
    assert second.processed_splits == 5  # only the missing splits
    assert second.skipped_splits == 3
    third = run_sketch_pipeline(spark, pages_path, ck, key_cols=["lang"], value_col="url")
    assert third.processed_splits == 0  # fully resumed: nothing to do
    # lineage covers every split exactly once
    lt = lineage_table(spark, ck)
    per_split = lt.groupBy("split_id").agg(F.sum("row_count").alias("rows")).collect()
    assert len(per_split) == 8
    assert sum(r["rows"] for r in per_split) == 20_000
    # resumed estimates == clean-run estimates
    ck2 = str(tmp_path / "ck_clean")
    clean = run_sketch_pipeline(spark, pages_path, ck2, key_cols=["lang"], value_col="url")
    a = {r["lang"]: r["approx_distinct"] for r in second.results.collect()}
    b = {r["lang"]: r["approx_distinct"] for r in clean.results.collect()}
    assert a == b


def test_pipeline_salted_equals_unsalted(spark, pages_path, tmp_path):
    """Skew salting must not change results (merge grouping-independence)."""
    ck = str(tmp_path / "ck_salt")
    salted = run_sketch_pipeline(
        spark, pages_path, ck, key_cols=["lang"], value_col="url", salt_partitions=13
    )
    ck2 = str(tmp_path / "ck_nosalt")
    plain = run_sketch_pipeline(spark, pages_path, ck2, key_cols=["lang"], value_col="url")
    a = {r["lang"]: r["approx_distinct"] for r in salted.results.collect()}
    b = {r["lang"]: r["approx_distinct"] for r in plain.results.collect()}
    assert a == b


def test_summary_pipeline_kill_resume_cms_and_mg(spark, tmp_path):
    """The generic resumable pipeline works for the non-HLL families:
    kill after half the splits, resume, and the final CMS point estimates
    and MG counts equal a single uninterrupted run's."""
    from phphll_spark.plans import run_summary_pipeline
    from phphll_spark.sketches import (
        cms_partial_sketches,
        cms_point_estimate,
        make_cms_merge_agg,
        make_mg_merge_agg,
        mg_entries,
        mg_partial_sketches,
    )
    from pyspark.sql import functions as F

    src = str(tmp_path / "ev")
    spark.createDataFrame(
        [(f"u{i % 37}",) for i in range(4000)], "uid string"
    ).repartition(8).write.mode("overwrite").parquet(src)

    def run(ck, fail=None, family="cms"):
        if family == "cms":
            return run_summary_pipeline(
                spark, src, ck,
                key_cols=[],
                partials_fn=lambda df: cms_partial_sketches(df, [], "uid", depth=4, width=1024),
                merge_agg_factory=make_cms_merge_agg,
                sketch_col="cms",
                fail_after_splits=fail,
            )
        return run_summary_pipeline(
            spark, src, ck,
            key_cols=[],
            partials_fn=lambda df: mg_partial_sketches(df, [], "uid", k=64),
            merge_agg_factory=make_mg_merge_agg,
            sketch_col="mg",
            fail_after_splits=fail,
        )

    for family, probe in (("cms", True), ("mg", False)):
        ck_once = str(tmp_path / f"{family}_once")
        ck_resumed = str(tmp_path / f"{family}_res")
        once = run(ck_once, family=family)
        first = run(ck_resumed, fail=4, family=family)
        assert first.processed_splits == 4
        second = run(ck_resumed, family=family)
        assert second.skipped_splits == 4 and second.processed_splits >= 1
        if family == "cms":
            got = lambda r: r.results.select(
                cms_point_estimate(F.col("cms"), F.lit("u3")).alias("e")
            ).collect()[0]["e"]
            assert got(once) == got(second)
        else:
            ent = lambda r: {
                x["k"]: x["n"]
                for x in r.results.select(F.explode(mg_entries(F.col("mg"))).alias("k", "n")).collect()
            }
            assert ent(once) == ent(second)  # exact regime: 37 distinct < 64


def test_summary_pipeline_kill_resume_theta(spark, tmp_path):
    """Theta joins the resumable family: kill after half the splits,
    resume, and the final sketch BYTES equal a single uninterrupted
    run's (theta merges are bit-exact, so the whole pipeline is)."""
    from pyspark.sql import functions as F

    from phphll_spark.plans import run_summary_pipeline
    from phphll_spark.sketches import (
        make_theta_merge_agg,
        theta_estimate,
        theta_partial_sketches,
    )

    src = str(tmp_path / "ev_theta")
    spark.createDataFrame(
        [(f"u{i % 211}",) for i in range(4000)], "uid string"
    ).repartition(8).write.mode("overwrite").parquet(src)

    def run(ck, fail=None):
        return run_summary_pipeline(
            spark, src, ck,
            key_cols=[],
            partials_fn=lambda df: theta_partial_sketches(df, [], "uid", k=128),
            merge_agg_factory=make_theta_merge_agg,
            sketch_col="theta",
            fail_after_splits=fail,
        )

    once = run(str(tmp_path / "th_once"))
    first = run(str(tmp_path / "th_res"), fail=4)
    assert first.processed_splits == 4
    second = run(str(tmp_path / "th_res"))
    assert second.skipped_splits == 4 and second.processed_splits >= 1
    blob = lambda r: bytes(r.results.collect()[0]["theta"])
    assert blob(once) == blob(second)
    # 211 distinct > k=128: estimation regime, estimate within 6/sqrt(k-1)
    est = once.results.select(theta_estimate(F.col("theta")).alias("e")).collect()[0]["e"]
    assert abs(est - 211) <= 6 / (127 ** 0.5) * 211
