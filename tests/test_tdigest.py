"""t-digest quantile sketch: rank-error accuracy, merge invariance (within
bound), codec, distributed == accuracy-equivalent serial."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from phphll_spark.sketches.tdigest import (
    InvalidTDigestError,
    TDigest,
    make_tdigest_merge_agg,
    tdigest_quantile,
    tdigest_sketch,
)


def _rank_error(values: np.ndarray, est: float, q: float) -> float:
    return abs((values <= est).mean() - q)


def test_quantiles_accurate_uniform():
    rng = np.random.default_rng(0)
    vals = rng.uniform(0, 1000, 100_000)
    td = TDigest(200)
    for chunk in np.array_split(vals, 10):
        td.add(chunk)
    for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        assert _rank_error(vals, td.quantile(q), q) < 0.01, q
    assert td.total_weight == 100_000


def test_quantiles_accurate_skewed():
    rng = np.random.default_rng(1)
    vals = rng.lognormal(0, 2, 50_000)
    td = TDigest(200)
    td.add(vals)
    for q in (0.5, 0.9, 0.99):
        assert _rank_error(vals, td.quantile(q), q) < 0.015, q


def test_merge_preserves_accuracy_any_grouping():
    rng = np.random.default_rng(2)
    vals = rng.normal(100, 15, 60_000)
    parts = np.array_split(vals, 12)
    # two different merge orders
    tds = []
    for p in parts:
        t = TDigest(200)
        t.add(p)
        tds.append(t)
    left = tds[0]
    for t in tds[1:]:
        left = left.merge(t)
    import functools

    pairs = [tds[i].merge(tds[i + 1]) for i in range(0, 12, 2)]
    tree = functools.reduce(lambda a, b: a.merge(b), pairs)
    for q in (0.1, 0.5, 0.9):
        assert _rank_error(vals, left.quantile(q), q) < 0.015
        assert _rank_error(vals, tree.quantile(q), q) < 0.015
    assert left.total_weight == tree.total_weight == 60_000


def test_extremes_and_small():
    td = TDigest()
    assert np.isnan(td.quantile(0.5))
    td.add(np.array([42.0]))
    assert td.quantile(0.5) == 42.0
    td2 = TDigest()
    td2.add(np.array([1.0, 2.0, 3.0]))
    assert 0.9 <= td2.quantile(0.0) <= 1.1
    assert 2.9 <= td2.quantile(1.0) <= 3.1


def test_codec_roundtrip_and_validation():
    td = TDigest(100)
    td.add(np.arange(1000, dtype=float))
    blob = td.serialize()
    back = TDigest.deserialize(blob)
    assert (back.means == td.means).all() and (back.weights == td.weights).all()
    assert back.vmin == 0.0 and back.vmax == 999.0 and back.delta == 100
    with pytest.raises(InvalidTDigestError):
        TDigest.deserialize(b"NOPE" + blob[4:])
    with pytest.raises(InvalidTDigestError):
        TDigest.deserialize(blob[:-8])


def test_distributed_quantiles(spark):
    rng = np.random.default_rng(3)
    rows = [("a", float(v)) for v in rng.normal(50, 10, 20_000)] + [
        ("b", float(v)) for v in rng.uniform(0, 1, 20_000)
    ]
    df = spark.createDataFrame(rows, "grp string, x double").repartition(8)
    sk = tdigest_sketch(df, ["grp"], "x", delta=200)
    got = (
        sk.select(
            "grp",
            tdigest_quantile(F.col("tdigest"), F.lit(0.5)).alias("p50"),
            tdigest_quantile(F.col("tdigest"), F.lit(0.9)).alias("p90"),
        )
        .collect()
    )
    by = {r["grp"]: r for r in got}
    a_vals = np.array([v for g, v in rows if g == "a"])
    b_vals = np.array([v for g, v in rows if g == "b"])
    assert _rank_error(a_vals, by["a"]["p50"], 0.5) < 0.02
    assert _rank_error(a_vals, by["a"]["p90"], 0.9) < 0.02
    assert _rank_error(b_vals, by["b"]["p50"], 0.5) < 0.02
    assert _rank_error(b_vals, by["b"]["p90"], 0.9) < 0.02
