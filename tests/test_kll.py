"""KLL quantile sketch: rank-error accuracy, merge bound, codec,
distributed path."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from phphll_spark.sketches.kll import (
    KLL,
    InvalidKLLError,
    kll_quantile,
    kll_sketch,
)


def _rank_error(values, est, q):
    return abs((values <= est).mean() - q)


def test_quantiles_accurate():
    rng = np.random.default_rng(0)
    vals = rng.normal(0, 1, 100_000)
    sk = KLL(200)
    for chunk in np.array_split(vals, 20):
        sk.add(chunk)
    assert sk.n == 100_000
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        assert _rank_error(vals, sk.quantile(q), q) < 0.02, q


def test_merge_accuracy_any_grouping():
    rng = np.random.default_rng(1)
    vals = rng.exponential(5, 40_000)
    parts = np.array_split(vals, 8)
    sks = []
    for p in parts:
        s = KLL(200)
        s.add(p)
        sks.append(s)
    seq = sks[0]
    for s in sks[1:]:
        seq = seq.merge(s)
    import functools

    tree = functools.reduce(
        lambda a, b: a.merge(b), [sks[i].merge(sks[i + 1]) for i in range(0, 8, 2)]
    )
    assert seq.n == tree.n == 40_000
    for q in (0.25, 0.5, 0.75, 0.95):
        assert _rank_error(vals, seq.quantile(q), q) < 0.025
        assert _rank_error(vals, tree.quantile(q), q) < 0.025


def test_rank_and_edges():
    sk = KLL()
    assert np.isnan(sk.quantile(0.5))
    sk.add(np.arange(1000, dtype=float))
    assert abs(sk.rank(500.0) - 0.5) < 0.02
    assert sk.quantile(0.0) <= 30
    assert sk.quantile(1.0) >= 970


def test_codec_roundtrip_and_validation():
    sk = KLL(150)
    sk.add(np.random.default_rng(2).uniform(0, 1, 5000))
    blob = sk.serialize()
    back = KLL.deserialize(blob)
    assert back.k == 150 and back.n == 5000
    assert all((a == b).all() for a, b in zip(back.levels, sk.levels))
    assert back.vmin == sk.vmin and back.vmax == sk.vmax
    for q in (0.1, 0.5, 0.9):
        assert back.quantile(q) == sk.quantile(q)
    with pytest.raises(InvalidKLLError):
        KLL.deserialize(b"XXXX" + blob[4:])
    with pytest.raises(InvalidKLLError):
        KLL.deserialize(blob[:-4])


def test_distributed_quantiles(spark):
    rng = np.random.default_rng(3)
    rows = [("g", float(v)) for v in rng.gamma(2, 10, 30_000)]
    df = spark.createDataFrame(rows, "grp string, x double").repartition(6)
    sk = kll_sketch(df, ["grp"], "x", k=200)
    got = sk.select(
        "grp",
        kll_quantile(F.col("kll"), F.lit(0.5)).alias("p50"),
        kll_quantile(F.col("kll"), F.lit(0.95)).alias("p95"),
    ).collect()[0]
    vals = np.array([v for _, v in rows])
    assert _rank_error(vals, got["p50"], 0.5) < 0.025
    assert _rank_error(vals, got["p95"], 0.95) < 0.025
