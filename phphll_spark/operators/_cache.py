"""Shared registry for DataFrames the operators persist mid-plan.

Persisted intermediates (LSH candidate pairs, packed GEMM block matrices)
are registered here; ``release_cached()`` unpersists them once the caller
has materialized its result. Operators also call it at their own entry so
a session that never releases holds at most the LATEST operator's caches
instead of accumulating them (executor-memory hygiene for long-lived
sessions — Spark's ContextCleaner alone only reclaims on driver GC).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_CACHED: list[DataFrame] = []


def register(df: DataFrame) -> DataFrame:
    _CACHED.append(df)
    return df


def release_cached() -> None:
    """Unpersist every registered intermediate (async, non-blocking).
    Call after the downstream action has materialized; also invoked
    automatically at the start of each caching operator, so only
    interleaved *lazy* plans (built but not yet collected) ever need to
    care about ordering."""
    while _CACHED:
        _CACHED.pop().unpersist(blocking=False)
