"""Shared registry for DataFrames the operators persist mid-plan.

Persisted intermediates (LSH candidate pairs, packed GEMM block matrices)
are registered here; ``release_cached()`` unpersists them once the caller
has materialized its result. Operators also call it at their own entry so
a session that never releases holds at most the LATEST operator's caches
instead of accumulating them (executor-memory hygiene for long-lived
sessions — Spark's ContextCleaner alone only reclaims on driver GC).

The registry is keyed per SparkSession and guarded by a lock: one
session's operators never release another session's caches, and
concurrent threads building plans in the SAME session still get
last-writer-wins semantics without racing the list itself (build-then-
materialize interleavings across threads remain the caller's problem —
scope them to separate sessions if the recompute matters).
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession

_LOCK = threading.Lock()
_CACHED: dict[int, list[DataFrame]] = {}


def register(df: DataFrame) -> DataFrame:
    with _LOCK:
        _CACHED.setdefault(id(df.sparkSession), []).append(df)
    return df


def release_cached(spark: SparkSession | None = None) -> None:
    """Unpersist registered intermediates (async, non-blocking) — only the
    given session's (all sessions' when ``spark`` is None). Call after the
    downstream action has materialized; also invoked automatically at the
    start of each caching operator (scoped to that operator's session), so
    only interleaved *lazy* plans (built but not yet collected) ever need
    to care about ordering."""
    with _LOCK:
        if spark is None:
            drop = [df for dfs in _CACHED.values() for df in dfs]
            _CACHED.clear()
        else:
            drop = _CACHED.pop(id(spark), [])
    for df in drop:
        df.unpersist(blocking=False)
