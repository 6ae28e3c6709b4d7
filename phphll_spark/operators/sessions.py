"""Gap-based sessionization of event streams (batch form).

Plan-native analytic windows only (lag + conditional cumsum) — the
classic two-window sessionizer; no UDFs, fully codegen'd, one shuffle on
the user key. The streaming analog is ``applyInPandasWithState`` with an
event-time timeout (see streaming/stream.py for the stateful pattern).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    *,
    gap_seconds: int = 1800,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign a per-user session index: a new session starts when the gap
    to the previous event exceeds ``gap_seconds``. Deterministic ordering
    tie-break on the timestamp only (events at the same second share a
    session by construction)."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col))
    prev = F.lag(F.col(ts_col)).over(w)
    new_session = (
        prev.isNull()
        | ((F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev)) > gap_seconds)
    ).cast("long")
    return df.withColumn(session_col, F.sum(new_session).over(w))


def session_stats(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    *,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-user session summary: session count, events per session, and
    total session seconds (last-first per session)."""
    s = sessionize(df, user_col, ts_col, gap_seconds=gap_seconds)
    per_session = s.groupBy(user_col, "session_id").agg(
        F.count("*").alias("n_events"),
        (F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))).alias("span_s"),
    )
    return per_session.groupBy(user_col).agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.sum("span_s").alias("total_span_s"),
    )
