"""Deterministic hash-based sampling for training-data pipelines.

Training sets routinely downsample over-represented strata (head
languages, boilerplate-heavy domains). Doing it with ``rand()`` makes the
corpus irreproducible; these operators derive the keep/drop decision from
a salted md5 of the row's id, so the sample is a pure function of the
data — stable across runs, partitionings, and engines (md5 is identical
in Spark and DuckDB, which is what makes the driver oracle possible).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

BUCKETS = 10_000


def hash_bucket(col: Column | str, *, salt: str = "", buckets: int = BUCKETS) -> Column:
    """Deterministic bucket in [0, buckets): first 8 md5 hex chars of the
    salted string form, as an integer. Engine-portable (md5 + hex parse
    exist in Spark and DuckDB with identical results)."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.md5(F.concat(c.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % buckets


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, *, salt: str = "", buckets: int = BUCKETS
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows keyed on ``id_col``."""
    return df.filter(hash_bucket(id_col, salt=salt, buckets=buckets) < int(round(fraction * buckets)))


def cap_per_stratum(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    max_rows: int,
) -> DataFrame:
    """Keep at most ``max_rows`` rows per stratum, deterministically (the
    lowest ids win) — the 'cap boilerplate-heavy domains' step of a
    training-data pipeline. One window over the stratum key; at web scale
    pair with salting only if a single stratum exceeds a task's memory,
    otherwise this is the plan you want (rank is computed map-side per
    stratum partition after one shuffle)."""
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_rows)
        .drop("_rn")
    )


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    *,
    default_rate: float = 1.0,
    salt: str = "",
    buckets: int = BUCKETS,
) -> DataFrame:
    """Per-stratum deterministic downsampling: stratum s keeps a
    ~``rates.get(s, default_rate)`` fraction of its rows. The id hash is
    stratum-independent, so changing one stratum's rate never changes
    which rows another stratum keeps."""
    rate = F.lit(int(round(default_rate * buckets)))
    for s, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == s, F.lit(int(round(r * buckets)))).otherwise(rate)
    return df.filter(hash_bucket(id_col, salt=salt, buckets=buckets) < rate)
