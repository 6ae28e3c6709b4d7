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
    *,
    salt_buckets: int = 64,
) -> DataFrame:
    """Keep at most ``max_rows`` rows per stratum, deterministically (the
    lowest ids win) — the 'cap boilerplate-heavy domains' step of a
    training-data pipeline.

    Skew-safe two-phase top-k (VERDICT r02 #2 — a single window over the
    stratum key sorts an entire head domain in one task):

    1. salted partial top-k: rank within (stratum, salt) where salt =
       xxhash64(id) % ``salt_buckets`` — a boilerplate-heavy stratum is
       spread over ``salt_buckets`` tasks; each salt class keeps its own
       ``max_rows`` lowest ids, so ≤ salt_buckets·max_rows candidates
       per stratum survive.
    2. exact re-rank of the (now bounded) candidates within the stratum.

    Every one of the stratum's ``max_rows`` globally-lowest ids survives
    phase 1 (at most max_rows−1 ids in its own salt class are lower), so
    the result is identical to the single-window rank. Requires ``id_col``
    to be unique (the deterministic tiebreak); the salt is a pure function
    of the id, so results are independent of physical partitioning. Size
    ``salt_buckets`` ≈ cluster parallelism; each phase-1 task then holds
    O(stratum/salt_buckets) rows and the phase-2 sort is over
    salt_buckets·max_rows rows per stratum.

    NB Spark ≥3.5 additionally plans a map-side ``WindowGroupLimit
    (Partial)`` for literal row_number limits (visible in PLANS.md), so
    even each phase's own shuffle carries at most max_rows rows per
    (partition, window key) — the salted phase is the explicit,
    engine-portable guarantee that no single task ever ranks a whole
    head stratum, and the group-limit pushdown makes both phases cheap."""
    from pyspark.sql import Window

    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets))
    w1 = Window.partitionBy(strata_col, "_salt").orderBy(F.col(id_col))
    w2 = Window.partitionBy(strata_col).orderBy(F.col(id_col))
    return (
        df.withColumn("_salt", salt)
        .withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= max_rows)
        .withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= max_rows)
        .drop("_rn", "_salt")
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
