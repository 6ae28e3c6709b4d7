"""Theta (KMV) sketch — mergeable distinct-count sketch with SET
OPERATIONS (union / intersection / difference), on the same distributed
skeleton as the HLL/CMS family (per-partition vectorized fold,
sketch-only shuffle, associative merge agg).

Where HLL only unions (SURVEY.md §2.5 set ops — intersection there is
inclusion–exclusion arithmetic with summed bounds), the theta sketch
supports first-class set algebra (Dasgupta, Lang, Rhodes, Thorpe —
the Apache DataSketches theta framework): a sketch retains the at most
``k`` smallest 64-bit hash values below a threshold θ (initially 1);
``estimate = |retained| / θ``. For two sketches:

- union:        θ = min(θa, θb); retained = k smallest of (A ∪ B) < θ
- intersection: θ = min(θa, θb); retained = (A ∩ B) < θ
- a-not-b:      θ = min(θa, θb); retained = (A \\ B_all) < θ

Relative standard error ≈ 1/√(k−1) for union-built sketches;
intersection error grows as the true overlap shrinks (the standard
caveat — exported bounds use the retained-count form
RSE ≈ √((1−j)/j)/√k with j the observed Jaccard, simplified here to the
union bound for tests in the exact regime).

Determinism: retained sets are SETS of hashes and trimming keeps the k
smallest — so folds and merges are associative, commutative, idempotent
and partition-order invariant BIT-EXACTLY (stronger than t-digest/MG,
same as HLL), which the property tests pin.

Below ``k`` distinct values θ stays 1 and every operation is EXACT —
the oracle-comparable regime.

Wire format: b"THTA" + uint32 k + uint64 theta (scaled, 2^64-1 ⇔ θ=1) +
uint32 n + n × uint64 sorted retained hashes (LE) — same small-header
framing spirit as the reference's HYLL header (hyperloglog.c:1120-1176).
"""

from __future__ import annotations

import math
import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import BinaryType, BooleanType, DoubleType, LongType

from .. import kernel

MAGIC = b"THTA"
_THETA_ONE = np.uint64(0xFFFFFFFFFFFFFFFF)


class InvalidThetaError(ValueError):
    pass


def _trim(entries: np.ndarray, theta: np.uint64, k: int) -> tuple[np.ndarray, np.uint64]:
    """Keep the k smallest entries strictly below theta; when trimming,
    theta becomes the (k+1)-th smallest (dropped) value."""
    entries = entries[entries < theta]
    if len(entries) > k:
        entries = np.sort(entries)
        theta = entries[k]
        entries = entries[:k]
    else:
        entries = np.sort(entries)
    return entries, theta


def theta_fold(
    entries: np.ndarray, theta: np.uint64, hashes: np.ndarray, k: int
) -> tuple[np.ndarray, np.uint64]:
    """Fold a batch of 64-bit hashes into (entries, theta) — vectorized:
    filter below theta, set-union, one trim."""
    hv = np.unique(hashes[hashes < theta])
    if len(hv) == 0:
        return entries, theta
    merged = np.union1d(entries, hv)
    return _trim(merged, theta, k)


def theta_merge(
    a: tuple[np.ndarray, np.uint64], b: tuple[np.ndarray, np.uint64], k: int
) -> tuple[np.ndarray, np.uint64]:
    """Union merge — associative/commutative/idempotent bit-exactly."""
    theta = min(a[1], b[1])
    merged = np.union1d(a[0], b[0])
    return _trim(merged, theta, k)


def theta_estimate_state(entries: np.ndarray, theta: np.uint64) -> float:
    if theta == _THETA_ONE:
        return float(len(entries))  # exact regime
    return len(entries) / (int(theta) / 2.0**64)


def theta_intersect_state(
    a: tuple[np.ndarray, np.uint64], b: tuple[np.ndarray, np.uint64]
) -> tuple[np.ndarray, np.uint64]:
    theta = min(a[1], b[1])
    inter = np.intersect1d(a[0], b[0])
    return inter[inter < theta], theta


def theta_a_not_b_state(
    a: tuple[np.ndarray, np.uint64], b: tuple[np.ndarray, np.uint64]
) -> tuple[np.ndarray, np.uint64]:
    theta = min(a[1], b[1])
    diff = np.setdiff1d(a[0], b[0])
    return diff[diff < theta], theta


def theta_serialize(entries: np.ndarray, theta: np.uint64, k: int) -> bytes:
    return b"".join(
        [
            MAGIC,
            struct.pack("<IQI", k, int(theta), len(entries)),
            np.sort(entries.astype(np.uint64)).tobytes(),
        ]
    )


def theta_deserialize(blob: bytes) -> tuple[np.ndarray, np.uint64, int]:
    if len(blob) < 20 or blob[:4] != MAGIC:
        raise InvalidThetaError("bad magic, expected 'THTA'")
    k, theta, n = struct.unpack_from("<IQI", blob, 4)
    if len(blob) != 20 + 8 * n:
        raise InvalidThetaError(f"theta payload length {len(blob)} != {20 + 8 * n}")
    entries = np.frombuffer(blob, dtype="<u8", count=n, offset=20).copy()
    return entries, np.uint64(theta), k


# ---------------------------------------------------------------------------
# Spark surface (same partial/merge shape as hll_* / mg_*)
# ---------------------------------------------------------------------------

def theta_partial_sketches(
    df: DataFrame, keys: list[str], value_col: str, k: int = 4096
) -> DataFrame:
    """Per-partition (optionally per-group) theta sketches via
    ``mapInArrow`` — values hashed straight from Arrow buffers with the
    repo's murmur64a, shuffle carries ≤(20 + 8k)-byte sketches."""
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import StructField, StructType

    from ..functions.sketch import _arrow_group_codes, _arrow_to_buffers

    key_fields = [df.schema[kk] for kk in keys]
    out_schema = StructType(list(key_fields) + [StructField("theta", BinaryType(), False)])
    arrow_schema = to_arrow_schema(out_schema)
    empty = np.empty(0, dtype=np.uint64)

    def fold(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        acc: dict = {}  # key tuple -> [entries, theta]
        for rb in batches:
            if rb.num_rows == 0:
                continue
            varr = rb.column(rb.schema.get_field_index(value_col))
            data, offsets, valid = _arrow_to_buffers(varr)
            hashes = (
                kernel.murmur64a(data, offsets) if len(offsets) > 1 else np.empty(0, np.uint64)
            )
            if keys:
                gcodes, uniq_rows = _arrow_group_codes(rb, keys)
            else:
                gcodes, uniq_rows = np.zeros(rb.num_rows, dtype=np.int64), [()]
            for row in uniq_rows:
                if row not in acc:
                    acc[row] = [empty, _THETA_ONE]
            codes = gcodes[valid] if valid is not None else gcodes
            if len(hashes) == 0:
                continue
            order = np.argsort(codes, kind="stable")
            sc, sh = codes[order], hashes[order]
            bounds = np.flatnonzero(np.diff(sc)) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [len(sc)]))
            for s, e in zip(starts.tolist(), ends.tolist()):
                row = uniq_rows[sc[s]]
                st = acc[row]
                st[0], st[1] = theta_fold(st[0], st[1], sh[s:e], k)
        if not acc:
            return
        rows = list(acc.keys())
        out = {kk: [r[ki] for r in rows] for ki, kk in enumerate(keys)}
        out["theta"] = [theta_serialize(acc[r][0], acc[r][1], k) for r in rows]
        yield pa.RecordBatch.from_pydict(out, schema=arrow_schema)

    return df.select(*keys, value_col).mapInArrow(fold, schema=out_schema)


def make_theta_merge_agg():
    @pandas_udf(BinaryType())
    def theta_merge_agg(blobs: pd.Series) -> bytes:
        acc = None
        kk = None
        for blob in blobs:
            if blob is None:
                continue
            entries, theta, k = theta_deserialize(bytes(blob))
            if acc is None:
                acc, kk = (entries, theta), k
            else:
                if k != kk:
                    raise InvalidThetaError(f"cannot merge theta sketches of k {kk} and {k}")
                acc = theta_merge(acc, (entries, theta), kk)
        if acc is None:
            return theta_serialize(np.empty(0, np.uint64), _THETA_ONE, 4096)
        return theta_serialize(acc[0], acc[1], kk)

    return theta_merge_agg


def theta_sketch(df: DataFrame, keys: list[str], value_col: str, k: int = 4096) -> DataFrame:
    """keys... + merged ``theta`` sketch per group."""
    partials = theta_partial_sketches(df, keys, value_col, k)
    merge = make_theta_merge_agg()
    if keys:
        return partials.groupBy(*keys).agg(merge(F.col("theta")).alias("theta"))
    return partials.agg(merge(F.col("theta")).alias("theta"))


@pandas_udf(DoubleType())
def theta_estimate(blobs: pd.Series) -> pd.Series:
    out = []
    for blob in blobs:
        if blob is None:
            out.append(0.0)
            continue
        entries, theta, _ = theta_deserialize(bytes(blob))
        out.append(theta_estimate_state(entries, theta))
    return pd.Series(out, dtype="float64")


@pandas_udf(LongType())
def theta_retained(blobs: pd.Series) -> pd.Series:
    return pd.Series(
        [0 if b is None else theta_deserialize(bytes(b))[0].size for b in blobs], dtype="int64"
    )


@pandas_udf(BooleanType())
def theta_is_exact(blobs: pd.Series) -> pd.Series:
    """TRUE while the sketch is still in its EXACT regime: θ == 1 means no
    trim ever happened, so the retained set is the complete distinct-hash
    set and every estimate/set-op on it is exact (up to 64-bit hash
    collisions). θ only ever decreases (fold and merge both min/trim), so
    a merged sketch is exact iff its whole input stream held ≤ k distinct
    values."""
    return pd.Series(
        [b is not None and theta_deserialize(bytes(b))[1] == _THETA_ONE for b in blobs],
        dtype="bool",
    )


def theta_intersection_report(
    sketch_a, sketch_b, exact_col, union_est_col, *, k: int
) -> list:
    """Regime-aware intersection export columns (SURVEY.md §2.5 set ops —
    the estimation-regime contract the exact-pin oracle can't cover):

    - ``theta_exact_regime``: both sides still θ=1 (≤ k distinct each) —
      the intersection below is then EXACT, not an estimate.
    - ``theta_intersection``: the intersection estimate in the exact
      regime (pinnable to the true count by an oracle), −1 once either
      side estimates — an estimate must never be exported where a gate
      would hash-compare it against an exact value.
    - ``theta_within_bound``: exact regime ⇒ strict equality with
      ``exact_col``; estimation regime ⇒ |est − exact| ≤
      ⌈6/√(k−1) · union⌉. The union scaling is the conservative form of
      the binomial-thinning variance: retained∩ ~ Binomial(I, θ) with
      θ ≈ k/U gives std(est) ≈ √(I·U/k) ≤ U/√k, so 6/√(k−1)·U ≥ 6σ.

    ``sketch_a``/``sketch_b`` are merged theta sketch columns (same k as
    the ``k`` argument), ``exact_col`` the true intersection count,
    ``union_est_col`` an upper-ish estimate of |A ∪ B| (an HLL union
    estimate qualifies)."""
    est = theta_estimate(theta_intersect(sketch_a, sketch_b)).cast("long")
    exact_regime = theta_is_exact(sketch_a) & theta_is_exact(sketch_b)
    bound = F.ceil(F.lit(6.0 / math.sqrt(k - 1)) * union_est_col)
    return [
        exact_regime.alias("theta_exact_regime"),
        F.when(exact_regime, est).otherwise(F.lit(-1)).alias("theta_intersection"),
        F.when(exact_regime, est == exact_col)
        .otherwise(F.abs(est - exact_col) <= bound)
        .alias("theta_within_bound"),
    ]


def _binary_op(op):
    @pandas_udf(BinaryType())
    def fn(a: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for x, y in zip(a, b):
            ea, ta, ka = theta_deserialize(bytes(x))
            eb, tb, kb = theta_deserialize(bytes(y))
            if ka != kb:
                raise InvalidThetaError(f"cannot combine theta sketches of k {ka} and {kb}")
            entries, theta = op((ea, ta), (eb, tb), ka)
            out.append(theta_serialize(entries, theta, ka))
        return pd.Series(out)

    return fn


theta_intersect = _binary_op(lambda a, b, k: theta_intersect_state(a, b))
theta_a_not_b = _binary_op(lambda a, b, k: theta_a_not_b_state(a, b))
theta_union_pair = _binary_op(theta_merge)
