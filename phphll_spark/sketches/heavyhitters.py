"""Misra–Gries heavy-hitters summary — mergeable frequent-items sketch on
the same distributed skeleton as the HLL/CMS family (SURVEY.md §2.1 rows
3/10/16: per-partition vectorized fold, sketch-only shuffle, associative
merge).

Summary = at most ``k`` (item, count) pairs plus the total stream length N.
Guarantee (Misra & Gries 1982; mergeability per Agarwal et al. 2012,
"Mergeable Summaries"): for every item x,

    true(x) − N/(k+1)  ≤  est(x)  ≤  true(x)

and every item with true(x) > N/(k+1) is PRESENT in the summary. Merging
two summaries = sum counts, then if more than ``k`` items remain, subtract
the (k+1)-th largest count from all and drop the non-positive — the
combined summary keeps the same N/(k+1) bound for the combined stream, so
any partition grouping / merge order yields a valid summary.

When the column's distinct count never exceeds ``k``, no decrement ever
happens and every count is EXACT — that regime is the oracle-paired
driver query; the bound regime is exported as a within-slack flag.

Wire format: b"MGHH" + uint32 k + uint64 N (LE) + uint32 n_entries +
entries of (uint32 len, key bytes, int64 count) — same small-header
spirit as the reference's HYLL framing (hyperloglog.c:1120-1176).
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import BinaryType, LongType, StringType

MAGIC = b"MGHH"


class InvalidMGError(ValueError):
    pass


def mg_fold(counts: dict[bytes, int], items: pd.Series, k: int) -> int:
    """Fold a batch of items into the summary dict (vectorized
    value_counts per batch, one decrement pass when the dict overflows).
    Returns the number of non-null items folded."""
    vc = items.dropna().astype(str).value_counts()
    for key, c in vc.items():
        kb = key.encode()
        counts[kb] = counts.get(kb, 0) + int(c)
    if len(counts) > k:
        _decrement_to_capacity(counts, k)
    return int(vc.sum())


def _decrement_to_capacity(counts: dict[bytes, int], k: int) -> None:
    """Subtract the (k+1)-th largest count from every entry and drop the
    non-positive — the MG decrement generalized to batches."""
    if len(counts) <= k:
        return
    vals = sorted(counts.values(), reverse=True)
    sub = vals[k]  # (k+1)-th largest
    for key in list(counts):
        nc = counts[key] - sub
        if nc > 0:
            counts[key] = nc
        else:
            del counts[key]


def mg_merge(
    a: tuple[dict[bytes, int], int], b: tuple[dict[bytes, int], int], k: int
) -> tuple[dict[bytes, int], int]:
    """Merge two (counts, N) summaries: sum counts, decrement to capacity.
    Associative/commutative up to the shared error bound (the bound, not
    the exact counter values, is what merging preserves — like t-digest)."""
    counts = dict(a[0])
    for key, c in b[0].items():
        counts[key] = counts.get(key, 0) + c
    _decrement_to_capacity(counts, k)
    return counts, a[1] + b[1]


def mg_serialize(counts: dict[bytes, int], n: int, k: int) -> bytes:
    out = [MAGIC, struct.pack("<IQI", k, n, len(counts))]
    # deterministic order so equal summaries have equal bytes
    for key in sorted(counts):
        out.append(struct.pack("<I", len(key)))
        out.append(key)
        out.append(struct.pack("<q", counts[key]))
    return b"".join(out)


def mg_deserialize(blob: bytes) -> tuple[dict[bytes, int], int, int]:
    if len(blob) < 20 or blob[:4] != MAGIC:
        raise InvalidMGError("bad magic, expected 'MGHH'")
    try:
        k, n, n_entries = struct.unpack_from("<IQI", blob, 4)
        counts: dict[bytes, int] = {}
        off = 20
        for _ in range(n_entries):
            (klen,) = struct.unpack_from("<I", blob, off)
            off += 4
            key = blob[off : off + klen]
            if len(key) != klen:
                raise InvalidMGError("truncated MG key")
            off += klen
            (c,) = struct.unpack_from("<q", blob, off)
            off += 8
            counts[key] = c
    except struct.error as e:
        raise InvalidMGError(f"truncated MG payload: {e}") from e
    if off != len(blob):
        raise InvalidMGError(f"MG payload length {len(blob)} != {off}")
    return counts, n, k


# ---------------------------------------------------------------------------
# Spark surface (same partial/merge shape as hll_* / cms_*)
# ---------------------------------------------------------------------------

def mg_partial_sketches(df: DataFrame, keys: list[str], value_col: str, k: int = 256) -> DataFrame:
    """Per-partition (optionally per-group) MG summaries via ``mapInArrow``
    — narrow fold, shuffle carries only ≤k-entry summaries.

    Arrow-native: per batch, group codes come from Arrow dictionary
    encoding (functions/sketch.py helper) and (group, value) counts from
    one combined-code ``np.unique`` — the only Python loop is over the
    batch's UNIQUE (group, value) pairs, never its rows."""
    import numpy as np
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import StructField, StructType

    from ..functions.sketch import _arrow_group_codes

    key_fields = [df.schema[kk] for kk in keys]
    out_schema = StructType(list(key_fields) + [StructField("mg", BinaryType(), False)])
    arrow_schema = to_arrow_schema(out_schema)

    def fold(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        acc: dict = {}  # key_tuple -> [counts_dict, n]
        for rb in batches:
            if rb.num_rows == 0:
                continue
            varr = rb.column(rb.schema.get_field_index(value_col))
            venc = varr.dictionary_encode()
            vvals = venc.dictionary.to_pylist()
            vcodes = venc.indices.to_numpy(zero_copy_only=False)
            valid = ~np.isnan(vcodes) if vcodes.dtype.kind == "f" else np.ones(len(vcodes), bool)
            vcodes = np.where(valid, vcodes, 0).astype(np.int64)
            if keys:
                gcodes, uniq_rows = _arrow_group_codes(rb, keys)
            else:
                gcodes, uniq_rows = np.zeros(rb.num_rows, dtype=np.int64), [()]
            for row in uniq_rows:
                if row not in acc:
                    acc[row] = [{}, 0]
            if not valid.any():
                continue
            pair = gcodes[valid] * len(vvals) + vcodes[valid]
            upair, ucnt = np.unique(pair, return_counts=True)
            ug, uv = np.divmod(upair, len(vvals))
            touched = set()
            for gi, vi, c in zip(ug.tolist(), uv.tolist(), ucnt.tolist()):
                row = uniq_rows[gi]
                entry = acc[row]
                key = str(vvals[vi]).encode()
                entry[0][key] = entry[0].get(key, 0) + c
                entry[1] += c
                touched.add(row)
            for row in touched:
                if len(acc[row][0]) > k:
                    _decrement_to_capacity(acc[row][0], k)
        if not acc:
            return
        rows = list(acc.keys())
        out = {kk: [r[ki] for r in rows] for ki, kk in enumerate(keys)}
        out["mg"] = [mg_serialize(acc[r][0], acc[r][1], k) for r in rows]
        yield pa.RecordBatch.from_pydict(out, schema=arrow_schema)

    return df.select(*keys, value_col).mapInArrow(fold, schema=out_schema)


def make_mg_merge_agg():
    @pandas_udf(BinaryType())
    def mg_merge_agg(blobs: pd.Series) -> bytes:
        acc = None
        kk = None
        for blob in blobs:
            if blob is None:
                continue
            counts, n, k = mg_deserialize(bytes(blob))
            if acc is None:
                acc, kk = (counts, n), k
            else:
                if k != kk:
                    raise InvalidMGError(f"cannot merge MG of capacities {kk} and {k}")
                acc = mg_merge(acc, (counts, n), kk)
        if acc is None:
            # empty input -> NULL, not a k=0 sentinel that would poison
            # later merges with real-capacity summaries
            return None
        return mg_serialize(acc[0], acc[1], kk)

    return mg_merge_agg


def mg_sketch(df: DataFrame, keys: list[str], value_col: str, k: int = 256) -> DataFrame:
    partials = mg_partial_sketches(df, keys, value_col, k)
    merge = make_mg_merge_agg()
    if keys:
        return partials.groupBy(*keys).agg(merge(F.col("mg")).alias("mg"))
    return partials.agg(merge(F.col("mg")).alias("mg"))


@pandas_udf(LongType())
def mg_point_estimate(blobs: pd.Series, items: pd.Series) -> pd.Series:
    """Estimated count of ``item`` (0 when absent — valid: absent items
    have true count ≤ N/(k+1))."""
    out = []
    for blob, item in zip(blobs, items):
        if blob is None or item is None:
            out.append(0)
            continue
        counts, _, _ = mg_deserialize(bytes(blob))
        out.append(counts.get(str(item).encode(), 0))
    return pd.Series(out, dtype="int64")


@pandas_udf(LongType())
def mg_total(blobs: pd.Series) -> pd.Series:
    """Exact number of items folded (N — for the N/(k+1) error slack)."""
    out = []
    for blob in blobs:
        out.append(0 if blob is None else mg_deserialize(bytes(blob))[1])
    return pd.Series(out, dtype="int64")


def mg_entries(mg_col):
    """Explodeable map of the summary's (item, est_count) entries as a
    Spark SQL map<string,bigint> (scalar UDF)."""

    @pandas_udf("map<string,bigint>")
    def _entries(blobs: pd.Series) -> pd.Series:
        out = []
        for blob in blobs:
            if blob is None:
                out.append({})
                continue
            counts, _, _ = mg_deserialize(bytes(blob))
            out.append({key.decode(): c for key, c in counts.items()})
        return pd.Series(out)

    return _entries(mg_col)
