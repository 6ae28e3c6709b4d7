"""Count-Min Sketch — mergeable frequency sketch on the HLL agg skeleton.

Same distributed shape as the HLL path (SURVEY.md §2.1 rows 3/10/16):
per-partition vectorized update (np.add.at over murmur-derived columns),
sketch-only shuffle, element-wise-sum merge (associative+commutative), and
point queries as min-over-rows. Error bound: est(x) ∈ [true(x),
true(x) + ε·N] with prob ≥ 1−δ for width w = ⌈e/ε⌉, depth d = ⌈ln 1/δ⌉
(Cormode & Muthukrishnan 2005).

Wire format: b"CMSK" + uint8 d + 0x00 pad + uint32 w (LE) + d*w int64 LE
counters — small header in the spirit of the reference's HYLL framing.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import BinaryType, LongType, StructField, StructType

from .. import kernel

MAGIC = b"CMSK"
# independent row hashes: one murmur per row-seed (seed derived from base)
_ROW_SEED_BASE = 0x58F0D321


class InvalidCMSError(ValueError):
    pass


def empty_cms(depth: int = 4, width: int = 2048) -> np.ndarray:
    return np.zeros((depth, width), dtype=np.int64)


def cms_update(cms: np.ndarray, data: np.ndarray, offsets: np.ndarray) -> None:
    """Fold a batch of byte strings (Arrow buffers) into the sketch."""
    if len(offsets) <= 1:
        return
    d, w = cms.shape
    for row in range(d):
        h = kernel.murmur64a(data, offsets, seed=(_ROW_SEED_BASE + row) & 0xFFFFFFFF)
        np.add.at(cms[row], (h % np.uint64(w)).astype(np.int64), 1)


def cms_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if a.shape != b.shape:
        raise InvalidCMSError(f"cannot merge CMS of shapes {a.shape} and {b.shape}")
    return a + b


def cms_query(cms: np.ndarray, items_data: np.ndarray, items_offsets: np.ndarray) -> np.ndarray:
    """Point frequency estimates for a batch of items (min over rows)."""
    d, w = cms.shape
    n = len(items_offsets) - 1
    est = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    for row in range(d):
        h = kernel.murmur64a(items_data, items_offsets, seed=(_ROW_SEED_BASE + row) & 0xFFFFFFFF)
        est = np.minimum(est, cms[row, (h % np.uint64(w)).astype(np.int64)])
    return est


def cms_serialize(cms: np.ndarray) -> bytes:
    d, w = cms.shape
    return MAGIC + bytes([d, 0]) + int(w).to_bytes(4, "little") + cms.astype("<i8").tobytes()


def cms_deserialize(blob: bytes) -> np.ndarray:
    if len(blob) < 10 or blob[:4] != MAGIC:
        raise InvalidCMSError("bad magic, expected 'CMSK'")
    d = blob[4]
    w = int.from_bytes(blob[6:10], "little")
    expected = 10 + d * w * 8
    if len(blob) != expected:
        raise InvalidCMSError(f"CMS payload length {len(blob)} != {expected} for d={d} w={w}")
    return np.frombuffer(blob[10:], dtype="<i8").reshape(d, w).copy()


# ---------------------------------------------------------------------------
# Spark surface (same partial/merge shape as hll_*)
# ---------------------------------------------------------------------------

def cms_partial_sketches(
    df: DataFrame, keys: list[str], value_col: str, depth: int = 4, width: int = 2048
) -> DataFrame:
    from ..functions.sketch import _series_to_buffers

    key_fields = [df.schema[k] for k in keys]
    out_schema = StructType(list(key_fields) + [StructField("cms", BinaryType(), False)])

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict = {}
        for pdf in batches:
            if pdf.empty:
                continue
            data, offsets, valid = _series_to_buffers(pdf[value_col])
            if not keys:
                codes = np.zeros(max(len(offsets) - 1, 0), dtype=np.int64)
                uniques_rows = [()]
            else:
                if len(keys) == 1:
                    codes_full, uniques = pd.factorize(pdf[keys[0]], use_na_sentinel=False)
                    uniques_rows = [(u,) for u in uniques]
                else:
                    mi = pd.MultiIndex.from_frame(pdf[keys])
                    codes_full, uniques = pd.factorize(mi, use_na_sentinel=False)
                    uniques_rows = list(uniques)
                codes = codes_full[valid] if valid is not None else codes_full
            for row in uniques_rows:
                if row not in acc:
                    acc[row] = empty_cms(depth, width)
            n_items = len(offsets) - 1
            if n_items <= 0:
                continue
            # hash the whole batch once per sketch row, then scatter-add
            # each group's slice — no per-item Python
            cols = [
                (
                    kernel.murmur64a(data, offsets, seed=(_ROW_SEED_BASE + r) & 0xFFFFFFFF)
                    % np.uint64(width)
                ).astype(np.int64)
                for r in range(depth)
            ]
            order = np.argsort(codes, kind="stable")
            sc = codes[order]
            bounds = np.flatnonzero(np.diff(sc)) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [len(sc)]))
            for s, e in zip(starts.tolist(), ends.tolist()):
                g = acc[uniques_rows[sc[s]]]
                sel = order[s:e]
                for r in range(depth):
                    np.add.at(g[r], cols[r][sel], 1)
        if not acc:
            return
        rows = list(acc.keys())
        out = {k: [r[ki] for r in rows] for ki, k in enumerate(keys)}
        out["cms"] = [cms_serialize(acc[r]) for r in rows]
        yield pd.DataFrame(out)

    return df.select(*keys, value_col).mapInPandas(fold, schema=out_schema)


def make_cms_merge_agg():
    @pandas_udf(BinaryType())
    def cms_merge_agg(blobs: pd.Series) -> bytes:
        acc = None
        for blob in blobs:
            if blob is None:
                continue
            m = cms_deserialize(bytes(blob))
            acc = m if acc is None else cms_merge(acc, m)
        if acc is None:
            acc = empty_cms()
        return cms_serialize(acc)

    return cms_merge_agg


def cms_sketch(df: DataFrame, keys: list[str], value_col: str, depth: int = 4, width: int = 2048) -> DataFrame:
    partials = cms_partial_sketches(df, keys, value_col, depth, width)
    merge = make_cms_merge_agg()
    if keys:
        return partials.groupBy(*keys).agg(merge(F.col("cms")).alias("cms"))
    return partials.agg(merge(F.col("cms")).alias("cms"))


@pandas_udf(LongType())
def cms_total(blobs: pd.Series) -> pd.Series:
    """Exact number of items folded into the sketch: every add increments
    exactly one counter per row, so any single row sums to N. Lets callers
    derive the ε·N error slack from the sketch itself instead of running a
    separate COUNT job over the source."""
    out = np.zeros(len(blobs), dtype=np.int64)
    for i, blob in enumerate(blobs):
        if blob is None:
            continue
        out[i] = int(cms_deserialize(bytes(blob))[0].sum())
    return pd.Series(out)


@pandas_udf(LongType())
def cms_point_estimate(blobs: pd.Series, items: pd.Series) -> pd.Series:
    """Per-row frequency estimate of `item` in `cms` (scalar UDF)."""
    out = np.zeros(len(blobs), dtype=np.int64)
    for i, (blob, item) in enumerate(zip(blobs, items)):
        if blob is None or item is None:
            continue
        cms = cms_deserialize(bytes(blob))
        data, offsets = kernel.bytes_to_buffers([str(item).encode()])
        out[i] = int(cms_query(cms, data, offsets)[0])
    return pd.Series(out)
