"""Deterministic Common-Crawl-style ``pages`` table generator.

Schema per BASELINE.json input_hint: (url string, warc_ts timestamp,
html binary, text string, lang string). Every derived column is a pure
function of the row/url id (seeded), so the per-row invariant
"byte-identical extracted text per url" is checkable against a re-run
(FIXTURES.md §1), at any scale and any partitioning.

Properties:
- hosts are log-uniform (zipf-ish) over ``n_hosts`` → host skew is real
  (the top host takes ~1/ln(n_hosts) of rows), exercising salting;
- ~``dup_fraction`` of rows repeat an earlier row's url (exact dups), so
  distinct(url) < count(*) with a deterministically computable truth;
- ``html`` contains NUL bytes (binary-safety) and is never read by the
  sketch path — column pruning is observable in the scan.

Generation runs distributed (mapInPandas over spark.range) and is
partition-count independent: row ``id`` fully determines the row.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES_SCHEMA = StructType(
    [
        StructField("row_id", LongType(), False),
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), False),
    ]
)

_LANGS = ["en", "en", "en", "en", "en", "en", "de", "fr", "es", "zh"]  # ~60% en
_VOCAB_SIZE = 4096
_WORDS_PER_DOC = 40
_EPOCH_2024_09_01 = 1725148800  # 2024-09-01T00:00:00Z

_M1 = np.uint64(0x9E3779B97F4A7C15)
_M2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _mix(x: np.ndarray) -> np.ndarray:
    """splitmix64-style deterministic mixer (uint64 in/out)."""
    x = (x + _M1)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _vocab(seed: int) -> list[str]:
    rng = np.random.default_rng(seed)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    return ["".join(rng.choice(letters, rng.integers(3, 9))) for _ in range(_VOCAB_SIZE)]


def effective_url_ids(ids: np.ndarray, dup_fraction: float, seed: int) -> np.ndarray:
    """Map row id -> url id; ~dup_fraction of rows point at an earlier id."""
    u = _mix(ids.astype(np.uint64) ^ np.uint64(seed))
    is_dup = (u % np.uint64(1000)).astype(np.float64) < dup_fraction * 1000
    # earlier target: hash-picked id strictly below (floor to avoid self)
    floor = np.maximum(ids, 1).astype(np.uint64)
    target = _mix(u) % floor
    return np.where(is_dup & (ids > 0), target.astype(np.int64), ids)


def generate_pages(
    spark: SparkSession,
    n_rows: int,
    *,
    n_hosts: int = 1000,
    dup_fraction: float = 0.10,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    vocab = _vocab(seed)
    langs = _LANGS

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            uid = effective_url_ids(ids, dup_fraction, seed)
            uu = uid.astype(np.uint64)
            # zipf-ish host: log-uniform over n_hosts
            h01 = (_mix(uu ^ np.uint64(seed * 3 + 1)) % np.uint64(1 << 30)).astype(np.float64) / (1 << 30)
            host_idx = np.minimum((n_hosts ** h01).astype(np.int64) - 1, n_hosts - 1)
            host_idx = np.maximum(host_idx, 0)
            lang_idx = (_mix(host_idx.astype(np.uint64) ^ np.uint64(seed * 7 + 3)) % np.uint64(len(langs))).astype(
                np.int64
            )
            # words: (docs x W) vocab indices, pure function of url id
            j = np.arange(_WORDS_PER_DOC, dtype=np.uint64)
            widx = (_mix(uu[:, None] * np.uint64(2654435761) + j[None, :] * np.uint64(40503)) % np.uint64(
                _VOCAB_SIZE
            )).astype(np.int64)
            ts = (
                _EPOCH_2024_09_01
                + (uu % np.uint64(30)).astype(np.int64) * 86400
                + (_mix(ids.astype(np.uint64)) % np.uint64(86400)).astype(np.int64)
            )
            urls, texts, htmls, langs_col = [], [], [], []
            for r in range(len(ids)):
                u_id = int(uid[r])
                url = f"https://host{int(host_idx[r])}.example.com/page/{u_id}"
                urls.append(url)
                texts.append(" ".join(vocab[w] for w in widx[r]))
                htmls.append(b"<html>\x00<body>" + url.encode() + b"\x00</body></html>")
                langs_col.append(langs[int(lang_idx[r])])
            yield pd.DataFrame(
                {
                    "row_id": ids,
                    "url": urls,
                    "warc_ts": pd.to_datetime(ts, unit="s"),
                    "html": htmls,
                    "text": texts,
                    "lang": langs_col,
                }
            )

    n_parts = partitions or max(8, n_rows // 250_000)
    return spark.range(0, n_rows, numPartitions=n_parts).mapInPandas(gen, schema=PAGES_SCHEMA)


def extract_text_oracle(url: str, seed: int = 42) -> str:
    """Serial oracle for the per-row invariant: byte-identical text per url.
    Recomputes text from the url alone (parses the url id back out)."""
    u_id = int(url.rsplit("/", 1)[1])
    vocab = _vocab(seed)
    uu = np.uint64(u_id)
    j = np.arange(_WORDS_PER_DOC, dtype=np.uint64)
    widx = (_mix(uu * np.uint64(2654435761) + j * np.uint64(40503)) % np.uint64(_VOCAB_SIZE)).astype(np.int64)
    return " ".join(vocab[w] for w in widx)


def generate_pages_parquet(
    spark: SparkSession,
    path: str,
    n_rows: int,
    *,
    n_files: int | None = None,
    **kw,
) -> str:
    """Materialize the pages table as a parquet directory (the stand-in for
    an Iceberg snapshot; file paths are the stable split ids the resume
    pipeline keys lineage on)."""
    df = generate_pages(spark, n_rows, **kw)
    if n_files:
        df = df.repartition(n_files)
    df.write.mode("overwrite").parquet(path)
    return path


def exact_distinct_urls(n_rows: int, dup_fraction: float = 0.10, seed: int = 42) -> int:
    """Closed-form ground truth for distinct urls (numpy, exact)."""
    ids = np.arange(n_rows, dtype=np.int64)
    return int(np.unique(effective_url_ids(ids, dup_fraction, seed)).size)
