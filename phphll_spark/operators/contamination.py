"""Eval-set decontamination for training-data pipelines.

The standard n-gram overlap rule (popularized by the GPT-3 paper's 13-gram
decontamination): a training document is CONTAMINATED if it shares at
least one character n-gram (of the normalized text) with any document in
the evaluation set, and must be dropped before training.

Scale shape: the eval set's distinct shingle hashes are small (eval sets
are thousands of docs), so the membership check is a broadcast LEFT SEMI
join against the corpus's exploded shingle hashes — the corpus side stays
a narrow pass (zero-copy Arrow shingling + explode), nothing quadratic,
no big shuffle. For eval sets too large to broadcast, swap the semi-join
for a shuffle join on the hash — same plan otherwise.

Hashes are murmur64 of the shingle bytes (functions/similarity.py): a
false contamination flag needs a 64-bit collision (~n_grams²/2⁶⁵ — noise
at any realistic corpus), and missed contamination is impossible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.similarity import with_hashed_shingles
from ..functions.text import normalized_text


def _shingle_hash_rows(
    df: DataFrame, id_col: str, text_col: str, n: int, unit: str = "char"
) -> DataFrame:
    """(id, h) rows: one per distinct n-gram hash per doc."""
    sh = with_hashed_shingles(
        df.select(F.col(id_col), normalized_text(text_col).alias("_norm")),
        "_norm",
        shingle_k=n,
        unit=unit,
    )
    return sh.select(F.col(id_col), F.explode("shingle_hashes").alias("h"))


def ngram_contamination(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 13,
    unit: str = "char",
) -> DataFrame:
    """Ids of corpus docs sharing ≥1 normalized n-gram with the eval set
    (``unit``: "char" grams, or "word" grams — the GPT-3 paper's actual
    13-gram decontamination unit). Output: one column, ``id_col``,
    distinct."""
    ev = F.broadcast(
        _shingle_hash_rows(eval_df, id_col, text_col, n, unit).select("h").distinct()
    )
    doc_h = _shingle_hash_rows(corpus, id_col, text_col, n, unit)
    return doc_h.join(ev, "h", "left_semi").select(id_col).distinct()


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 13,
    unit: str = "char",
) -> DataFrame:
    """The cleaned corpus: drop every contaminated doc (anti-join on the
    contamination report), keep all original columns."""
    bad = ngram_contamination(corpus, eval_df, id_col, text_col, n=n, unit=unit)
    return corpus.join(bad, id_col, "left_anti")
