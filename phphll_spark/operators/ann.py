"""Approximate nearest neighbor search over an embedding column.

Two paths:

- ``cosine_topk_bruteforce``: exact top-k by cosine, scored with native
  higher-order functions (zip_with + aggregate — JVM, codegen) against a
  broadcast query table. The correctness baseline.
- ``cosine_topk_blocked``: the scale path. The query matrix is broadcast
  to executors once; each Arrow batch of corpus vectors is scored with a
  single numpy matmul (batch x dim @ dim x q), and only each batch's local
  top-k survive, so the shuffle carries O(partitions * q * k) rows into the
  final global top-k — never the corpus.
- ``sign_lsh_buckets``: random-hyperplane LSH bucketing for sublinear
  candidate generation / embedding-dedup blocking.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import BinaryType, DoubleType, LongType, StructField, StructType

from .similarity_util import normalize_rows
from ..functions.similarity import cosine


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    *,
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query: broadcast the (small) query table,
    score every (query, corpus) pair plan-natively, window-rank per query.

    Output: (query_id, neighbor_id, cosine_sim, rank)."""
    q = F.broadcast(
        queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    )
    scored = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col)).crossJoin(q).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col(vec_col), F.col("qvec")), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cosine_topk_blocked(
    corpus: DataFrame,
    query_vectors: dict[int, list[float]],
    id_col: str,
    vec_col: str,
    *,
    k: int = 5,
) -> DataFrame:
    """Scale path: numpy matmul per Arrow batch against the broadcast query
    matrix, local top-k per batch, global top-k at the end.

    ``query_vectors``: {query_id: vector} — small enough to broadcast
    (closure-captured; at real scale use sc.broadcast explicitly).
    Output: (query_id, neighbor_id, cosine_sim, rank) — identical contract
    to the bruteforce path (validated in tests)."""
    qids = np.array(sorted(query_vectors), dtype=np.int64)
    Q = normalize_rows(np.array([query_vectors[int(i)] for i in qids], dtype=np.float64))
    schema = StructType(
        [
            StructField("query_id", LongType(), False),
            StructField("neighbor_id", LongType(), False),
            StructField("cosine_sim", DoubleType(), False),
        ]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            X = normalize_rows(np.array(list(pdf[vec_col]), dtype=np.float64))
            sims = X @ Q.T  # (batch, q)
            kk = min(k, len(ids))
            # local top-k per query via argpartition (O(batch) not O(batch log batch))
            part = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (k, q)
            rows_q = np.repeat(qids, kk)
            rows_n = ids[part.T.reshape(-1)]
            rows_s = np.take_along_axis(sims, part, axis=0).T.reshape(-1)
            yield pd.DataFrame({"query_id": rows_q, "neighbor_id": rows_n, "cosine_sim": np.round(rows_s, 6)})

    local = corpus.select(id_col, vec_col).mapInPandas(score, schema=schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return local.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def kmeans_centroids(
    vecs: np.ndarray, n_centroids: int, *, iters: int = 10, seed: int = 42
) -> np.ndarray:
    """Plain-numpy Lloyd's k-means on (normalized) sample vectors — the
    coarse quantizer trainer for IVF. Deterministic (seeded init); empty
    clusters re-seeded from the farthest points."""
    X = normalize_rows(np.asarray(vecs, dtype=np.float64))
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)].copy()
    for _ in range(iters):
        sims = X @ C.T
        assign = np.argmax(sims, axis=1)
        empties = []
        for c in range(len(C)):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
            else:
                empties.append(c)
        if empties:
            # each empty cluster gets a DISTINCT farthest point (ascending
            # max-sim order), not one shared point duplicated
            order = np.argsort(np.max(sims, axis=1))
            for j, c in enumerate(empties):
                C[c] = X[order[j % len(X)]]
        C = normalize_rows(C)
    return C


def ivf_topk(
    corpus: DataFrame,
    query_vectors: dict[int, list[float]],
    id_col: str,
    vec_col: str,
    *,
    centroids: np.ndarray,
    n_probe: int = 4,
    k: int = 5,
) -> DataFrame:
    """IVF-style approximate top-k: corpus vectors are assigned to their
    nearest coarse centroid per Arrow batch (one matmul); each query only
    scores vectors whose centroid is in its ``n_probe`` nearest lists.

    At real scale the assignment runs once into a bucketed/partitioned
    table and queries touch only their probe partitions; here the probe
    mask is applied in-flight so the whole operator stays one narrow
    pass + a tiny top-k shuffle, same contract as cosine_topk_blocked.
    Output: (query_id, neighbor_id, cosine_sim, rank)."""
    qids = np.array(sorted(query_vectors), dtype=np.int64)
    Q = normalize_rows(np.array([query_vectors[int(i)] for i in qids], dtype=np.float64))
    C = normalize_rows(np.asarray(centroids, dtype=np.float64))
    # probe_mask[c, q] = centroid c is among query q's n_probe nearest
    qc = Q @ C.T  # (q, centroids)
    probes = np.argsort(-qc, axis=1)[:, :n_probe]
    probe_mask = np.zeros((C.shape[0], len(qids)), dtype=bool)
    for qi in range(len(qids)):
        probe_mask[probes[qi], qi] = True
    schema = StructType(
        [
            StructField("query_id", LongType(), False),
            StructField("neighbor_id", LongType(), False),
            StructField("cosine_sim", DoubleType(), False),
        ]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            X = normalize_rows(np.array(list(pdf[vec_col]), dtype=np.float64))
            assign = np.argmax(X @ C.T, axis=1)
            sims = X @ Q.T  # (batch, q)
            sims[~probe_mask[assign]] = -2.0  # outside probe lists
            kk = min(k, len(ids))
            part = np.argpartition(-sims, kk - 1, axis=0)[:kk]
            rows_q = np.repeat(qids, kk)
            rows_n = ids[part.T.reshape(-1)]
            rows_s = np.take_along_axis(sims, part, axis=0).T.reshape(-1)
            keep = rows_s > -2.0
            yield pd.DataFrame(
                {
                    "query_id": rows_q[keep],
                    "neighbor_id": rows_n[keep],
                    "cosine_sim": np.round(rows_s[keep], 6),
                }
            )

    local = corpus.select(id_col, vec_col).mapInPandas(score, schema=schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return local.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cosine_all_pairs_blocked(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    threshold: float,
    num_blocks: int = 8,
) -> DataFrame:
    """EXACT all-pairs cosine ≥ threshold via blocked GEMM — the scalable
    shape for LOW thresholds, where LSH blocking cannot prune (a sim-0
    pair still collides at (1/2)^r per table) but the O(n²) FLOPs are
    unavoidable anyway and the only question is distributing them.

    Plan: vectors are packed into ``num_blocks`` matrices (one groupBy),
    the B(B+1)/2 block combos come from two broadcast equi-joins against
    a tiny combo table (no nested-loop/cartesian node), and each combo
    task runs ONE numpy matmul, emitting only qualifying pairs — so the
    shuffle carries B matrices × B replicas in, and just the result pairs
    out. Size ``num_blocks`` so a block matrix (n/B × dim doubles) fits
    an executor task comfortably.

    Output: (id_a, id_b, cosine_sim) with id_a < id_b, sim rounded to 4
    (same contract as embedding_near_dup_pairs; zero vectors score 0.0).

    Float caveat (ADVICE r2): the BLAS matmul accumulates dots in a
    different association order than a sequential scalar loop (and than
    DuckDB's list_dot_product), so sims are equal to the sequential
    value only up to a few ulps. The floor-based half-up rounding at 1e-4
    makes a visible flip require a sim within ~1e-12 of a rounding
    boundary or of the threshold — accepted and documented rather than
    giving up the GEMM (a fixed-order scalar accumulation would be
    orders of magnitude slower); pick thresholds away from representable
    sim values if bit-exact parity with a sequential oracle matters."""
    spark = df.sparkSession
    B = num_blocks
    packed_schema = StructType(
        [
            StructField("block", LongType(), False),
            StructField("n", LongType(), False),
            StructField("ids", BinaryType(), False),
            StructField("mat", BinaryType(), False),
        ]
    )

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        # applyInPandas: the WHOLE block arrives as one frame, so a block
        # is always exactly one packed row (a batched mapInPandas would
        # split >65k-row blocks into sub-rows and double-emit same-block
        # pairs across sub-row combinations)
        ids = g[id_col].to_numpy(dtype=np.int64)
        X = normalize_rows(np.array(list(g[vec_col]), dtype=np.float64))
        return pd.DataFrame(
            {
                "block": [int(g["block"].iloc[0])],
                "n": [len(ids)],
                "ids": [ids.tobytes()],
                "mat": [X.tobytes()],
            }
        )

    from ._cache import register as _register_cache
    from ._cache import release_cached

    release_cached(spark)
    # persist: the self-join reads blocks as both sides — without the
    # cache the pack stage (scan + normalize + serialize) runs twice
    blocks = _register_cache(
        df.select(F.pmod(F.hash(F.col(id_col)), F.lit(B)).alias("block"), id_col, vec_col)
        .groupBy("block")
        .applyInPandas(pack, schema=packed_schema)
        .persist()
    )
    combos = spark.createDataFrame(
        [(a, b) for a in range(B) for b in range(a, B)], "block_a long, block_b long"
    )
    a = blocks.select(
        F.col("block").alias("block_a"),
        F.col("n").alias("n_a"),
        F.col("ids").alias("ids_a"),
        F.col("mat").alias("mat_a"),
    )
    b = blocks.select(
        F.col("block").alias("block_b"),
        F.col("n").alias("n_b"),
        F.col("ids").alias("ids_b"),
        F.col("mat").alias("mat_b"),
    )
    joined = combos.join(a, "block_a").join(b, "block_b")
    out_schema = StructType(
        [
            StructField("id_a", LongType(), False),
            StructField("id_b", LongType(), False),
            StructField("cosine_sim", DoubleType(), False),
        ]
    )

    def gemm(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            for row in pdf.itertuples(index=False):
                ia = np.frombuffer(row.ids_a, dtype=np.int64)
                ib = np.frombuffer(row.ids_b, dtype=np.int64)
                A = np.frombuffer(row.mat_a, dtype=np.float64).reshape(row.n_a, -1)
                Bm = np.frombuffer(row.mat_b, dtype=np.float64).reshape(row.n_b, -1)
                # floor-based half-up rounding — the repo's portable rule
                # (np.round is half-to-even; DuckDB ROUND is half-away;
                # floor(x*1e4+0.5)/1e4 is bit-identical IEEE on both sides)
                S = np.floor(A @ Bm.T * 10000.0 + 0.5) / 10000.0
                ii, jj = np.nonzero(S >= threshold)
                if len(ii) == 0:
                    continue
                pa_, pb_ = ia[ii], ib[jj]
                lo = np.minimum(pa_, pb_)
                hi = np.maximum(pa_, pb_)
                keep = lo < hi  # drops self-pairs; same-block dups handled below
                out = pd.DataFrame(
                    {"id_a": lo[keep], "id_b": hi[keep], "cosine_sim": S[ii, jj][keep]}
                )
                if row.block_a == row.block_b:
                    out = out.drop_duplicates(["id_a", "id_b"])
                yield out

    return joined.mapInPandas(gemm, schema=out_schema)


def sign_lsh_multitable(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    dim: int,
    num_tables: int = 32,
    planes_per_table: int = 4,
    seed: int = 42,
) -> DataFrame:
    """``num_tables`` independent sign-LSH tables in one pass: output one
    (id, table, bucket) row per table per vector.

    A pair with cosine θ collides in one table with prob
    p1^planes_per_table where p1 = 1 − θ/π, and is missed by ALL tables
    with prob (1 − p1^r)^T — the multi-table recall knob for low
    thresholds, where a single table's recall collapses. All tables share
    one (dim × T·r) matmul per Arrow batch."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, num_tables * planes_per_table))
    weights = (np.int64(1) << np.arange(planes_per_table, dtype=np.int64))
    schema = StructType(
        [
            StructField("id", LongType(), False),
            StructField("table", LongType(), False),
            StructField("bucket", LongType(), False),
        ]
    )

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tables = np.arange(num_tables, dtype=np.int64)
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            X = np.array(list(pdf[vec_col]), dtype=np.float64)
            signs = (X @ planes) > 0  # (n, T*r)
            codes = signs.reshape(len(ids), num_tables, planes_per_table).astype(np.int64)
            buckets = (codes * weights[None, None, :]).sum(axis=2)  # (n, T)
            yield pd.DataFrame(
                {
                    "id": np.repeat(ids, num_tables),
                    "table": np.tile(tables, len(ids)),
                    "bucket": buckets.reshape(-1),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(bucketize, schema=schema)


def ivf_assign(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    centroids: np.ndarray,
) -> DataFrame:
    """Assign each corpus vector to its nearest coarse centroid (one matmul
    per Arrow batch). Output: (centroid, id, vec) — the IVF posting list."""
    C = normalize_rows(np.asarray(centroids, dtype=np.float64))
    vec_field = corpus.schema[vec_col]
    schema = StructType(
        [
            StructField("centroid", LongType(), False),
            StructField("id", LongType(), False),
            StructField("vec", vec_field.dataType, False),
        ]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            X = normalize_rows(np.array(list(pdf[vec_col]), dtype=np.float64))
            a = np.argmax(X @ C.T, axis=1).astype(np.int64)
            yield pd.DataFrame(
                {"centroid": a, "id": pdf[id_col].to_numpy(dtype=np.int64), "vec": pdf[vec_col]}
            )

    return corpus.select(id_col, vec_col).mapInPandas(assign, schema=schema)


def ivf_build_index(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    centroids: np.ndarray,
    path: str,
) -> None:
    """Materialize the IVF index ONCE as a parquet table partitioned by
    centroid id. Probes then read only their probe partitions (partition
    pruning at the scan — the scale fix VERDICT r01 #4 named: the
    in-flight ``ivf_topk`` rescans the whole corpus per query batch)."""
    ivf_assign(corpus, id_col, vec_col, centroids=centroids).write.mode("overwrite").partitionBy(
        "centroid"
    ).parquet(path)


def ivf_ensure_index(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    centroids: np.ndarray,
    cache_root: str,
) -> str:
    """Build the materialized IVF index AT MOST ONCE per (data, quantizer)
    and return its path — the index lifecycle fix of VERDICT r02 #4 (the
    r2 query re-built the index inside the query wall into a leaked
    per-call mkdtemp).

    The location is deterministic: ``cache_root/ivf-<fingerprint>`` where
    the fingerprint hashes the corpus's input FILE METADATA (sorted paths
    + size + mtime — metadata-only, no scan) and the centroid bytes, so a
    changed corpus or quantizer gets a fresh index and an unchanged one
    is reused across calls and processes. Publication is atomic: build
    into a tmp sibling, ``os.rename`` into place; a concurrent builder
    that loses the rename race just discards its tmp and reuses the
    winner (no reader ever sees a half-written index)."""
    import hashlib
    import os
    import shutil
    import uuid

    files = sorted(corpus.inputFiles())
    if not files:
        # non-file-backed corpus (in-memory frame, view): the metadata
        # fingerprint would be DATA-INDEPENDENT, so two different corpora
        # with the same quantizer would silently share an index.
        # Fingerprint the DATA instead: an order-independent digest (sum
        # of per-row xxhash64 over id+vec, in decimal so it can't
        # overflow, plus the row count) — one extra agg over the
        # in-memory frame, trivial next to the index build itself, and
        # repeated calls on the same corpus now REUSE the index instead
        # of leaking a fresh ivf-adhoc-<uuid> dir per call (ADVICE r04).
        from pyspark.sql import functions as F

        dig = corpus.agg(
            F.sum(F.xxhash64(id_col, vec_col).cast("decimal(38,0)")).alias("s"),
            F.count("*").alias("n"),
        ).collect()[0]
        h = hashlib.sha1(f"adhoc|{dig['s']}|{dig['n']}".encode())
    else:
        meta = []
        for f in files:
            local = f[len("file:"):].lstrip("/") if f.startswith("file:") else f
            local = "/" + local if not local.startswith("/") else local
            try:
                st = os.stat(local)
                meta.append((f, st.st_size, st.st_mtime_ns))
            except OSError:
                meta.append((f, -1, -1))
        h = hashlib.sha1(repr(meta).encode())
    C = np.ascontiguousarray(np.asarray(centroids, dtype=np.float64))
    h.update(C.tobytes())
    h.update(f"{id_col}|{vec_col}".encode())
    final = os.path.join(cache_root, f"ivf-{h.hexdigest()[:16]}")
    if os.path.isdir(final):
        return final
    os.makedirs(cache_root, exist_ok=True)
    tmp = f"{final}.tmp-{uuid.uuid4().hex}"
    ivf_build_index(corpus, id_col, vec_col, centroids=centroids, path=tmp)
    try:
        os.rename(tmp, final)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # lost the race: reuse winner
    return final


def ivf_topk_indexed(
    spark,
    index_path: str,
    query_vectors: dict[int, list[float]],
    *,
    centroids: np.ndarray,
    n_probe: int = 4,
    k: int = 5,
) -> DataFrame:
    """IVF probe against a materialized index: reads ONLY the union of all
    queries' probe partitions (PartitionFilters on ``centroid``), scores
    each batch with one matmul, per-query probe mask, tiny top-k shuffle.

    Same output contract as ``ivf_topk`` / ``cosine_topk_blocked``:
    (query_id, neighbor_id, cosine_sim, rank)."""
    qids = np.array(sorted(query_vectors), dtype=np.int64)
    Q = normalize_rows(np.array([query_vectors[int(i)] for i in qids], dtype=np.float64))
    C = normalize_rows(np.asarray(centroids, dtype=np.float64))
    qc = Q @ C.T
    probes = np.argsort(-qc, axis=1)[:, :n_probe]  # (q, n_probe)
    probe_mask = np.zeros((C.shape[0], len(qids)), dtype=bool)
    for qi in range(len(qids)):
        probe_mask[probes[qi], qi] = True
    probe_union = sorted({int(c) for row in probes for c in row})
    schema = StructType(
        [
            StructField("query_id", LongType(), False),
            StructField("neighbor_id", LongType(), False),
            StructField("cosine_sim", DoubleType(), False),
        ]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["id"].to_numpy(dtype=np.int64)
            X = normalize_rows(np.array(list(pdf["vec"]), dtype=np.float64))
            assign = pdf["centroid"].to_numpy(dtype=np.int64)
            sims = X @ Q.T
            sims[~probe_mask[assign]] = -2.0
            kk = min(k, len(ids))
            part = np.argpartition(-sims, kk - 1, axis=0)[:kk]
            rows_q = np.repeat(qids, kk)
            rows_n = ids[part.T.reshape(-1)]
            rows_s = np.take_along_axis(sims, part, axis=0).T.reshape(-1)
            keep = rows_s > -2.0
            yield pd.DataFrame(
                {
                    "query_id": rows_q[keep],
                    "neighbor_id": rows_n[keep],
                    "cosine_sim": np.round(rows_s[keep], 6),
                }
            )

    idx = spark.read.parquet(index_path).filter(F.col("centroid").isin(probe_union))
    local = idx.select("centroid", "id", "vec").mapInPandas(score, schema=schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return local.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def sign_lsh_buckets(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    num_planes: int = 16,
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane (sign) LSH: bucket id = sign-bit pattern of the
    vector against ``num_planes`` fixed random hyperplanes. Vectors with
    high cosine land in the same bucket with prob (1 - theta/pi)^planes.

    Output: (id, bucket). Computed per Arrow batch with one matmul.

    Pass ``dim`` explicitly — the fallback runs a driver-side ``.first()``
    job before the real plan (fine interactively, avoid in pipelines)."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, num_planes))
    schema = StructType([StructField("id", LongType(), False), StructField("bucket", LongType(), False)])

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = (np.uint64(1) << np.arange(num_planes, dtype=np.uint64))
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            X = np.array(list(pdf[vec_col]), dtype=np.float64)
            signs = (X @ planes) > 0
            buckets = (signs.astype(np.uint64) * weights[None, :]).sum(axis=1).astype(np.int64)
            yield pd.DataFrame({"id": ids, "bucket": buckets})

    return df.select(id_col, vec_col).mapInPandas(bucketize, schema=schema)
