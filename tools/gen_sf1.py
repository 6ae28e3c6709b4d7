#!/usr/bin/env python
"""Generate an sf1-tier test-data directory under .bench_cache/sf1/ with
the driver tables the headline queries read (documents, events, lineitem,
embeddings), schema-compatible with /root/testdata/sf0.1 (TESTDATA.md) and
fully deterministic (every value is a pure xxhash64 function of the row
id — no Date.now, no RNG state), so BENCH_sf1 runs are reproducible.

Scale vs sf0.1 (chosen for evidence, not strict 10x — the corpus
operators are the unmeasured ones, VERDICT r04 #4):

  documents   5,000,000  (1000x — the four doc-heavy dedup queries)
  events     10,000,000  (100x  — hll windows / sessions / Misra-Gries)
  lineitem    6,000,000  (10x   — pricing_summary, hll_global_parts)
  embeddings    200,000  (100x  — brute-force top-k, IVF recall)

Documents carry PLANTED duplicate structure so the dedup queries do real
work: ids in a 50-doc block with block-hash < 2% copy the block leader's
text verbatim (exact-dup clusters), the next 3% copy the leader and
append two id-specific words (near-dups for MinHash at high Jaccard).
Word frequencies are Zipf-ish over the same ~40-word vocabulary style as
the driver generator (~45 words/doc, ~300 chars, 5 langs, 20 sources).

Generation follows the repo's big-table rule (CLAUDE.md): enough small
partitions from spark.range, written 1:1 — no repartition, no coalesce.

Usage: python tools/gen_sf1.py [out_dir]   (default .bench_cache/sf1)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VOCAB = [
    "spark", "line", "column", "order", "small", "sort", "fast", "value",
    "scan", "hash", "slow", "group", "batch", "agg", "filter", "query",
    "a", "big", "key", "window", "part", "vector", "table", "stream",
    "join", "data", "the", "customer", "index", "merge", "shuffle",
    "broadcast", "cache", "plan", "codegen", "arrow", "parquet", "stage",
    "task", "executor",
] + [f"w{i}" for i in range(1960)]
# vocab must be >> 40: with the driver's 40-word vocabulary at 5 M docs
# the Zipf head makes single hot shingles shared by ~10^4 docs, which
# correlates their minhashes and melts LSH buckets into a JVM-OOM blob —
# a degenerate corpus, not web text (web boilerplate is why the operator
# HAS a max_bucket_size guard, but the data here should be realistic)
LANGS = ["en", "de", "fr", "es", "zh"]


def h(seed: str, *cols):
    from pyspark.sql import functions as F

    return F.xxhash64(F.lit(seed), *cols)


def gen_documents(spark, out: str, n_rows: int) -> None:
    from pyspark.sql import functions as F

    base = spark.range(0, n_rows, numPartitions=max(64, n_rows // 250_000))
    # block structure: ids [50b, 50b+49] form a block; the leader is 50b.
    blk = (F.col("id") / 50).cast("long") * 50
    r = F.pmod(h("dup", F.col("id")), F.lit(100))
    kind = F.when(F.col("id") == blk, F.lit(0)).otherwise(
        F.when(r < 2, F.lit(1)).otherwise(F.when(r < 5, F.lit(2)).otherwise(F.lit(0)))
    )  # 0 = unique, 1 = exact dup of leader, 2 = near dup of leader
    content_id = F.when(kind == 0, F.col("id")).otherwise(blk)
    n_words = (F.pmod(h("len", content_id), F.lit(60)) + 15).cast("int")
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    df = (
        base.withColumn("_cid", content_id)
        .withColumn("_n", n_words)
        .withColumn("_kind", kind)
        .withColumn("_idxs", F.sequence(F.lit(1), F.col("_n")))
    )
    # the lambda body is cheap (hash + element_at) so inlining is fine
    # (CLAUDE.md's lambda rule concerns heavy re-evaluated subtrees like
    # split()); Zipf-ish word choice: squared uniform fraction
    text = F.array_join(
        F.transform(
            F.col("_idxs"),
            lambda i: F.element_at(
                vocab,
                (
                    F.pow(
                        F.pmod(F.xxhash64(F.lit("w"), F.col("_cid"), i), F.lit(10_000))
                        / F.lit(10_000.0),
                        F.lit(2.0),
                    )
                    * len(VOCAB)
                ).cast("int")
                + 1,
            ),
        ),
        " ",
    )
    near_suffix = F.concat(
        F.lit(" "),
        F.element_at(vocab, F.pmod(h("nd1", F.col("id")), F.lit(len(VOCAB))).cast("int") + 1),
        F.lit(" "),
        F.element_at(vocab, F.pmod(h("nd2", F.col("id")), F.lit(len(VOCAB))).cast("int") + 1),
    )
    text = F.when(F.col("_kind") == 2, F.concat(text, near_suffix)).otherwise(text)
    lang_idx = F.pmod(h("lang", F.col("_cid")), F.lit(8))
    lang = (
        F.when(lang_idx < 4, F.lit("en"))
        .when(lang_idx == 4, F.lit("de"))
        .when(lang_idx == 5, F.lit("fr"))
        .when(lang_idx == 6, F.lit("es"))
        .otherwise(F.lit("zh"))
    )
    out_df = df.select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        lang.alias("lang"),
        F.concat(F.lit("src"), F.pmod(h("src", F.col("id")), F.lit(20)).cast("string")).alias(
            "source"
        ),
        F.length(text).cast("long").alias("n_chars"),
    )
    out_df.write.mode("overwrite").parquet(out)


def gen_events(spark, out: str, n_rows: int) -> None:
    from pyspark.sql import functions as F

    base = spark.range(0, n_rows, numPartitions=max(32, n_rows // 500_000))
    t0 = F.lit("2024-01-01 00:00:00").cast("timestamp")
    offset_us = F.pmod(h("ts", F.col("id")), F.lit(30 * 86_400)) * 1_000_000 + F.pmod(
        h("us", F.col("id")), F.lit(1_000_000)
    )
    et = F.pmod(h("et", F.col("id")), F.lit(100))
    event_type = (
        F.when(et < 45, F.lit("click"))
        .when(et < 70, F.lit("view"))
        .when(et < 85, F.lit("scroll"))
        .when(et < 95, F.lit("purchase"))
        .otherwise(F.lit("signup"))
    )
    df = base.select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.unix_micros(t0) + offset_us
        ).alias("ts"),
        F.pmod(h("uid", F.col("id")), F.lit(150_000)).alias("user_id"),
        event_type.alias("event_type"),
        (F.pmod(h("val", F.col("id")), F.lit(100_000)) / 100.0).alias("value"),
        F.concat(
            F.lit('{"session":'), F.pmod(h("sess", F.col("id")), F.lit(10_000)).cast("string"), F.lit("}")
        ).alias("props"),
    )
    df.write.mode("overwrite").parquet(out)


def gen_lineitem(spark, out: str, n_rows: int) -> None:
    from pyspark.sql import functions as F

    base = spark.range(0, n_rows, numPartitions=max(32, n_rows // 500_000))
    t0 = F.lit("1995-01-01 00:00:00").cast("timestamp")
    df = base.select(
        (F.col("id") / 4).cast("long").alias("l_orderkey"),
        F.pmod(h("pk", F.col("id")), F.lit(200_000)).alias("l_partkey"),
        F.pmod(h("sk", F.col("id")), F.lit(10_000)).alias("l_suppkey"),
        (F.pmod(F.col("id"), F.lit(4)) + 1).cast("int").alias("l_linenumber"),
        (F.pmod(h("q", F.col("id")), F.lit(50)) + 1).cast("double").alias("l_quantity"),
        (900.0 + F.pmod(h("ep", F.col("id")), F.lit(10_410_000)) / 100.0).alias("l_extendedprice"),
        (F.pmod(h("d", F.col("id")), F.lit(11)) / 100.0).alias("l_discount"),
        (F.pmod(h("t", F.col("id")), F.lit(9)) / 100.0).alias("l_tax"),
        F.element_at(
            F.array(F.lit("A"), F.lit("N"), F.lit("R")),
            F.pmod(h("rf", F.col("id")), F.lit(3)).cast("int") + 1,
        ).alias("l_returnflag"),
        F.element_at(
            F.array(F.lit("O"), F.lit("F")),
            F.pmod(h("ls", F.col("id")), F.lit(2)).cast("int") + 1,
        ).alias("l_linestatus"),
        F.timestamp_micros(
            F.unix_micros(t0)
            + F.pmod(h("sd", F.col("id")), F.lit(2500)) * F.lit(86_400_000_000)
        ).alias("l_shipdate"),
    )
    df.write.mode("overwrite").parquet(out)


def gen_embeddings(spark, out: str, n_rows: int, dim: int = 64) -> None:
    from pyspark.sql import functions as F

    base = spark.range(0, n_rows, numPartitions=max(16, n_rows // 100_000))
    label = F.pmod(h("lb", F.col("id")), F.lit(10)).cast("int")
    df = base.withColumn("label", label).withColumn(
        "embedding",
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (
                (F.pmod(F.xxhash64(F.lit("e"), F.col("id"), j), F.lit(2001)) - 1000)
                / 1000.0
                # cluster structure: components j ≡ label (mod 10) get +1.5
                + F.when(F.pmod(j, F.lit(10)) == F.col("label"), 1.5).otherwise(0.0)
            ).cast("float"),
        ),
    )
    df.select(F.col("id").alias("vec_id"), "embedding", "label").write.mode(
        "overwrite"
    ).parquet(out)


def main() -> None:
    from pyspark.sql import SparkSession

    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".bench_cache", "sf1")
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = [
        ("documents", gen_documents, 5_000_000),
        ("events", gen_events, 10_000_000),
        ("lineitem", gen_lineitem, 6_000_000),
        ("embeddings", gen_embeddings, 200_000),
    ]
    for name, fn, n in specs:
        path = os.path.join(out_dir, f"{name}.parquet")
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            print(f"{name}: cached")
            continue
        fn(spark, path, n)
        print(f"{name}: wrote {n:,} rows -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
