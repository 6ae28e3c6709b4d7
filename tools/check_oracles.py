#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every queries()[name]
on Spark and oracle_sql()[name] on DuckDB over the same parquet tables at
sf=0.01, compare row count + column names + order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")


def _norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "float:nan"
        return f"float:{v!r}"
    if isinstance(v, (bytes, bytearray)):
        return f"bytes:{bytes(v).hex()}"
    if isinstance(v, datetime.datetime):
        return f"ts:{v.isoformat()}"
    if isinstance(v, datetime.date):
        return f"date:{v.isoformat()}"
    if isinstance(v, list):
        return "list:[" + ",".join(_norm_value(x) for x in v) + "]"
    return f"{type(v).__name__}:{v}"


def _rows_to_canonical(cols: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = ["|".join(_norm_value(r[i]) for i in order) for r in rows]
    return sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"  {name:34s} rows-only: {len(srows)} rows ({spark_s:.1f}s spark)")
            if len(srows) == 0:
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        t1 = time.time()
        res = con.execute(oracles[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        duck_s = time.time() - t1
        status = []
        if sorted(scols) != sorted(ocols):
            status.append(f"SCHEMA spark={sorted(scols)} duck={sorted(ocols)}")
        if len(srows) != len(orows):
            status.append(f"ROWCOUNT spark={len(srows)} duck={len(orows)}")
        if not status:
            a = _rows_to_canonical(scols, srows)
            b = _rows_to_canonical(ocols, orows)
            if a != b:
                diff_a = [x for x in a if x not in set(b)][:3]
                diff_b = [x for x in b if x not in set(a)][:3]
                status.append(f"VALUES spark-only={diff_a} duck-only={diff_b}")
        if status:
            failures.append((name, "; ".join(status)))
            print(f"✗ {name:34s} {'; '.join(status)[:220]}")
        else:
            print(f"✓ {name:34s} {len(srows)} rows ({spark_s:.1f}s spark, {duck_s:.1f}s duck)")
    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for n, s in failures:
            print(f"  {n}: {s[:300]}")
        return 1
    print("all queries match their oracles")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
