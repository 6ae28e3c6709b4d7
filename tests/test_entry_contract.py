"""Driver-contract smoke: entry() runs with >0 rows and a stable schema;
every oracle key has a query; full oracle parity is tools/check_oracles.py."""

import __spark_entry__ as entry_mod


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["lang", "approx_docs", "exact_docs", "within_bound"]
    assert all(r["within_bound"] for r in rows)


def test_contract_keys_consistent():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    # every query is either oracle-checked or explicitly rows-only
    rows_only = set(qs) - set(oracles)
    assert rows_only == {
        "simhash_docs",
        "multimodal_features",
    }
    # the driver records at most 50 rows — every exported query must land
    # in CORRECTNESS_r{N} (VERDICT r02 #1)
    assert len(qs) <= 50


def test_queries_return_dataframes(spark):
    qs = entry_mod.queries()
    sf = "/root/testdata/sf0.001"
    # spot-check a representative subset at the smallest sf
    for name in ("hll_suppliers_per_nation", "dedup_exact_docs", "pricing_summary"):
        df = qs[name](spark, sf)
        assert df.count() > 0, name
