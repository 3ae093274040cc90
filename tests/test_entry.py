"""Driver-contract smoke: entry() runs, queries()/oracle_sql() keys align."""

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_queries_and_oracles_align(spark):
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert qs, "no queries registered"
    assert set(os_) <= set(qs), "oracle without a query"


def test_each_query_builds_plan(spark, sf_dir):
    # plans must at least analyze (no execution) against sf0.001
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        _ = df.schema  # forces analysis
