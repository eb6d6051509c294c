"""Driver-contract smoke: entry() runs at sf0.001 and returns rows."""

from __future__ import annotations


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"cnt", "year", "author1", "author2"}


def test_queries_and_oracles_align(spark):
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert qs, "no queries registered"
    assert set(os_) <= set(qs)
