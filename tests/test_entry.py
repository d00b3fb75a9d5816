"""t1 smoke mirror: entry() runs and yields rows with a stable schema."""

from __future__ import annotations


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["region_name", "revenue", "n_items"]


def test_registry_contract(spark):
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs), "every oracle key must have a query"
    assert len(qs) > 0
