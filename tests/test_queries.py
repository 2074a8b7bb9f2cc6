"""Smoke: every registered t2 query runs at sf0.001 and returns a stable
schema; entry() matches the driver contract."""

from __future__ import annotations

import __spark_entry__ as entrymod

from tests.conftest import SF_SMALL


def test_registry_complete():
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    assert len(qs) >= 30
    # every oracle key must have a query
    assert set(osql) <= set(qs)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"custkey", "submissions", "comments", "total_posts"}


def test_all_queries_run(spark):
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_SMALL)
        assert df.columns, name
        df.limit(5).collect()
