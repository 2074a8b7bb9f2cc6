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


def test_registry_invariants():
    """Driver-contract guards: every oracle has a query, every oracled
    query sits inside the driver's 50-row CORRECTNESS window (oracled
    entries are re-ordered first at import), and the rows-only tail is
    exactly the engine-private set."""
    import timesearch_spark.queries as tsq

    qs, oracle = tsq.QUERIES, tsq.ORACLE
    assert set(oracle) <= set(qs)
    idx = {k: i for i, k in enumerate(qs)}
    assert all(idx[k] <= 49 for k in oracle), [k for k in oracle if idx[k] > 49]
    assert len(oracle) == 50  # the window is exactly full
    # every registered callable is a (spark, sf_dir) function
    assert all(callable(v) for v in qs.values())
