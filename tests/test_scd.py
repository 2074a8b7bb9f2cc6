"""SCD Type-2 (operators/scd.py): history construction pinned against a
DuckDB SQL restatement; point-in-time lookup pinned against a DuckDB
interval-containment join."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from timesearch_spark.operators.scd import scd2_build, scd2_lookup
from timesearch_spark.tables import load


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW orders AS SELECT * FROM '{SF_ORACLE}/orders.parquet'"
    )
    yield con
    con.close()


def _changes(spark):
    o = load(spark, SF_ORACLE, "orders")
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.unix_timestamp("o_orderdate").alias("ts"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderkey").alias("seq"),
    )


_DUCK_SCD2 = """
WITH ch AS (
  SELECT o_custkey AS custkey,
         CAST(epoch(o_orderdate) AS BIGINT) AS ts,
         o_orderpriority AS priority, o_orderstatus AS status,
         o_orderkey AS seq
  FROM orders
),
flagged AS (
  SELECT *,
         LAG(priority) OVER w AS pp, LAG(status) OVER w AS ps,
         ROW_NUMBER() OVER w AS rn
  FROM ch WINDOW w AS (PARTITION BY custkey ORDER BY ts, seq)
),
kept AS (
  SELECT custkey, ts, priority, status, seq FROM flagged
  WHERE rn = 1 OR priority IS DISTINCT FROM pp OR status IS DISTINCT FROM ps
)
SELECT custkey, priority, status,
       ts AS valid_from,
       LEAD(ts) OVER w AS valid_to,
       CAST(ROW_NUMBER() OVER w AS INT) AS version,
       LEAD(ts) OVER w IS NULL AS is_current
FROM kept WINDOW w AS (PARTITION BY custkey ORDER BY ts, seq)
"""


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.sort_values(["custkey", "version"]).reset_index(drop=True)
    out["valid_to"] = out["valid_to"].fillna(-1).astype("int64")
    return out


def test_scd2_build_matches_duckdb(spark, duck):
    got = _canon(
        scd2_build(
            _changes(spark),
            key_cols=["custkey"],
            ts_col="ts",
            attr_cols=["priority", "status"],
            order_cols=["seq"],
        )
        .drop("ts", "seq")
        .toPandas()
    )
    exp = _canon(duck.sql(_DUCK_SCD2).df())
    pd.testing.assert_frame_equal(got, exp)


def test_scd2_intervals_tile_per_key(spark):
    hist = scd2_build(
        _changes(spark), ["custkey"], "ts", ["priority", "status"],
        order_cols=["seq"],
    ).toPandas()
    for _, grp in hist.groupby("custkey"):
        g = grp.sort_values("version")
        # each version's valid_to is the next version's valid_from
        assert (
            g.valid_to.iloc[:-1].astype("int64")
            == g.valid_from.iloc[1:].astype("int64").values
        ).all()
        assert pd.isna(g.valid_to.iloc[-1]) and bool(g.is_current.iloc[-1])
        assert (~g.is_current.iloc[:-1]).all()


def test_scd2_drop_unchanged_collapses_noise(spark):
    ch = _changes(spark).limit(200)
    noisy = ch.unionByName(ch)  # every change re-emitted
    a = scd2_build(noisy, ["custkey"], "ts", ["priority", "status"],
                   order_cols=["seq"])
    b = scd2_build(ch, ["custkey"], "ts", ["priority", "status"],
                   order_cols=["seq"])
    assert a.count() == b.count()


def test_scd2_apply_equals_full_rebuild(spark):
    from timesearch_spark.operators.scd import scd2_apply

    full = _changes(spark)
    # split the change stream in TIME (the CDC append case — exactness
    # holds; mid-history inserts hit the documented drop_unchanged
    # exception): early rows are the stored history, later ones arrive
    # as an incremental batch
    cut = full.approxQuantile("ts", [0.5], 0.0)[0]
    early = full.filter(F.col("ts") < cut)
    late = full.filter(F.col("ts") >= cut)
    kw = dict(key_cols=["custkey"], ts_col="ts",
              attr_cols=["priority", "status"], order_cols=["seq"])
    hist = scd2_build(early, **kw, keep_order_cols=True)
    applied = scd2_apply(hist, late, **kw)
    expected = scd2_build(full, **kw, keep_order_cols=True)
    assert applied.exceptAll(expected).count() == 0
    assert expected.exceptAll(applied).count() == 0

    # untouched keys pass through, not recompute: an empty batch over a
    # disjoint key leaves history identical
    noop = scd2_apply(
        hist,
        late.filter(F.col("custkey") == -1),  # no such key
        **kw,
    )
    assert noop.exceptAll(hist).count() == 0
    assert hist.exceptAll(noop).count() == 0

    # missing order columns in history → explicit error
    import pytest as _pytest

    with _pytest.raises(ValueError, match="keep_order_cols"):
        scd2_apply(scd2_build(early, **kw), late, **kw)


def test_scd2_lookup_same_instant_versions_deterministic(spark):
    # two changes at the SAME timestamp produce a zero-length interval
    # [T, T) and an open [T, null); a fact at T+1 must deterministically
    # match the open (greatest-version) one, never null out
    changes = spark.createDataFrame(
        [(1, 100, "LOW", 10), (1, 100, "HIGH", 11), (1, 50, "MED", 9)],
        "custkey long, ts long, priority string, seq long",
    )
    dim = scd2_build(changes, ["custkey"], "ts", ["priority"],
                     order_cols=["seq"])
    facts = spark.createDataFrame([(1, 101)], "custkey long, fts long")
    for _ in range(3):  # was shuffle-order-dependent before the fix
        got = scd2_lookup(facts, dim, on=["custkey"], fact_ts="fts",
                          attr_cols=["priority"]).first()
        assert got["priority"] == "HIGH" and got["matched_ts"] == 100


def test_scd2_lookup_matches_duckdb_interval_join(spark, duck):
    dim = scd2_build(
        _changes(spark), ["custkey"], "ts", ["priority", "status"],
        order_cols=["seq"],
    )
    # probe half a day after each order: lands strictly inside versions
    facts = _changes(spark).select(
        "custkey", "seq", (F.col("ts") + 43200).alias("fts")
    )
    got = (
        scd2_lookup(facts, dim, on=["custkey"], fact_ts="fts",
                    attr_cols=["priority", "status"])
        .select("custkey", "seq", "fts", "priority", "status")
        .toPandas()
        .sort_values(["custkey", "seq"])
        .reset_index(drop=True)
    )
    exp = (
        duck.sql(
            f"""
        WITH hist AS ({_DUCK_SCD2}),
        facts AS (
          SELECT o_custkey AS custkey, o_orderkey AS seq,
                 CAST(epoch(o_orderdate) AS BIGINT) + 43200 AS fts
          FROM orders
        )
        SELECT f.custkey, f.seq, f.fts, h.priority, h.status
        FROM facts f LEFT JOIN hist h
          ON f.custkey = h.custkey
         AND h.valid_from <= f.fts
         AND (h.valid_to IS NULL OR f.fts < h.valid_to)
        ORDER BY f.custkey, f.seq
        """
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["custkey", "seq", "fts", "priority", "status"]], exp
    )


def test_scd2_keep_order_cols_dedupes_attr_overlap(spark):
    # an order column that is ALSO an attr column must not be selected
    # twice when keep_order_cols=True (duplicate-named output breaks
    # scd2_apply joins far from the cause)
    ch = spark.createDataFrame(
        [(1, 10, 5), (1, 20, 6)], "k long, ts long, seq long"
    )
    hist = scd2_build(
        ch, key_cols=["k"], ts_col="ts", attr_cols=["seq"],
        order_cols=["seq"], keep_order_cols=True,
    )
    assert hist.columns.count("seq") == 1
    assert hist.count() == 2
